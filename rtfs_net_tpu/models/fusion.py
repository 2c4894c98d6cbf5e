"""Cross-modal fusion strategies (reference: ``src/models/TDAVNet/fusion.py``).

Six audio<->video fusion strategies, all handling 1D-vs-2D rank mismatch by
unsqueezing the lower-rank side (``wrangle_dims``) and nearest-interpolating
shapes. ATTNFusion (the CAF block) is what RTFS-Net configs use.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from .layers import (
    ConvNormAct,
    InjectionMultiSum,
    ConvLSTMFusionCell,
    ConvGRUFusionCell,
    ATTNFusionCell,
)
from ..ops.conv import interpolate_nearest


def _spatial(x):
    return x.shape[-(len(x.shape) // 2):]


def wrangle_dims(audio, video):
    """Unsqueeze the lower-rank modality so both have equal rank
    (reference ``fusion.py:21-37``)."""
    t1, t2 = _spatial(audio), _spatial(video)
    x_flag = len(t1) > len(t2)
    y_flag = len(t2) > len(t1)
    if x_flag:
        video = video[..., None]
    if y_flag:
        audio = audio[..., None]
    return audio, video, x_flag, y_flag


def unwrangle_dims(audio, video, x_flag, y_flag):
    if x_flag:
        video = video[..., 0]
    if y_flag:
        audio = audio[..., 0]
    return audio, video


class ConcatFusion(nn.Module):
    ain_chan: int
    vin_chan: int
    kernel_size: int
    video_fusion: bool = True
    is2d: bool = False

    @nn.compact
    def __call__(self, audio, video, train: bool = False):
        audio, video, xf, yf = wrangle_dims(audio, video)
        video_interp = interpolate_nearest(video, _spatial(audio))
        audio_fused = ConvNormAct(
            self.ain_chan + self.vin_chan, self.ain_chan, self.kernel_size,
            norm_type="gLN", is2d=self.is2d, name="audio_conv",
        )(jnp.concatenate([audio, video_interp], axis=1), train)
        if self.video_fusion:
            audio_interp = interpolate_nearest(audio, _spatial(video))
            video_fused = ConvNormAct(
                self.ain_chan + self.vin_chan, self.vin_chan, self.kernel_size,
                norm_type="gLN", is2d=self.is2d, name="video_conv",
            )(jnp.concatenate([audio_interp, video], axis=1), train)
        else:
            video_fused = video
        return unwrangle_dims(audio_fused, video_fused, xf, yf)


class SumFusion(nn.Module):
    ain_chan: int
    vin_chan: int
    kernel_size: int
    video_fusion: bool = True
    is2d: bool = False

    @nn.compact
    def __call__(self, audio, video, train: bool = False):
        audio, video, xf, yf = wrangle_dims(audio, video)
        if self.video_fusion:
            audio_interp = interpolate_nearest(audio, _spatial(video))
            video_fused = ConvNormAct(
                self.ain_chan, self.vin_chan, self.kernel_size,
                norm_type="gLN", is2d=self.is2d, name="audio_conv",
            )(audio_interp, train) + video
        else:
            video_fused = video
        video_interp = interpolate_nearest(video, _spatial(audio))
        audio_fused = ConvNormAct(
            self.vin_chan, self.ain_chan, self.kernel_size,
            norm_type="gLN", is2d=self.is2d, name="video_conv",
        )(video_interp, train) + audio
        return unwrangle_dims(audio_fused, video_fused, xf, yf)


class InjectionFusion(nn.Module):
    ain_chan: int
    vin_chan: int
    kernel_size: int
    video_fusion: bool = True
    is2d: bool = False

    @nn.compact
    def __call__(self, audio, video, train: bool = False):
        audio, video, xf, yf = wrangle_dims(audio, video)
        if self.video_fusion:
            a_conv = ConvNormAct(self.ain_chan, self.vin_chan, 1,
                                 is2d=self.is2d, name="audio_conv")(audio, train)
            video_fused = InjectionMultiSum(self.vin_chan, self.kernel_size,
                                            "gLN", is2d=self.is2d,
                                            name="video_inj")(video, a_conv, train)
        else:
            video_fused = video
        v_conv = ConvNormAct(self.vin_chan, self.ain_chan, 1,
                             is2d=self.is2d, name="video_conv")(video, train)
        audio_fused = InjectionMultiSum(self.ain_chan, self.kernel_size,
                                        "gLN", is2d=self.is2d,
                                        name="audio_inj")(audio, v_conv, train)
        return unwrangle_dims(audio_fused, video_fused, xf, yf)


class LSTMFusion(nn.Module):
    ain_chan: int
    vin_chan: int
    kernel_size: int
    video_fusion: bool = True
    is2d: bool = True
    bidirectional: bool = True

    @nn.compact
    def __call__(self, audio, video, train: bool = False):
        audio, video, xf, yf = wrangle_dims(audio, video)
        if self.video_fusion:
            video_fused = ConvLSTMFusionCell(
                self.vin_chan, self.ain_chan, self.kernel_size,
                self.bidirectional, self.is2d, name="video_lstm",
            )(video, audio, train)
        else:
            video_fused = video
        audio_fused = ConvLSTMFusionCell(
            self.ain_chan, self.vin_chan, self.kernel_size,
            self.bidirectional, self.is2d, name="audio_lstm",
        )(audio, video, train)
        return unwrangle_dims(audio_fused, video_fused, xf, yf)


class GRUFusion(nn.Module):
    ain_chan: int
    vin_chan: int
    kernel_size: int
    video_fusion: bool = True
    is2d: bool = True
    bidirectional: bool = True

    @nn.compact
    def __call__(self, audio, video, train: bool = False):
        audio, video, xf, yf = wrangle_dims(audio, video)
        if self.video_fusion:
            video_fused = ConvGRUFusionCell(
                self.vin_chan, self.ain_chan, self.kernel_size,
                self.bidirectional, self.is2d, name="video_gru",
            )(video, audio, train)
        else:
            video_fused = video
        audio_fused = ConvGRUFusionCell(
            self.ain_chan, self.vin_chan, self.kernel_size,
            self.bidirectional, self.is2d, name="audio_gru",
        )(audio, video, train)
        return unwrangle_dims(audio_fused, video_fused, xf, yf)


class ATTNFusion(nn.Module):
    """CAF fusion (reference ``fusion.py:194-212``) — note: no dim
    wrangling; the cells natively handle 4D audio + 3D video."""

    ain_chan: int
    vin_chan: int
    kernel_size: int
    video_fusion: bool = True
    is2d: bool = True
    spatial_swapped: bool = False  # audio (T,F) axes transposed

    @nn.compact
    def __call__(self, audio, video, train: bool = False):
        if self.video_fusion:
            video_fused = ATTNFusionCell(
                self.vin_chan, self.ain_chan, self.kernel_size, self.is2d,
                spatial_swapped=self.spatial_swapped, name="video_attn",
            )(video, audio, train)
        else:
            video_fused = video
        audio_fused = ATTNFusionCell(
            self.ain_chan, self.vin_chan, self.kernel_size, self.is2d,
            spatial_swapped=self.spatial_swapped, name="audio_attn",
        )(audio, video, train)
        return audio_fused, video_fused


_FUSIONS = {
    "ConcatFusion": ConcatFusion,
    "SumFusion": SumFusion,
    "InjectionFusion": InjectionFusion,
    "LSTMFusion": LSTMFusion,
    "GRUFusion": GRUFusion,
    "ATTNFusion": ATTNFusion,
}


class MultiModalFusion(nn.Module):
    """Builds shared-or-per-repeat fusion blocks; ``video_fusion`` is
    disabled on the last repeat (reference ``fusion.py:215-281``)."""

    audio_bn_chan: int
    video_bn_chan: int
    kernel_size: int = 1
    fusion_repeats: int = 3
    fusion_type: str = "ConcatFusion"
    fusion_shared: bool = False
    is2d: bool = False
    # audio (T,F) axes transposed (internal "ft" layout). Only ATTNFusion
    # supports it — AVNet's tf_order eligibility guarantees that.
    spatial_swapped: bool = False

    def setup(self):
        if self.fusion_repeats <= 0:
            self.fusion_module = None
            return
        if self.spatial_swapped and self.fusion_type != "ATTNFusion":
            raise NotImplementedError(
                f"spatial_swapped fusion only supports ATTNFusion, "
                f"got {self.fusion_type}")
        cls = _FUSIONS[self.fusion_type]
        kw = dict(
            ain_chan=self.audio_bn_chan, vin_chan=self.video_bn_chan,
            kernel_size=self.kernel_size, is2d=self.is2d,
        )
        if self.spatial_swapped:
            kw["spatial_swapped"] = True
        if self.fusion_shared:
            self.fusion_module = cls(video_fusion=self.fusion_repeats > 1, **kw)
        else:
            self.fusion_module = [
                cls(video_fusion=(i != self.fusion_repeats - 1), **kw)
                for i in range(self.fusion_repeats)
            ]

    def get_fusion_block(self, i: int):
        if self.fusion_module is None:
            return lambda a, v, train=False: (a, v)
        return self.fusion_module if self.fusion_shared else self.fusion_module[i]

    def __call__(self, audio, video, train: bool = False):
        audio_residual, video_residual = audio, video
        audio_fused, video_fused = audio, video
        for i in range(self.fusion_repeats):
            if i == 0:
                audio_fused, video_fused = self.get_fusion_block(i)(audio, video, train)
            else:
                audio_fused, video_fused = self.get_fusion_block(i)(
                    audio_fused + audio_residual, video_fused + video_residual, train
                )
        return audio_fused
