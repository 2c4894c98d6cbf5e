"""Audio encoders (reference: ``src/models/TDAVNet/encoder.py``)."""
from __future__ import annotations

import math
from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from .layers import ConvNormAct
from ..ops import stft as stft_ops


def unsqueeze_to_3d(x):
    if x.ndim == 1:
        return x.reshape(1, 1, -1)
    if x.ndim == 2:
        return x[:, None, :]
    return x


def unsqueeze_to_2d(x):
    if x.ndim == 1:
        return x.reshape(1, -1)
    if x.ndim == 3:
        assert x.shape[1] == 1
        return x.reshape(x.shape[0], -1)
    return x


def pad_to_multiple(x, lcm: int):
    rem = x.shape[-1] % lcm
    if rem:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, lcm - rem)]
        return jnp.pad(x, pad)
    return x


class ConvolutionalEncoder(nn.Module):
    """Time-domain bank: ``layers`` dilated Conv1d branches (kernel
    k*dilation) summed — the CTCNet front-end
    (reference ``encoder.py:58-119``)."""

    in_chan: int
    out_chan: int
    kernel_size: int
    stride: int
    act_type: Any = None
    norm_type: Any = "gLN"
    bias: bool = False
    layers: int = 1
    upsampling_depth: int = 4

    def get_out_chan(self) -> int:
        return self.out_chan

    @property
    def lcms(self):
        k2, up2 = self.kernel_size // 2, 2 ** self.upsampling_depth
        g = math.gcd(k2, up2)
        lcm_1 = abs(self.out_chan // 2 * up2) // g
        lcm_2 = abs(k2 * up2) // g
        return lcm_1, lcm_2

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = unsqueeze_to_3d(x)
        lcm_1, lcm_2 = self.lcms
        x = pad_to_multiple(pad_to_multiple(x, lcm_1), lcm_2)
        maps = []
        for i in range(self.layers):
            dilation = i + 1
            maps.append(
                ConvNormAct(
                    in_chan=self.in_chan, out_chan=self.out_chan,
                    kernel_size=self.kernel_size * dilation, stride=self.stride,
                    dilation=dilation, norm_type=self.norm_type,
                    act_type=self.act_type, xavier_init=True, bias=self.bias,
                    name=f"branch{i}",
                )(x, train)
            )
        return sum(maps)


class STFTEncoder(nn.Module):
    """RTFS front-end: STFT (hann, onesided, centered) -> stack Re/Im as
    (B, 2, T, F) -> 2D ConvNormAct to ``out_chan``
    (reference ``encoder.py:122-175``)."""

    win: int
    hop_length: int
    out_chan: int = 2
    kernel_size: int = -1
    stride: int = 1
    act_type: Any = "ReLU"
    norm_type: Any = "gLN"
    bias: bool = False
    # Emit (B, C, F, T) instead of (B, C, T, F) — the internal "ft" layout
    # (see AVNet.tf_order). The DFT-basis STFT is already bins-major, so
    # this REMOVES the T<->F transpose; the conv kernel is transposed at
    # apply time (params stay canonical).
    spatial_swapped: bool = False

    def get_out_chan(self) -> int:
        return self.out_chan

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = unsqueeze_to_2d(x)
        re, im = stft_ops.stft(x, self.win, self.hop_length)  # (B, F, T) each
        spec = jnp.stack([re, im], axis=1)  # (B, 2, F, T)
        if not self.spatial_swapped:
            spec = jnp.swapaxes(spec, 2, 3)  # (B, 2, T, F)
        spec = spec.astype(x.dtype)
        return ConvNormAct(
            in_chan=2, out_chan=self.out_chan, kernel_size=self.kernel_size,
            stride=self.stride, act_type=self.act_type, norm_type=self.norm_type,
            xavier_init=True, bias=self.bias, is2d=True,
            spatial_swapped=self.spatial_swapped, name="conv",
        )(spec, train)


_REGISTRY = {"ConvolutionalEncoder": ConvolutionalEncoder, "STFTEncoder": STFTEncoder}


def get(identifier):
    if identifier is None:
        raise ValueError("encoder_type is required")
    if callable(identifier):
        return identifier
    cls = _REGISTRY.get(identifier)
    if cls is None:
        raise ValueError(f"Could not interpret encoder identifier: {identifier}")
    return cls
