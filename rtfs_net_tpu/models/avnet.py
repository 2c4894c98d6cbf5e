"""AVNet — the top-level config-assembled model
(reference: ``src/models/tdavnet.py``).

encoder -> audio/video bottleneck convs -> RefinementModule -> mask
generator -> decoder, every sub-module chosen by registry strings from the
YAML config. One pure function under jit: ``apply(params, mix, mouth_emb)``.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn

from . import encoders, decoders, mask_generator as mask_gen_mod
from .layers import ConvNormAct
from .refinement import RefinementModule


def _filter_fields(cls, kwargs, **extra):
    import dataclasses

    fields = {f.name for f in dataclasses.fields(cls)}
    out = {k: v for k, v in kwargs.items() if k in fields}
    out.update({k: v for k, v in extra.items() if k in fields})
    return out


class AVNet(nn.Module):
    n_src: int
    enc_dec_params: Dict[str, Any]
    audio_bn_params: Dict[str, Any]
    audio_params: Dict[str, Any]
    mask_generation_params: Dict[str, Any]
    pretrained_vout_chan: int = -1
    video_bn_params: Optional[Dict[str, Any]] = None
    video_params: Optional[Dict[str, Any]] = None
    fusion_params: Optional[Dict[str, Any]] = None
    # scan-lower the weight-shared audio repeat tail (see RefinementModule)
    scan_shared_repeats: bool = True
    # Internal spatial order of the TF domain. The reference's (B,C,T,F)
    # puts F=129 in the TPU lane (minor) dimension, which pads to 256 —
    # ~1.98x wasted HBM bytes and VPU work on EVERY intermediate. "ft"
    # stores (B,C,F,T) instead (T=251 -> 256 lanes, F=129 -> 136 sublanes,
    # ~1.07x): conv kernels are transposed at apply time and the
    # dim-parametrized layers flip their configured dim, so the param tree
    # and checkpoints are IDENTICAL between orders (bitwise — see
    # tests/test_tf_order.py). "auto" picks "ft" when every configured
    # component supports it, else "tf".
    tf_order: str = "auto"

    def _ft_eligible(self) -> bool:
        """True iff every configured component supports the swapped order."""
        if (self.enc_dec_params.get("encoder_type") != "STFTEncoder"
                or self.enc_dec_params.get("decoder_type") != "STFTDecoder"):
            return False
        if self.audio_params.get("audio_net") not in ("TDANet", "DPTNet"):
            return False
        if not self.audio_params.get("is2d", False):
            return False
        flippable = {"DualPathRNN", "MultiHeadSelfAttention2D", "BiLSTM2D"}
        for lconf in (self.audio_params.get("layers") or {}).values():
            if lconf.get("layer_type") not in flippable:
                return False
        fusion_repeats = (self.video_params or {}).get("repeats", 0)
        if fusion_repeats > 0:
            ftype = (self.fusion_params or {}).get("fusion_type", "ConcatFusion")
            if ftype != "ATTNFusion":
                return False
        return True

    def setup(self):
        video_bn_params = self.video_bn_params or {}
        video_params = self.video_params or {}
        fusion_params = self.fusion_params or {}

        if self.tf_order not in ("auto", "tf", "ft"):
            raise ValueError(f"tf_order must be auto/tf/ft, got {self.tf_order!r}")
        swapped = (self.tf_order == "ft" or
                   (self.tf_order == "auto" and self._ft_eligible()))
        if self.tf_order == "ft" and not self._ft_eligible():
            raise ValueError("tf_order='ft' requested but a configured "
                             "component does not support the swapped order")
        self.spatial_swapped = swapped

        enc_cls = encoders.get(self.enc_dec_params["encoder_type"])
        self.encoder = enc_cls(**_filter_fields(
            enc_cls, self.enc_dec_params,
            in_chan=1,
            upsampling_depth=self.audio_params.get("upsampling_depth", 1),
            spatial_swapped=swapped,
        ))
        self.enc_out_chan = self.encoder.get_out_chan()

        self.audio_bn_chan = self.audio_bn_params.get("out_chan", self.enc_out_chan)
        self.video_bn_chan = video_bn_params.get("out_chan", self.pretrained_vout_chan)

        self.audio_bottleneck = ConvNormAct(**_filter_fields(
            ConvNormAct, {**self.audio_bn_params, "out_chan": self.audio_bn_chan},
            in_chan=self.enc_out_chan,
            spatial_swapped=swapped,
        ))
        self.video_bottleneck = ConvNormAct(**_filter_fields(
            ConvNormAct, video_bn_params, in_chan=self.pretrained_vout_chan,
        ))

        self.refinement_module = RefinementModule(
            fusion_params=fusion_params,
            audio_params=self.audio_params,
            video_params=video_params,
            audio_bn_chan=self.audio_bn_chan,
            video_bn_chan=self.video_bn_chan,
            scan_shared_repeats=self.scan_shared_repeats,
            spatial_swapped=swapped,
        )

        mg_cls = mask_gen_mod.get(
            self.mask_generation_params.get("mask_generator_type", "MaskGenerator")
        )
        self.mask_generator = mg_cls(**_filter_fields(
            mg_cls, self.mask_generation_params,
            n_src=self.n_src,
            audio_emb_dim=self.enc_out_chan,
            bottleneck_chan=self.audio_bn_chan,
            spatial_swapped=swapped,
        ))

        # Deviation from reference (tdavnet.py:79 passes
        # in_chan = enc_out_chan * n_src): its decoders reshape to
        # (B*n_src, in_chan, ...) which is only self-consistent for n_src=1
        # (every active config). We wire the per-source channel count so
        # n_src>1 also decodes correctly; identical for n_src=1.
        dec_cls = decoders.get(self.enc_dec_params["decoder_type"])
        self.decoder = dec_cls(**_filter_fields(
            dec_cls, self.enc_dec_params,
            in_chan=self.enc_out_chan,
            n_src=self.n_src,
            spatial_swapped=swapped,
        ))

    def __call__(self, audio_mixture, mouth_embedding=None, train: bool = False):
        emb = self.encoder(audio_mixture, train)  # (B, N, T, (F))

        audio = self.audio_bottleneck(emb, train)
        video = None
        if mouth_embedding is not None:
            video = self.video_bottleneck(mouth_embedding, train)

        refined = self.refinement_module(audio, video, train)

        separated_emb = self.mask_generator(refined, emb, train)  # (B, n_src, N, T, (F))
        input_shape = (
            audio_mixture.shape if audio_mixture.ndim > 1 else (1, audio_mixture.shape[0])
        )
        return self.decoder(separated_emb, input_shape, train)  # (B, n_src, L)
