"""Refinement module (reference: ``src/models/TDAVNet/refinement_module.py``).

Orchestrates the repeat schedule: ``fusion_repeats`` iterations interleave
the audio block, the video block and cross-modal fusion (with residual
re-injection ``x + residual`` for i > 0), then ``audio_repeats -
fusion_repeats`` audio-only iterations.

When the audio separator is weight-shared (``shared=True`` — every active
RTFS/CTCNet config), the audio-only tail is lowered to ONE ``nn.scan``
over the repeat count instead of trace-time unrolling: RTFS-12's 11
recursion steps (or CTCNet-16's 15) trace and compile a single block, so
compile time and executable size stay constant in ``repeats``
(SURVEY.md §7). Numerics are unchanged (same params each step); see
``tests/test_scan_repeats.py``.
"""
from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn

from . import separators
from .fusion import MultiModalFusion


class RefinementModule(nn.Module):
    audio_params: Dict[str, Any]
    video_params: Dict[str, Any]
    audio_bn_chan: int
    video_bn_chan: int
    fusion_params: Dict[str, Any]
    # lower the weight-shared audio-only tail to one lax.scan iteration
    # (compile time / executable size constant in `repeats`); numerics
    # are identical to unrolling — disable only for A/B debugging
    scan_shared_repeats: bool = True
    # the audio stream's (T,F) axes are stored transposed (internal "ft"
    # layout; see AVNet.tf_order) — threaded to the 2D audio separator and
    # the cross-modal fusion; the 1D video net is unaffected
    spatial_swapped: bool = False

    def setup(self):
        self.fusion_repeats = self.video_params.get("repeats", 0)
        self.audio_repeats = self.audio_params["repeats"] - self.fusion_repeats

        def sep_kwargs(params, in_chan):
            kw = {k: v for k, v in params.items()
                  if k not in ("audio_net", "video_net", "in_chan")}
            kw["in_chan"] = in_chan
            return kw

        audio_cls = separators.get(self.audio_params.get("audio_net", None))
        video_cls = separators.get(self.video_params.get("video_net", None))
        if audio_cls is separators._IdentitySeparator:
            self.audio_net = audio_cls()
        else:
            akw = _filter(audio_cls, sep_kwargs(self.audio_params, self.audio_bn_chan))
            if self.spatial_swapped:
                akw["spatial_swapped"] = True  # field existence guaranteed
                # by AVNet's tf_order eligibility check
            self.audio_net = audio_cls(**akw)
        if video_cls is separators._IdentitySeparator:
            self.video_net = video_cls()
        else:
            self.video_net = video_cls(**_filter(video_cls, sep_kwargs(self.video_params, self.video_bn_chan)))

        # Blocks holding BatchNorm running stats can't ride the repeat
        # scan (nn.scan can't initialize a collection first created inside
        # the body); unroll those configs instead. Static probe of the
        # config: explicit BatchNorm norm_types, or layer classes that
        # embed BN internally (CoTAttention — reference attention.py:419-427).
        from collections.abc import Mapping

        def has_bn(obj):
            # flax freezes nested config dicts to FrozenDict in setup, so
            # match any Mapping, not just dict
            if isinstance(obj, Mapping):
                return any(has_bn(v) for v in obj.values())
            return isinstance(obj, str) and (
                "BatchNorm" in obj or obj == "CoTAttention")

        self._audio_has_batchnorm = has_bn(self.audio_params)

        fkw = {k: v for k, v in self.fusion_params.items()}
        if self.spatial_swapped:
            fkw["spatial_swapped"] = True
        self.crossmodal_fusion = MultiModalFusion(
            audio_bn_chan=self.audio_bn_chan,
            video_bn_chan=self.video_bn_chan,
            fusion_repeats=self.fusion_repeats,
            **_filter(MultiModalFusion, fkw, exclude=("audio_bn_chan", "video_bn_chan", "fusion_repeats")),
        )

    def __call__(self, audio, video=None, train: bool = False):
        audio_residual = audio
        video_residual = video

        for i in range(self.fusion_repeats):
            audio = self.audio_net.get_block(i)(
                audio + audio_residual if i > 0 else audio, train
            )
            video = self.video_net.get_block(i)(
                video + video_residual if i > 0 else video, train
            )
            audio, video = self.crossmodal_fusion.get_fusion_block(i)(audio, video, train)

        start = self.fusion_repeats
        n_tail = self.audio_repeats
        use_scan = (self.scan_shared_repeats
                    and self.audio_params.get("shared", False) and n_tail > 1
                    and not self._audio_has_batchnorm)
        if use_scan and start == 0:
            # repeat 0 skips the residual add (reference
            # refinement_module.py:57-61) — peel it, scan the rest
            audio = self.audio_net.get_block(0)(audio, train)
            start, n_tail = 1, n_tail - 1
        if use_scan and n_tail > 1:
            # every tail iteration is block(x + residual) with the SAME
            # params -> one scan step traced once. (Audio nets with
            # BatchNorm are unrolled instead — see _audio_has_batchnorm;
            # every active RTFS/CTCNet config is gLN/LN4D and scans.)
            def body(mod, carry, _):
                x, res = carry
                y = mod.audio_net.get_block(start)(x + res, train)
                return (y, res), None

            scan = nn.scan(
                body,
                variable_broadcast="params",
                split_rngs={"dropout": True},
                length=n_tail,
            )
            (audio, _), _ = scan(self, (audio, audio_residual), None)
        else:
            for j in range(n_tail):
                i = j + start
                audio = self.audio_net.get_block(i)(
                    audio + audio_residual if i > 0 else audio, train
                )

        return audio


def _filter(cls, kwargs, exclude=()):
    import dataclasses

    fields = {f.name for f in dataclasses.fields(cls)}
    return {k: v for k, v in kwargs.items() if k in fields and k not in exclude}
