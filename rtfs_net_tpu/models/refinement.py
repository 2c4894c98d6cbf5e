"""Refinement module (reference: ``src/models/TDAVNet/refinement_module.py``).

Orchestrates the repeat schedule: ``fusion_repeats`` iterations interleave
the audio block, the video block and cross-modal fusion (with residual
re-injection ``x + residual`` for i > 0), then ``audio_repeats -
fusion_repeats`` audio-only iterations.
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
            self.audio_net = audio_cls(**_filter(audio_cls, sep_kwargs(self.audio_params, self.audio_bn_chan)))
        if video_cls is separators._IdentitySeparator:
            self.video_net = video_cls()
        else:
            self.video_net = video_cls(**_filter(video_cls, sep_kwargs(self.video_params, self.video_bn_chan)))

        fkw = {k: v for k, v in self.fusion_params.items()}
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

        for j in range(self.audio_repeats):
            i = j + self.fusion_repeats
            audio = self.audio_net.get_block(i)(
                audio + audio_residual if i > 0 else audio, train
            )

        return audio


def _filter(cls, kwargs, exclude=()):
    import dataclasses

    fields = {f.name for f in dataclasses.fields(cls)}
    return {k: v for k, v in kwargs.items() if k in fields and k not in exclude}
