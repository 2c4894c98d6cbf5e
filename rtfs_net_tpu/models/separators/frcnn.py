"""FRCNN separator — the CTCNet baseline block
(reference: ``src/models/separators/frcnn.py``): multi-scale pyramid with
lateral up/down fusion between adjacent scales, concat + residual."""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from ..layers import ConvNormAct
from ...ops.conv import interpolate_nearest


class FRCNNBlock(nn.Module):
    in_chan: int
    hid_chan: int
    kernel_size: int = 5
    stride: int = 2
    norm_type: Any = "gLN"
    act_type: Any = "PReLU"
    upsampling_depth: int = 4
    is2d: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        depth = self.upsampling_depth
        residual = ConvNormAct(
            in_chan=self.in_chan, out_chan=self.in_chan, kernel_size=1,
            groups=self.in_chan, act_type=self.act_type, is2d=self.is2d,
            name="gateway",
        )(x, train)
        x_enc = ConvNormAct(
            in_chan=self.in_chan, out_chan=self.hid_chan, kernel_size=1,
            is2d=self.is2d, name="projection",
        )(residual, train)

        downsampled = [
            ConvNormAct(
                in_chan=self.hid_chan, out_chan=self.hid_chan,
                kernel_size=self.kernel_size, stride=1, groups=self.hid_chan,
                norm_type=self.norm_type, is2d=self.is2d, name="down0",
            )(x_enc, train)
        ]
        for i in range(1, depth):
            downsampled.append(
                ConvNormAct(
                    in_chan=self.hid_chan, out_chan=self.hid_chan,
                    kernel_size=self.kernel_size, stride=self.stride,
                    groups=self.hid_chan, norm_type=self.norm_type,
                    is2d=self.is2d, name=f"down{i}",
                )(downsampled[-1], train)
            )

        # lateral fusion: each scale sees (downsampled finer, itself,
        # upsampled coarser)
        fused = []
        for i in range(depth):
            parts = []
            if i - 1 >= 0:
                parts.append(
                    ConvNormAct(
                        in_chan=self.hid_chan, out_chan=self.hid_chan,
                        kernel_size=self.kernel_size, stride=self.stride,
                        groups=self.hid_chan, norm_type=self.norm_type,
                        is2d=self.is2d, name=f"lateral{i}",
                    )(downsampled[i - 1], train)
                )
            parts.append(downsampled[i])
            if i + 1 < depth:
                parts.append(
                    interpolate_nearest(downsampled[i + 1], downsampled[i].shape[2:])
                )
            y = jnp.concatenate(parts, axis=1)
            fused.append(
                ConvNormAct(
                    in_chan=self.hid_chan * len(parts), out_chan=self.hid_chan,
                    kernel_size=1, norm_type=self.norm_type,
                    act_type=self.act_type, is2d=self.is2d, name=f"concat{i}",
                )(y, train)
            )

        # resize everything to the finest scale and merge
        target = downsampled[0].shape[2:]
        fused = [fused[0]] + [interpolate_nearest(f, target) for f in fused[1:]]
        merged = jnp.concatenate(fused, axis=1)
        merged = ConvNormAct(
            in_chan=self.hid_chan * depth, out_chan=self.hid_chan, kernel_size=1,
            norm_type=self.norm_type, act_type=self.act_type, is2d=self.is2d,
            name="residual_conv0",
        )(merged, train)
        out = ConvNormAct(
            in_chan=self.hid_chan, out_chan=self.in_chan, kernel_size=1,
            is2d=self.is2d, name="residual_conv1",
        )(merged, train)
        return out + residual


class FRCNN(nn.Module):
    in_chan: int = -1
    hid_chan: int = -1
    kernel_size: int = 5
    stride: int = 2
    norm_type: Any = "gLN"
    act_type: Any = "PReLU"
    upsampling_depth: int = 4
    repeats: int = 4
    shared: bool = False
    is2d: bool = False
    remat: bool = True  # rematerialize each block in backward (saves ~NxHBM)

    def setup(self):
        if self.in_chan > 0 and self.hid_chan > 0:
            kw = dict(
                in_chan=self.in_chan, hid_chan=self.hid_chan,
                kernel_size=self.kernel_size, stride=self.stride,
                norm_type=self.norm_type, act_type=self.act_type,
                upsampling_depth=self.upsampling_depth, is2d=self.is2d,
            )
            cls = (nn.remat(FRCNNBlock, static_argnums=(2,))
                   if self.remat else FRCNNBlock)
            if self.shared:
                self.blocks = cls(**kw)
            else:
                self.blocks = [cls(**kw) for _ in range(self.repeats)]
        else:
            self.blocks = None

    def get_block(self, i: int):
        if self.blocks is None:
            return lambda x, train=False: x
        return self.blocks if self.shared else self.blocks[i]

    def __call__(self, x, train: bool = False):
        residual = x
        for i in range(self.repeats):
            x = self.get_block(i)((x + residual) if i > 0 else x, train)
        return x
