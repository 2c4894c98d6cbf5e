"""Headless ResNet-18 trunk for lip reading
(reference: ``src/models/videomodels/resnet.py:24-130`` — layers only +
global avgpool, no classification head)."""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...ops.conv import Conv
from ...ops.normalizations import BatchNorm2d
from ...ops.activations import PReLU


def kaiming_normal_conv(key, shape, dtype=jnp.float32):
    """reference init: normal(0, sqrt(2/(k*k*out_chan)))."""
    import numpy as np

    n = shape[2] * shape[3] * shape[0]
    return jax.random.normal(key, shape, dtype) * jnp.sqrt(2.0 / n)


class _ConvBN(nn.Module):
    in_chan: int
    out_chan: int
    kernel: int
    stride: int = 1
    padding: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False, frozen: bool = True):
        y = Conv(self.in_chan, self.out_chan, self.kernel, ndim=2,
                 stride=self.stride, padding=self.padding, use_bias=False,
                 name="conv")(x)
        # frozen=True keeps BN in eval mode even during training
        # (reference frcnn_videomodel.py:78-83)
        return BatchNorm2d(self.out_chan, name="bn")(
            y, use_running_average=(frozen or not train)
        )


class BasicBlock(nn.Module):
    inplanes: int
    planes: int
    stride: int = 1
    has_downsample: bool = False
    relu_type: str = "relu"

    @nn.compact
    def __call__(self, x, train: bool = False, frozen: bool = True):
        def act(name, ch):
            if self.relu_type == "prelu":
                return PReLU(num_parameters=ch, name=name)
            return lambda z: jax.nn.relu(z)

        out = _ConvBN(self.inplanes, self.planes, 3, self.stride, 1,
                      name="cbn1")(x, train, frozen)
        out = act("relu1", self.planes)(out)
        out = _ConvBN(self.planes, self.planes, 3, 1, 1,
                      name="cbn2")(out, train, frozen)
        residual = x
        if self.has_downsample:
            residual = _ConvBN(self.inplanes, self.planes, 1, self.stride, 0,
                               name="downsample")(x, train, frozen)
        out = out + residual
        return act("relu2", self.planes)(out)


class ResNet(nn.Module):
    """ResNet-18 trunk: (B', 64, H, W) -> (B', 512) after avgpool."""

    layers: Sequence[int] = (2, 2, 2, 2)
    relu_type: str = "prelu"

    @nn.compact
    def __call__(self, x, train: bool = False, frozen: bool = True):
        inplanes = 64
        for li, (planes, blocks, stride) in enumerate(
            zip((64, 128, 256, 512), self.layers, (1, 2, 2, 2))
        ):
            for b in range(blocks):
                s = stride if b == 0 else 1
                need_ds = (s != 1 or inplanes != planes) and b == 0
                x = BasicBlock(
                    inplanes, planes, s, need_ds, self.relu_type,
                    name=f"layer{li + 1}_{b}",
                )(x, train, frozen)
                inplanes = planes
        x = jnp.mean(x, axis=(2, 3))  # AdaptiveAvgPool2d(1)
        return x
