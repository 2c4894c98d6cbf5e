"""ShuffleNetV2 trunk (reference:
``src/models/videomodels/shufflenetv2.py``). The video model uses only
``features -> conv_last -> globalpool`` (the 3D frontend replaces
conv1/maxpool — ``frcnn_videomodel.py:34-37``)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...ops.conv import Conv, avg_pool
from ...ops.normalizations import BatchNorm2d

STAGE_OUT_CHANNELS = {
    0.5: [-1, 24, 48, 96, 192, 1024],
    1.0: [-1, 24, 116, 232, 464, 1024],
    1.5: [-1, 24, 176, 352, 704, 1024],
    2.0: [-1, 24, 244, 488, 976, 2048],
}


def channel_shuffle(x, groups: int):
    B, C, H, W = x.shape
    x = x.reshape(B, groups, C // groups, H, W)
    x = jnp.swapaxes(x, 1, 2)
    return x.reshape(B, C, H, W)


class _ConvBNReLU(nn.Module):
    in_chan: int
    out_chan: int
    kernel: int
    stride: int = 1
    padding: int = 0
    groups: int = 1
    relu: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False, frozen: bool = True):
        y = Conv(self.in_chan, self.out_chan, self.kernel, ndim=2,
                 stride=self.stride, padding=self.padding, groups=self.groups,
                 use_bias=False, name="conv")(x)
        y = BatchNorm2d(self.out_chan, name="bn")(
            y, use_running_average=(frozen or not train)
        )
        return jax.nn.relu(y) if self.relu else y


class InvertedResidual(nn.Module):
    inp: int
    oup: int
    stride: int
    benchmodel: int

    @nn.compact
    def __call__(self, x, train: bool = False, frozen: bool = True):
        oup_inc = self.oup // 2
        if self.benchmodel == 1:
            x1, x2 = jnp.split(x, 2, axis=1)
            y = _ConvBNReLU(oup_inc, oup_inc, 1, name="b2_pw")(x2, train, frozen)
            y = _ConvBNReLU(oup_inc, oup_inc, 3, self.stride, 1, groups=oup_inc,
                            relu=False, name="b2_dw")(y, train, frozen)
            y = _ConvBNReLU(oup_inc, oup_inc, 1, name="b2_pwl")(y, train, frozen)
            out = jnp.concatenate([x1, y], axis=1)
        else:
            b1 = _ConvBNReLU(self.inp, self.inp, 3, self.stride, 1,
                             groups=self.inp, relu=False, name="b1_dw")(x, train, frozen)
            b1 = _ConvBNReLU(self.inp, oup_inc, 1, name="b1_pwl")(b1, train, frozen)
            b2 = _ConvBNReLU(self.inp, oup_inc, 1, name="b2_pw")(x, train, frozen)
            b2 = _ConvBNReLU(oup_inc, oup_inc, 3, self.stride, 1, groups=oup_inc,
                             relu=False, name="b2_dw")(b2, train, frozen)
            b2 = _ConvBNReLU(oup_inc, oup_inc, 1, name="b2_pwl")(b2, train, frozen)
            out = jnp.concatenate([b1, b2], axis=1)
        return channel_shuffle(out, 2)


class ShuffleNetV2Trunk(nn.Module):
    """features -> conv_last -> globalpool on (B', 24, H, W) frontend
    output; returns (B', backend_out)."""

    input_size: int = 96
    width_mult: float = 1.0

    @nn.compact
    def __call__(self, x, train: bool = False, frozen: bool = True):
        chans = STAGE_OUT_CHANNELS[self.width_mult]
        stage_repeats = [4, 8, 4]
        input_channel = chans[1]
        idx = 0
        for s, repeats in enumerate(stage_repeats):
            out_channel = chans[s + 2]
            for i in range(repeats):
                x = InvertedResidual(
                    input_channel, out_channel,
                    stride=2 if i == 0 else 1,
                    benchmodel=2 if i == 0 else 1,
                    name=f"features{idx}",
                )(x, train, frozen)
                input_channel = out_channel
                idx += 1
        x = _ConvBNReLU(input_channel, chans[-1], 1, name="conv_last")(x, train, frozen)
        k = self.input_size // 32
        x = avg_pool(x, (k, k))
        return x.reshape(x.shape[0], -1)
