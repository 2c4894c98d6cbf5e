"""Composite conv blocks (reference: ``src/models/layers/conv_layers.py``).

All blocks run on channel-first tensors; ``is2d`` switches (B,C,T) vs
(B,C,T,F) exactly like the reference. ``train`` call-kwarg threads
dropout/BN mode.
"""
from __future__ import annotations

from typing import Any, Optional, Union

import jax.numpy as jnp
import flax.linen as nn

from ...ops import activations, normalizations
from ...ops.conv import Conv, DropPath


def make_norm(norm_type, chan: int, n_freqs: int = -1,
              axis_name: Optional[str] = None, name: Optional[str] = None):
    """Build a norm module from a registry string (LN4D takes (C, F))."""
    cls = normalizations.get(norm_type)
    kw = {"name": name} if name is not None else {}
    if cls is normalizations.LayerNormalization4D:
        return cls(chan, n_freqs if n_freqs > 0 else 1, **kw)
    if cls in (normalizations.BatchNorm1d, normalizations.BatchNorm2d,
               normalizations.BatchNorm3d, normalizations.BatchNorm):
        return cls(chan, axis_name=axis_name, **kw)
    if cls is normalizations.LayerNorm:
        return cls(chan, **kw)
    if cls is normalizations.Identity:
        return cls(**kw)
    return cls(chan, **kw)


def apply_norm(norm, x, train: bool):
    if isinstance(norm, normalizations.BatchNorm):
        return norm(x, use_running_average=not train)
    return norm(x)


class ConvNormAct(nn.Module):
    """pre_norm -> pre_act -> conv -> norm -> act
    (reference ``conv_layers.py:65-139``; kernel<=0 => Identity conv and
    out_chan collapses to in_chan; stride>1 pads ``dilation*(k-1)//2``,
    stride==1 pads torch-"same")."""

    in_chan: int = 1
    out_chan: int = 1
    kernel_size: int = -1
    stride: int = 1
    groups: int = 1
    dilation: int = 1
    padding: Optional[Union[int, str]] = None
    pre_norm_type: Any = None
    pre_act_type: Any = None
    norm_type: Any = None
    act_type: Any = None
    xavier_init: bool = False
    bias: bool = True
    is2d: bool = False
    spatial_swapped: bool = False  # input (T,F) axes transposed; see ops.conv.Conv

    @property
    def real_out_chan(self) -> int:
        return self.out_chan if self.kernel_size > 0 else self.in_chan

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_chan = self.real_out_chan
        pad = self.padding
        if pad is None:
            pad = self.dilation * (self.kernel_size - 1) // 2 if self.stride > 1 else "same"

        pre_norm = make_norm(self.pre_norm_type, self.in_chan, name="pre_norm")
        pre_act = activations.get(self.pre_act_type)(name="pre_act")
        norm = make_norm(self.norm_type, out_chan, name="norm")
        act = activations.get(self.act_type)(name="act")

        y = apply_norm(pre_norm, x, train)
        y = pre_act(y)
        if self.kernel_size > 0:
            conv = Conv(
                in_chan=self.in_chan,
                out_chan=out_chan,
                kernel_size=self.kernel_size,
                ndim=2 if self.is2d else 1,
                stride=self.stride,
                padding=pad,
                dilation=self.dilation,
                groups=self.groups,
                use_bias=self.bias,
                xavier_init=self.xavier_init,
                spatial_swapped=self.spatial_swapped,
                name="conv",
            )
            y = conv(y)
        y = apply_norm(norm, y, train)
        y = act(y)
        return y


class ConvActNorm(nn.Module):
    """conv -> act -> norm ordering (reference ``conv_layers.py:142-215``;
    stride>1 pads 0, stride==1 pads "same"; LN4D norm takes (C, n_freqs))."""

    in_chan: int = 1
    out_chan: int = 1
    kernel_size: int = -1
    stride: int = 1
    groups: int = 1
    dilation: int = 1
    padding: Optional[Union[int, str]] = None
    norm_type: Any = None
    act_type: Any = None
    n_freqs: int = -1
    xavier_init: bool = False
    bias: bool = True
    is2d: bool = False
    spatial_swapped: bool = False  # input (T,F) axes transposed; see ops.conv.Conv

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.padding
        if pad is None:
            pad = 0 if self.stride > 1 else "same"
        if self.kernel_size > 0:
            y = Conv(
                in_chan=self.in_chan,
                out_chan=self.out_chan,
                kernel_size=self.kernel_size,
                ndim=2 if self.is2d else 1,
                stride=self.stride,
                padding=pad,
                dilation=self.dilation,
                groups=self.groups,
                use_bias=self.bias,
                xavier_init=self.xavier_init,
                spatial_swapped=self.spatial_swapped,
                name="conv",
            )(x)
        else:
            y = x
        y = activations.get(self.act_type)(name="act")(y)
        norm = make_norm(self.norm_type, self.out_chan, self.n_freqs, name="norm")
        y = apply_norm(norm, y, train)
        return y


class DepthwiseSeparableConvolution(nn.Module):
    """DW conv + PW conv -> act -> norm (reference ``conv_layers.py:10-62``)."""

    in_chan: int
    out_chan: int
    kernel_size: int = -1
    stride: int = 1
    norm_type: Any = None
    act_type: Any = None
    xavier_init: bool = False
    is2d: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        ks = self.kernel_size[0] if hasattr(self.kernel_size, "__len__") else self.kernel_size
        if ks <= 0:
            return x
        y = ConvNormAct(
            in_chan=self.in_chan, out_chan=self.in_chan, kernel_size=self.kernel_size,
            stride=self.stride, groups=self.in_chan, xavier_init=self.xavier_init,
            is2d=self.is2d,
        )(x, train)
        y = ConvNormAct(
            in_chan=self.in_chan, out_chan=self.out_chan, kernel_size=1,
            xavier_init=self.xavier_init, is2d=self.is2d,
        )(y, train)
        y = activations.get(self.act_type)()(y)
        norm = make_norm(self.norm_type, self.out_chan)
        return apply_norm(norm, y, train)


class FeedForwardNetwork(nn.Module):
    """conv-FFN: 1x1 expand -> DW refine -> 1x1 contract, DropPath residual
    (reference ``conv_layers.py:218-259``)."""

    in_chan: int
    hid_chan: int
    kernel_size: int = 5
    norm_type: Any = "gLN"
    act_type: Any = "ReLU"
    dropout: float = 0.0
    is2d: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        res = x
        y = ConvNormAct(self.in_chan, self.hid_chan, 1, norm_type=self.norm_type,
                        bias=False, is2d=self.is2d)(x, train)
        y = ConvNormAct(self.hid_chan, self.hid_chan, self.kernel_size,
                        groups=self.hid_chan, act_type=self.act_type,
                        is2d=self.is2d)(y, train)
        dp = DropPath(self.dropout)
        y = dp(y, deterministic=not train)
        y = ConvNormAct(self.hid_chan, self.in_chan, 1, norm_type=self.norm_type,
                        bias=False, is2d=self.is2d)(y, train)
        y = dp(y, deterministic=not train) + res
        return y


class ConvolutionalRNN(nn.Module):
    """pseudo-RNN: forward DW conv + flipped backward DW conv concat
    (reference ``conv_layers.py:262-316``)."""

    in_chan: int
    hid_chan: int
    kernel_size: int = 5
    norm_type: Any = "gLN"
    act_type: Any = "ReLU"
    dropout: float = 0.0
    is2d: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        res = x
        y = ConvNormAct(self.in_chan, self.hid_chan, 1, norm_type=self.norm_type,
                        bias=False, is2d=self.is2d)(x, train)
        fwd = ConvNormAct(self.hid_chan, self.hid_chan, self.kernel_size,
                          groups=self.hid_chan, act_type=self.act_type,
                          is2d=self.is2d)(y, train)
        flip_axes = (2, 3) if self.is2d else (2,)
        bwd = ConvNormAct(self.hid_chan, self.hid_chan, self.kernel_size,
                          groups=self.hid_chan, act_type=self.act_type,
                          is2d=self.is2d)(jnp.flip(y, flip_axes), train)
        y = jnp.concatenate([fwd, bwd], axis=1)
        dp = DropPath(self.dropout)
        y = dp(y, deterministic=not train)
        y = ConvNormAct(self.hid_chan * 2, self.in_chan, 1, norm_type=self.norm_type,
                        bias=False, is2d=self.is2d)(y, train)
        y = dp(y, deterministic=not train) + res
        return y
