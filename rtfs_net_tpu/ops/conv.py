"""Convolution primitives with torch-matching numerics on channel-first data.

All modules operate on (B, C, *spatial) tensors and keep torch's weight
layouts — Conv: (O, I/g, *k); ConvTranspose: (I, O/g, *k); Linear: (O, I) —
so reference checkpoints map 1:1 onto the param pytree. Convs lower to
``lax.conv_general_dilated`` with NC* dimension numbers; XLA assigns TPU
layouts and tiles the contractions onto the MXU.

Padding semantics replicated exactly from torch (the reference relies on
them — ``src/models/layers/conv_layers.py:100-101`` uses ``"same"`` with
even kernels, which pads asymmetrically: left = total//2, right = rest):

  * ``"same"`` (stride 1 only): total = dilation*(k-1), lo = total//2,
    hi = total - lo.
  * int / per-dim ints: symmetric.
"""
from __future__ import annotations

import math
import os
from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
from jax import lax

IntOrTuple = Union[int, Sequence[int]]


def _to_tuple(v: IntOrTuple, ndim: int) -> Tuple[int, ...]:
    if isinstance(v, (list, tuple)):
        assert len(v) == ndim, (v, ndim)
        return tuple(int(x) for x in v)
    return (int(v),) * ndim


def _resolve_padding(padding, kernel, dilation, ndim):
    """Resolve a torch-style padding spec into lax ((lo, hi), ...) pairs."""
    if padding == "same":
        out = []
        for k, d in zip(kernel, dilation):
            total = d * (k - 1)
            lo = total // 2
            out.append((lo, total - lo))
        return tuple(out)
    if padding == "valid":
        return tuple((0, 0) for _ in range(ndim))
    pad = _to_tuple(padding, ndim)
    return tuple((p, p) for p in pad)


def torch_conv_init(fan_in: int):
    """torch's default Conv/Linear init: kaiming_uniform(a=sqrt(5)) on the
    weight == U(-1/sqrt(fan_in), 1/sqrt(fan_in)); same bound for bias."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def xavier_uniform_init():
    def init(key, shape, dtype=jnp.float32):
        # torch xavier_uniform over (O, I, *k): fans = (I*prod(k), O*prod(k))
        receptive = int(np.prod(shape[2:])) if len(shape) > 2 else 1
        fan_out = shape[0] * receptive
        fan_in = shape[1] * receptive
        bound = math.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _use_pallas_dw(x_shape, kernel, stride, dilation, groups,
                   in_chan, out_chan, ndim, pads) -> bool:
    """Route eligible depthwise convs to the Pallas stencil kernel.

    OFF by default — measured on v5e at the serving hot shape
    (128, 64, 251, 129) bf16 the stencil kernel runs 6.7 ms vs XLA's
    3.95 ms (roofline 1.3 ms): the k×k taps become sublane-misaligned
    F-axis shifts of the VMEM tile, and Mosaic's shift+FMA sequence is
    slower than XLA's conv lowering. Kept as verified infrastructure
    (exact fwd/grad parity incl. custom_vjp) behind RTFS_PALLAS_DW=1 on
    TPU / RTFS_PALLAS_DW_INTERPRET=1 elsewhere (interpret mode, slow —
    correctness tests only)."""
    backend = jax.default_backend()
    if backend == "tpu":
        if os.environ.get("RTFS_PALLAS_DW", "0") != "1":
            return False
    elif os.environ.get("RTFS_PALLAS_DW_INTERPRET", "0") != "1":
        return False
    from .pallas.dw_conv import pallas_dw_supported

    return pallas_dw_supported(x_shape, kernel, stride, dilation, groups,
                               in_chan, out_chan, ndim, pads)


class Conv(nn.Module):
    """torch ``nn.Conv{1,2,3}d`` equivalent on (B, C, *spatial)."""

    in_chan: int
    out_chan: int
    kernel_size: IntOrTuple
    ndim: int = 1
    stride: IntOrTuple = 1
    padding: Union[str, IntOrTuple] = 0
    dilation: IntOrTuple = 1
    groups: int = 1
    use_bias: bool = True
    xavier_init: bool = False
    dtype: jnp.dtype | None = None
    # The input's two spatial axes are stored transposed relative to the
    # canonical (T, F) order (the internal "ft" fast layout — see
    # AVNet.tf_order). Parameters keep the CANONICAL orientation so
    # checkpoints are layout-independent; the kernel (and the per-axis
    # stride/dilation/padding specs) are transposed at apply time instead.
    spatial_swapped: bool = False

    @nn.compact
    def __call__(self, x):
        nd = self.ndim
        kernel = _to_tuple(self.kernel_size, nd)
        stride = _to_tuple(self.stride, nd)
        dilation = _to_tuple(self.dilation, nd)
        pads = _resolve_padding(self.padding, kernel, dilation, nd)

        wshape = (self.out_chan, self.in_chan // self.groups, *kernel)
        fan_in = (self.in_chan // self.groups) * int(np.prod(kernel))
        w_init = xavier_uniform_init() if self.xavier_init else torch_conv_init(fan_in)
        w = self.param("weight", w_init, wshape)

        if self.spatial_swapped and nd == 2:
            w = jnp.swapaxes(w, -1, -2)
            kernel, stride = kernel[::-1], stride[::-1]
            dilation, pads = dilation[::-1], pads[::-1]
            wshape = w.shape

        # depthwise 1x1 is just a per-channel scale (+bias): lower to
        # elementwise math — grouped 1x1 convs hit slow XLA conv paths on
        # TPU while this fuses into neighbouring VPU ops
        if (self.groups == self.in_chan and self.out_chan == self.in_chan
                and all(k == 1 for k in kernel)
                and all(s == 1 for s in stride)):
            scale = w.reshape((1, self.out_chan) + (1,) * nd).astype(x.dtype)
            y = x * scale
            if self.use_bias:
                b = self.param("bias", torch_conv_init(fan_in), (self.out_chan,))
                y = y + b.reshape((1, -1) + (1,) * nd).astype(x.dtype)
            return y

        # k×k stride-1 depthwise convs at serving batch: Pallas stencil
        # kernel (each input tile read once into VMEM) — XLA's grouped-conv
        # lowering moves these at ~1/3 of the HBM roofline (see
        # ops/pallas/dw_conv.py). Same math, f32 tap accumulation;
        # training grads are the standard XLA conv expressions (custom_vjp).
        if _use_pallas_dw(x.shape, kernel, stride, dilation, self.groups,
                          self.in_chan, self.out_chan, nd, pads):
            from .pallas.dw_conv import dw_conv2d_same

            dtype = self.dtype or x.dtype
            y = dw_conv2d_same(x.astype(dtype), w, tuple(pads))
            if self.use_bias:
                b = self.param("bias", torch_conv_init(fan_in), (self.out_chan,))
                y = y + b.reshape((1, -1) + (1,) * nd).astype(y.dtype)
            return y.astype(x.dtype)

        # A/B knob: lower ungrouped 1x1 convs as a channel-contraction
        # einsum instead of conv_general_dilated — XLA's dot and conv
        # layout assignment differ, and the serving profile shows the big
        # 1x1 convs (residual_conv 64->256, mask_conv, bottleneck) running
        # C-minor with full-tensor layout copies around them. Measured
        # round 5 (v5e, RTFS-4 B=128 bf16 serving): 312.4 utt/s vs the
        # conv lowering's 335.0 — the dot form is WORSE (stays off).
        if (os.environ.get("RTFS_CONV1X1_DOT") == "1" and self.groups == 1
                and all(k == 1 for k in kernel)
                and all(s == 1 for s in stride)
                and all(p == (0, 0) for p in pads)):
            dtype = self.dtype or x.dtype
            w2 = w.reshape(self.out_chan, self.in_chan).astype(dtype)
            y = jnp.einsum("bc...,oc->bo...", x.astype(dtype), w2)
            if self.use_bias:
                b = self.param("bias", torch_conv_init(fan_in), (self.out_chan,))
                y = y + b.reshape((1, -1) + (1,) * nd).astype(y.dtype)
            return y.astype(x.dtype)

        dn = lax.conv_dimension_numbers(
            x.shape, wshape, (("NC" + "DHW"[-nd:]), ("OI" + "DHW"[-nd:]), ("NC" + "DHW"[-nd:]))
        )
        dtype = self.dtype or x.dtype
        # request f32 accumulation only for f32 operands: jax's conv
        # gradient rules reject mixed (bf16 in, f32 out) operand dtypes,
        # and the TPU MXU accumulates bf16 in f32 internally anyway
        pet = jnp.float32 if dtype == jnp.float32 else None
        y = lax.conv_general_dilated(
            x.astype(dtype),
            w.astype(dtype),
            window_strides=stride,
            padding=pads,
            rhs_dilation=dilation,
            dimension_numbers=dn,
            feature_group_count=self.groups,
            preferred_element_type=pet,
        )
        if self.use_bias:
            b = self.param("bias", torch_conv_init(fan_in), (self.out_chan,))
            y = y + b.reshape((1, -1) + (1,) * nd)
        return y.astype(x.dtype)


class ConvTranspose(nn.Module):
    """torch ``nn.ConvTranspose{1,2}d`` equivalent on (B, C, *spatial).

    Implemented as an input-dilated correlation with the spatially-flipped,
    IO-swapped kernel: out = (in-1)*stride - 2*pad + dilation*(k-1)
    + output_padding + 1.
    """

    in_chan: int
    out_chan: int
    kernel_size: IntOrTuple
    ndim: int = 1
    stride: IntOrTuple = 1
    padding: IntOrTuple = 0
    output_padding: IntOrTuple = 0
    dilation: IntOrTuple = 1
    groups: int = 1
    use_bias: bool = True
    xavier_init: bool = False
    dtype: jnp.dtype | None = None
    spatial_swapped: bool = False  # see Conv.spatial_swapped

    @nn.compact
    def __call__(self, x):
        nd = self.ndim
        kernel = _to_tuple(self.kernel_size, nd)
        stride = _to_tuple(self.stride, nd)
        dilation = _to_tuple(self.dilation, nd)
        pad = _to_tuple(self.padding, nd)
        opad = _to_tuple(self.output_padding, nd)
        swap = self.spatial_swapped and nd == 2
        if swap:
            stride, dilation = stride[::-1], dilation[::-1]
            pad, opad = pad[::-1], opad[::-1]

        # torch layout: (I, O/g, *k); fan_in for default init = (O/g) * prod(k)
        wshape = (self.in_chan, self.out_chan // self.groups, *kernel)
        fan_in = (self.out_chan // self.groups) * int(np.prod(kernel))
        if self.xavier_init:
            # torch xavier on (I, O/g, *k): fan_in = (O/g)*rec, fan_out = I*rec
            def w_init(key, shape, dtype=jnp.float32):
                receptive = int(np.prod(shape[2:]))
                bound = math.sqrt(6.0 / (shape[1] * receptive + shape[0] * receptive))
                return jax.random.uniform(key, shape, dtype, -bound, bound)
        else:
            w_init = torch_conv_init(fan_in)
        w = self.param("weight", w_init, wshape)

        # (I, O/g, *k) -> (g, I/g, O/g, *k) -> (g, O/g, I/g, *k) -> (O, I/g, *k)
        g = self.groups
        wt = w.reshape((g, self.in_chan // g, self.out_chan // g) + kernel)
        wt = jnp.swapaxes(wt, 1, 2)
        wt = wt.reshape((self.out_chan, self.in_chan // g) + kernel)
        wt = jnp.flip(wt, axis=tuple(range(2, 2 + nd)))
        if swap:
            wt = jnp.swapaxes(wt, -1, -2)
            kernel = kernel[::-1]

        pads = tuple(
            (d * (k - 1) - p, d * (k - 1) - p + op)
            for k, d, p, op in zip(kernel, dilation, pad, opad)
        )
        dn = lax.conv_dimension_numbers(
            x.shape, wt.shape, (("NC" + "DHW"[-nd:]), ("OI" + "DHW"[-nd:]), ("NC" + "DHW"[-nd:]))
        )
        dtype = self.dtype or x.dtype
        pet = jnp.float32 if dtype == jnp.float32 else None  # see Conv
        y = lax.conv_general_dilated(
            x.astype(dtype),
            wt.astype(dtype),
            window_strides=(1,) * nd,
            padding=pads,
            lhs_dilation=stride,
            rhs_dilation=dilation,
            dimension_numbers=dn,
            feature_group_count=g,
            preferred_element_type=pet,
        )
        if self.use_bias:
            b = self.param("bias", torch_conv_init(fan_in), (self.out_chan,))
            y = y + b.reshape((1, -1) + (1,) * nd)
        return y.astype(x.dtype)


class Linear(nn.Module):
    """torch ``nn.Linear`` equivalent; weight (O, I)."""

    in_features: int
    out_features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", torch_conv_init(self.in_features), (self.out_features, self.in_features))
        y = x @ w.T.astype(x.dtype)
        if self.use_bias:
            b = self.param("bias", torch_conv_init(self.in_features), (self.out_features,))
            y = y + b.astype(x.dtype)
        return y


def _nearest_matrix(in_size: int, out_size: int) -> np.ndarray:
    """0/1 selection matrix (in, out) for torch nearest interpolation
    (src = floor(dst * in/out))."""
    m = np.zeros((in_size, out_size), np.float32)
    idx = np.floor(np.arange(out_size) * (in_size / out_size)).astype(np.int64)
    m[idx, np.arange(out_size)] = 1.0
    return m


def interpolate_nearest(x: jnp.ndarray, size: Sequence[int]) -> jnp.ndarray:
    """torch ``F.interpolate(mode="nearest")`` on (B, C, *spatial):
    src_idx = floor(dst_idx * in/out) per dim.

    Exact lowerings, chosen per dim at trace time:

    - When the index map collapses to a pure repeat prefix
      (``floor(dst*in/out) == dst // ceil(out/in)`` — true at the model's
      ~2x upsamples, e.g. 126->251, 65->129), ``repeat`` + ``slice``:
      pure data movement, no MXU pass, measured 34.2 -> 28.2 ms at the
      RTFS-4 B=128 hot shape (scripts/bench_micro_r4.py).
    - Strided-slice downsample when ``floor(dst*in/out) == dst*(in//out)``
      for every dst (e.g. 251->125): one strided slice — a strict subset
      of the reads the selection matmul would do.
    - Otherwise a dense 0/1-selection matmul — gathers along minor axes
      are a major bandwidth sink on TPU, while selection matmuls ride
      the MXU like the pooling path. ``Precision.HIGHEST`` is pinned:
      selection is semantically a copy, and the MXU's default bf16-ish
      operand rounding would perturb f32 values routed through it
      (measured 1.6e-2 max err on-chip at default precision).

    Round-5 negative result, recorded so it isn't retried: the remaining
    "2n+1" upsample maps (125->251, 64->129 from the kernel_size=4
    pyramid, 50->251 video->audio) profile at ~15% of serving device time
    as selection matmuls (fuse0/concat0 dots + their layout copies), and
    the run-length structure admits an exact 2-3-segment
    concat-of-repeated-slices lowering — but BOTH formulations measured
    SLOWER end-to-end than the matmul on v5e at B=128 (slice-a-shared-
    repeat: 317.0 utt/s; concat-of-repeats, applied to all upsamples:
    328.8; applied only to the non-prefix maps: 325.4; matmul baseline:
    335.0). Mid-axis concats materialize full passes and break XLA's
    elementwise fusion with the InjectionMultiSum consumer, costing more
    than the MXU pass they replace."""
    spatial = x.shape[2:]
    size = tuple(int(s) for s in size)
    assert len(size) == len(spatial)
    for d, (ins, outs) in enumerate(zip(spatial, size)):
        if ins == outs:
            continue
        idx = np.floor(np.arange(outs) * (ins / outs)).astype(np.int64)
        if outs > ins:
            k = -(-outs // ins)
            if (idx == np.arange(outs) // k).all():
                x = lax.slice_in_dim(jnp.repeat(x, k, axis=2 + d), 0, outs,
                                     axis=2 + d)
                continue
        else:
            s = ins // outs
            if (idx == s * np.arange(outs)).all():
                x = lax.slice_in_dim(x, 0, (outs - 1) * s + 1, stride=s,
                                     axis=2 + d)
                continue
        m = jnp.asarray(_nearest_matrix(ins, outs), x.dtype)
        x = jnp.moveaxis(jnp.tensordot(x, m, axes=([2 + d], [0]),
                                       precision=lax.Precision.HIGHEST),
                         -1, 2 + d)
    return x


def _pool_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Averaging matrix (in, out) implementing torch adaptive_avg_pool bins:
    bin i covers [floor(i*in/out), ceil((i+1)*in/out))."""
    m = np.zeros((in_size, out_size), np.float32)
    for i in range(out_size):
        lo = (i * in_size) // out_size
        hi = -(-((i + 1) * in_size) // out_size)
        m[lo:hi, i] = 1.0 / (hi - lo)
    return m


def adaptive_avg_pool(x: jnp.ndarray, output_size: Sequence[int]) -> jnp.ndarray:
    """torch ``F.adaptive_avg_pool{1,2}d`` on (B, C, *spatial), lowered to
    dense matmuls against precomputed bin-averaging matrices (MXU-friendly,
    exact for any size pair)."""
    spatial = x.shape[2:]
    output_size = tuple(int(s) for s in output_size)
    for d, (ins, outs) in enumerate(zip(spatial, output_size)):
        if ins == outs:
            continue
        m = jnp.asarray(_pool_matrix(ins, outs), x.dtype)
        # HIGHEST for the same reason as interpolate_nearest's selection
        # matmul: default MXU precision rounds f32 operands to bf16, which
        # perturbs what is semantically an exact bin average.
        x = jnp.moveaxis(jnp.tensordot(x, m, axes=([2 + d], [0]),
                                       precision=lax.Precision.HIGHEST),
                         -1, 2 + d)
    return x


def avg_pool(x: jnp.ndarray, kernel: Sequence[int], stride: Sequence[int] | None = None,
             ceil_mode: bool = False, count_include_pad: bool = True) -> jnp.ndarray:
    """torch ``F.avg_pool2d`` on (B, C, H, W)."""
    kernel = tuple(kernel)
    stride = tuple(stride) if stride is not None else kernel
    nd = len(kernel)
    spatial = x.shape[2:]
    pads = []
    for i, (s, k, st) in enumerate(zip(spatial, kernel, stride)):
        if ceil_mode:
            out = -(-(s - k) // st) + 1
            need = (out - 1) * st + k - s
            pads.append((0, max(0, need)))
        else:
            pads.append((0, 0))
    window = (1, 1) + kernel
    strides = (1, 1) + stride
    padding = ((0, 0), (0, 0)) + tuple(pads)
    summed = lax.reduce_window(x, 0.0, lax.add, window, strides, padding)
    if count_include_pad or not any(p[1] for p in pads):
        return summed / float(np.prod(kernel))
    ones = jnp.ones(x.shape[:1] + (1,) + x.shape[2:], x.dtype)
    counts = lax.reduce_window(ones, 0.0, lax.add, window, strides, padding)
    return summed / counts


def max_pool(x: jnp.ndarray, kernel: Sequence[int], stride: Sequence[int],
             padding: Sequence[int]) -> jnp.ndarray:
    """torch ``F.max_pool`` (symmetric padding with -inf) on (B, C, *s)."""
    nd = len(kernel)
    window = (1, 1) + tuple(kernel)
    strides = (1, 1) + tuple(stride)
    pads = ((0, 0), (0, 0)) + tuple((p, p) for p in padding)
    return lax.reduce_window(x, -jnp.inf, lax.max, window, strides, pads)


def unfold_1d(x: jnp.ndarray, kernel_size: int, stride: int = 1) -> jnp.ndarray:
    """torch ``nn.Unfold((k,1),stride=(s,1))`` on (B, C, T, 1) collapsed to
    (B, C, T): returns (B, C*k, L), C-major then kernel-position ordering
    (the DualPathRNN windowing, ``rnn_layers.py:97,141-148``)."""
    B, C, T = x.shape
    L = (T - kernel_size) // stride + 1
    taps = [x[:, :, j : j + (L - 1) * stride + 1 : stride] for j in range(kernel_size)]
    y = jnp.stack(taps, axis=2)  # (B, C, k, L)
    return y.reshape(B, C * kernel_size, L)


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm DropPath): zero the whole sample's
    residual branch with prob p and scale survivors by 1/(1-p)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))
