"""Pallas TPU kernel for stride-1 2-D depthwise convolutions.

The reference leans on cuDNN for its depthwise "same" convs (every
``ConvNormAct(groups=C)`` site — pyramid level 0, InjectionMultiSum local
embeddings; reference ``src/models/layers/conv_layers.py:65-139``). On TPU,
XLA's grouped-conv lowering moves these at ~244 GB/s (measured isolated at
the serving hot shape (128, 64, 251, 129) bf16 — 4.35 ms against a ~1.5 ms
roofline), and a shift-and-add formulation is worse (XLA loop fusions
re-read the input once per tap). A k×k stencil wants each input tile read
ONCE into VMEM — exactly a Pallas kernel.

Layout: the kernel consumes the *logical* transpose (C, T, F, B) of the
model's (B, C, T, F) activations. XLA already assigns B-minor physical
layouts to these tensors at serving batch (the HLO shows
``{0,3,2,1:T(8,128)}`` — B=128 is a perfect lane fit), so the boundary
transposes are layout-compatible bitcasts, not data movement.

Grid: (C, ceil(T / T_tile)). Each step reads its (T_tile, F, B) chunk plus
two halo row-blocks from the neighbouring chunks (bytes ≈ 1.1× ideal,
versus 3× if the halo were fetched as whole chunks), masks rows by their
*global* T index (one mask handles the left edge, the right edge, and the
partial last chunk — clamped halo index maps deliver garbage rows exactly
where the mask already writes zeros), zero-pads F in VMEM, and accumulates
the k_t × k_f taps in f32.

Gradients: ``custom_vjp`` — the backward is expressed with
``lax.conv_general_dilated`` (dx: flipped-kernel conv; dw: batch-reduced
correlation), so training keeps XLA's well-tested conv grads and this
kernel only has to be fast, not differentiable.
"""
from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dw_kernel(x_ref, prev_ref, next_ref, w_ref, out_ref, *,
               T: int, T_tile: int, lo_t: int, hi_t: int,
               lo_f: int, hi_f: int, k_t: int, k_f: int):
    F = x_ref.shape[2]
    B = x_ref.shape[3]
    c = pl.program_id(0)
    t_blk = pl.program_id(1)
    base = t_blk * T_tile

    parts = []
    if lo_t:
        parts.append(prev_ref[0])
    parts.append(x_ref[0])
    if hi_t:
        parts.append(next_ref[0])
    ext = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
    # one validity mask over global row index: kills the clamped-halo rows
    # at both edges AND the out-of-bounds tail of the partial last chunk
    rows = base - lo_t + lax.broadcasted_iota(jnp.int32, (T_tile + lo_t + hi_t, 1, 1), 0)
    ext = jnp.where((rows >= 0) & (rows < T), ext, jnp.zeros((), ext.dtype))

    if lo_f or hi_f:
        zlo = jnp.zeros((ext.shape[0], lo_f, B), ext.dtype)
        zhi = jnp.zeros((ext.shape[0], hi_f, B), ext.dtype)
        ext = jnp.concatenate([zlo, ext, zhi], axis=1)

    acc = None
    for dt in range(k_t):
        for df in range(k_f):
            tap = ext[dt:dt + T_tile, df:df + F, :].astype(jnp.float32)
            term = tap * w_ref[c, dt * k_f + df]
            acc = term if acc is None else acc + term
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.lru_cache(maxsize=None)
def _build_call(C: int, T: int, F: int, B: int, k_t: int, k_f: int,
                lo_t: int, hi_t: int, lo_f: int, hi_f: int, dtype_name: str,
                interpret: bool):
    dtype = jnp.dtype(dtype_name)
    # VMEM budget (16 MB scoped): in + out blocks double-buffered plus the
    # f32 acc/tap temporaries — at F=129, B=128 a T-row costs 64.5 KB bf16 /
    # 129 KB f32, so 32 rows keeps in+out+2×f32-temps ≈ 10 MB
    T_tile = 32 if dtype.itemsize <= 2 else 16
    T_tile = min(T_tile, T)
    # halo blocks tile the T axis in lo_t/hi_t-row blocks: T_tile must be a
    # multiple of both so the halo block index maps stay integral
    m = math.lcm(max(lo_t, 1), max(hi_t, 1))
    T_tile = max(m, (T_tile // m) * m)
    n_t = pl.cdiv(T, T_tile)

    def idx_cur(c, t):
        return (c, t, 0, 0)

    n_prev = pl.cdiv(T, lo_t) if lo_t else 1
    n_next = pl.cdiv(T, hi_t) if hi_t else 1

    def idx_prev(c, t):
        # rows [t*T_tile - lo_t, t*T_tile): block index clamped at the left
        # edge — the garbage rows are masked by the global-row check
        return (c, jnp.maximum(t * (T_tile // lo_t) - 1, 0), 0, 0)

    def idx_next(c, t):
        return (c, jnp.minimum(t * (T_tile // hi_t) + (T_tile // hi_t), n_next - 1), 0, 0)

    in_specs = [pl.BlockSpec((1, T_tile, F, B), idx_cur, memory_space=pltpu.VMEM)]
    in_specs.append(
        pl.BlockSpec((1, lo_t, F, B), idx_prev, memory_space=pltpu.VMEM)
        if lo_t else
        pl.BlockSpec((1, 1, 1, 1), lambda c, t: (0, 0, 0, 0), memory_space=pltpu.VMEM))
    in_specs.append(
        pl.BlockSpec((1, hi_t, F, B), idx_next, memory_space=pltpu.VMEM)
        if hi_t else
        pl.BlockSpec((1, 1, 1, 1), lambda c, t: (0, 0, 0, 0), memory_space=pltpu.VMEM))
    # whole weight table in SMEM (Mosaic requires SMEM blocks to cover the
    # full array); the kernel indexes its channel's row by program_id(0)
    in_specs.append(pl.BlockSpec((C, k_t * k_f), lambda c, t: (0, 0),
                                 memory_space=pltpu.SMEM))

    kernel = functools.partial(
        _dw_kernel, T=T, T_tile=T_tile, lo_t=lo_t, hi_t=hi_t,
        lo_f=lo_f, hi_f=hi_f, k_t=k_t, k_f=k_f)

    flops = 2 * C * T * F * B * k_t * k_f
    bytes_accessed = 2 * C * T * F * B * dtype.itemsize

    return pl.pallas_call(
        kernel,
        grid=(C, n_t),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, T_tile, F, B), idx_cur, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, T, F, B), dtype),
        cost_estimate=pl.CostEstimate(flops=flops, bytes_accessed=bytes_accessed,
                                      transcendentals=0),
        interpret=interpret,
    )


def _dw_conv2d_same_fwd_impl(x, w, pads: Tuple[Tuple[int, int], Tuple[int, int]]):
    """x: (B, C, T, F); w: (C, 1, k_t, k_f); stride-1 torch-'same' padding."""
    B, C, T, F = x.shape
    k_t, k_f = w.shape[2], w.shape[3]
    (lo_t, hi_t), (lo_f, hi_f) = pads
    xk = x.transpose(1, 2, 3, 0)  # bitcast when the producer is B-minor
    wk = w.reshape(C, k_t * k_f).astype(jnp.float32)
    call = _build_call(C, T, F, B, k_t, k_f, lo_t, hi_t, lo_f, hi_f,
                       str(x.dtype), jax.default_backend() != "tpu")
    yk = call(xk, xk, xk, wk)
    return yk.transpose(3, 0, 1, 2)


def _lax_dw_conv(x, w, pads):
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NCHW", "OIHW", "NCHW"))
    return lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), pads, dimension_numbers=dn,
        feature_group_count=x.shape[1],
        preferred_element_type=jnp.float32 if x.dtype == jnp.float32 else None,
    ).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def dw_conv2d_same(x, w, pads):
    return _dw_conv2d_same_fwd_impl(x, w, pads)


def _fwd(x, w, pads):
    return dw_conv2d_same(x, w, pads), (x, w)


def _bwd(pads, res, dy):
    x, w = res
    B, C, T, F = x.shape
    k_t, k_f = w.shape[2], w.shape[3]
    (lo_t, hi_t), (lo_f, hi_f) = pads
    # dx: correlate dy with the flipped kernel under the transposed padding
    w_flip = jnp.flip(w, axis=(2, 3))
    dx_pads = ((k_t - 1 - lo_t, k_t - 1 - hi_t), (k_f - 1 - lo_f, k_f - 1 - hi_f))
    dn = lax.conv_dimension_numbers(dy.shape, w_flip.shape, ("NCHW", "OIHW", "NCHW"))
    dx = lax.conv_general_dilated(
        dy, w_flip.astype(dy.dtype), (1, 1), dx_pads, dimension_numbers=dn,
        feature_group_count=C,
        preferred_element_type=jnp.float32 if dy.dtype == jnp.float32 else None,
    ).astype(x.dtype)
    # dw[c, 0, dt, df] = sum_{b,t,f} x[b,c,t+dt-lo_t, f+df-lo_f]*dy[b,c,t,f]:
    # per-channel correlation with dy as the (T, F)-sized kernel and B as
    # the contracted feature dim; vmapped over channels
    def per_channel(xc, dyc):  # (B, T, F) each
        out = lax.conv_general_dilated(
            xc[None].astype(jnp.float32), dyc[None].astype(jnp.float32),
            window_strides=(1, 1), padding=((lo_t, hi_t), (lo_f, hi_f)),
            dimension_numbers=lax.conv_dimension_numbers(
                (1, B, T, F), (1, B, T, F), ("NCHW", "OIHW", "NCHW")),
            preferred_element_type=jnp.float32,
        )
        return out[0, 0]  # (k_t, k_f)

    dw = jax.vmap(per_channel)(x.transpose(1, 0, 2, 3),
                               dy.transpose(1, 0, 2, 3))[:, None]
    return dx, dw.astype(w.dtype)


dw_conv2d_same.defvjp(_fwd, _bwd)


def pallas_dw_supported(x_shape, kernel, stride, dilation, groups,
                        in_chan, out_chan, ndim, pads=None) -> bool:
    """Static gate: pure stride-1, dilation-1, shape-preserving 2-D
    depthwise convs with a lane-filling batch (the kernel puts B on lanes;
    small batches would waste 128-wide registers — XLA's conv is fine at
    those sizes)."""
    if ndim != 2 or groups != in_chan or out_chan != in_chan:
        return False
    if any(s != 1 for s in stride) or any(d != 1 for d in dilation):
        return False
    if any(k <= 1 for k in kernel):
        return False
    if pads is not None:
        # the kernel writes a same-sized output: lo+hi must equal k-1
        if any(lo + hi != k - 1 for (lo, hi), k in zip(pads, kernel)):
            return False
        # halo blocks must fit beside the main tile
        if any(lo < 0 or hi < 0 or max(lo, hi) > 8 for lo, hi in pads):
            return False
    B, C, T, F = x_shape
    if B < 64 or B % 8 != 0:
        return False
    if T < max(kernel) or F < max(kernel):
        return False
    # VMEM sanity: one (T_tile, F, B) chunk in+out plus f32 taps
    t_tile = 64 if B * F * 2 * 64 < 6e6 else 32
    if B * F * t_tile * 4 * 3 > 14e6:
        return False
    return True
