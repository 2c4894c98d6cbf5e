"""Pallas TPU kernel v2 for the SRU elementwise recurrence — batch on lanes.

The round-1 kernel (``sru_kernel.py``) streamed ``(L, B_tile, H)`` blocks
with H=32 on lanes: 4× lane padding (32→128) and a tiny batch tile, so it
lost to ``lax.scan`` by ~20%. At serving shapes the folded batch is large
(B·T ≈ 16k at B=128), and the scan path's cost is almost entirely
while-loop data movement: per-step ``slice``/``squeeze``/``transpose`` HLO
ops were measured at ~75% of DualPathRNN time (scripts/profile_hlo.py),
7× the HBM roofline of the streamed bytes.

v2 lays the recurrence out as ``(L, H, B')`` — the folded batch on lanes
(128-aligned by construction at serving batches), H=32 on sublanes (8-
aligned), L the loop axis. One grid program per batch tile holds all five
``(L, H, 128)`` buffers in VMEM (~2.4 MB bf16 at L=119) and runs the
whole direction as a ``fori_loop`` — no per-step HLO machinery at all;
DMA streams each tile once.

Gradient support: none by design. The kernel is an inference backend
(``ops.rnn`` routes to it only for the no-grad step kind); training keeps
the differentiable ``lax.scan`` path.

Semantics identical to ``ops.rnn._sru_direction_split`` (sru==2.6 v2
cell, reference ``src/models/layers/rnn_layers.py:99``):
  f_t = σ(u1_t + v_f⊙c_{t-1} + b_f)
  r_t = σ(u2_t + v_r⊙c_{t-1} + b_r)
  c_t = f_t⊙c_{t-1} + (1-f_t)⊙u0_t
  h_t = r_t⊙c_t + (1-r_t)⊙skip_t
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(u0_ref, u1_ref, u2_ref, skip_ref, g_ref, out_ref, *,
            reverse: bool, H: int):
    L = u0_ref.shape[0]
    # per-feature gate params broadcast over lanes: (H, 1) f32 in VMEM
    vf = g_ref[0:H]
    vr = g_ref[H:2 * H]
    bf = g_ref[2 * H:3 * H]
    br = g_ref[3 * H:4 * H]

    def step(i, c):
        t = (L - 1 - i) if reverse else i
        u0 = u0_ref[t].astype(jnp.float32)
        u1 = u1_ref[t].astype(jnp.float32)
        u2 = u2_ref[t].astype(jnp.float32)
        sk = skip_ref[t].astype(jnp.float32)
        f = jax.nn.sigmoid(u1 + vf * c + bf)
        r = jax.nn.sigmoid(u2 + vr * c + br)  # r-gate sees c_{t-1}
        c = f * c + (1.0 - f) * u0
        out_ref[t] = (r * c + (1.0 - r) * sk).astype(out_ref.dtype)
        return c

    c0 = jnp.zeros(u0_ref.shape[1:], jnp.float32)
    lax.fori_loop(0, L, step, c0)


def _pick_tile(L: int, H: int, itemsize: int) -> int:
    """Largest lane tile whose five (L, H, tile) buffers double-buffer
    within the ~16 MB VMEM budget. 256 lanes measured ~20% faster than
    128 at the serving shapes (fewer grid programs, same stream)."""
    for tile in (256, 128):
        per_buf = L * H * tile * itemsize
        if 5 * per_buf * 2 + L * H * tile * 4 < 13e6:
            return tile
    return 0


def sru_v2_vmem_ok(L: int, B: int, H: int, itemsize: int) -> bool:
    """Gate: H sublane-aligned, batch big enough to fill lanes, and the
    buffers must fit VMEM at some tile size."""
    return (H % 8 == 0 and B >= 128
            and _pick_tile(L, H, itemsize) > 0)


@functools.partial(jax.jit, static_argnames=("reverse", "interpret"))
def sru_direction_lanes(u0, u1, u2, skip, v_f, v_r, b_f, b_r,
                        reverse: bool = False, interpret: bool = False):
    """One SRU direction with batch-on-lanes blocking.

    u0/u1/u2/skip: (L, B, H) — transposed internally to (L, H, B), batch
    padded up to the lane tile; gates: (H,). Returns h: (L, B, H).
    """
    L, B_orig, H = u0.shape
    B_tile = _pick_tile(L, H, u0.dtype.itemsize) or 128
    B = -(-B_orig // B_tile) * B_tile
    tu = [x.transpose(0, 2, 1) for x in (u0, u1, u2, skip)]  # (L, H, B)
    if B != B_orig:
        tu = [jnp.pad(x, ((0, 0), (0, 0), (0, B - B_orig))) for x in tu]
    gates = jnp.concatenate([
        v_f.astype(jnp.float32), v_r.astype(jnp.float32),
        b_f.astype(jnp.float32), b_r.astype(jnp.float32),
    ]).reshape(4 * H, 1)

    def bspec():
        return pl.BlockSpec((L, H, B_tile), lambda i: (0, 0, i),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel, reverse=reverse, H=H),
        grid=(B // B_tile,),
        in_specs=[bspec(), bspec(), bspec(), bspec(),
                  pl.BlockSpec((4 * H, 1), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=bspec(),
        out_shape=jax.ShapeDtypeStruct((L, H, B), u0.dtype),
        interpret=interpret,
    )(*tu, gates)
    h = out.transpose(0, 2, 1)
    return h[:, :B_orig] if B != B_orig else h
