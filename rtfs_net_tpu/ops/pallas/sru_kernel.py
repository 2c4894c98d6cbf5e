"""Pallas TPU kernel for the SRU elementwise recurrence.

The SRU splits into a time-parallel input projection (MXU matmul, done
outside) and a sequential elementwise recurrence. ``lax.scan`` compiles
that into an XLA while-loop whose per-step launches cost more than the
arithmetic at these sizes ((B·F folded batch, H=32) per step). This kernel
runs the whole (forward or backward) direction as ONE Pallas program with
the carry ``c`` held in VMEM and a ``fori_loop`` over time — no per-step
HLO loop machinery, inputs streamed through VMEM blocks.

Grid: tiles over the folded batch; each program owns (L, B_tile, H) slices
of u0/u1/u2/skip and writes the same-shaped h output. VMEM budget at the
RTFS shapes (L≈118, B_tile=256, H=32): 5 buffers ≈ 19 MB f32 -> B_tile
chosen so the five (L, B_tile, H) buffers fit in ~12 MB.

Semantics identical to ``ops.rnn._sru_direction`` (sru==2.6 v2 cell):
  f_t = σ(u1_t + v_f⊙c_{t-1} + b_f)
  c_t = f_t⊙c_{t-1} + (1-f_t)⊙u0_t
  r_t = σ(u2_t + v_r⊙c_{t-1} + b_r)
  h_t = r_t⊙c_t + (1-r_t)⊙skip_t
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sru_dir_kernel(u0_ref, u1_ref, u2_ref, skip_ref,
                    vf_ref, vr_ref, bf_ref, br_ref,
                    out_ref, *, reverse: bool):
    L = u0_ref.shape[0]
    # recurrence in f32 regardless of the streamed dtype (stability + works
    # around a Mosaic bf16 broadcast verifier issue); DMA stays in the
    # input dtype
    vf = vf_ref[0].astype(jnp.float32)
    vr = vr_ref[0].astype(jnp.float32)
    bf = bf_ref[0].astype(jnp.float32)
    br = br_ref[0].astype(jnp.float32)

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


@functools.partial(jax.jit, static_argnames=("reverse", "interpret"))
def sru_direction_pallas(u0, u1, u2, skip, v_f, v_r, b_f, b_r,
                         reverse: bool = False, interpret: bool = False):
    """One SRU direction. u0/u1/u2/skip: (L, B, H); gates v/b: (H,).
    Returns h: (L, B, H)."""
    L, B, H = u0.shape
    # tile the folded batch so 5 (L, Bt, H) buffer sets fit VMEM; account
    # for (a) pipelining double-buffering and (b) lane padding of the
    # minor dim H up to 128. Mosaic requires the sublane dim (Bt) to be a
    # multiple of 8, so pad B up and tile in multiples of 8.
    h_padded = max(H, 128)
    budget = (3 * 1024 * 1024) // (5 * L * h_padded * 4)
    sub = 8 if u0.dtype == jnp.float32 else 16  # sublane granularity
    B_tile = max(sub, min(B, budget)) // sub * sub
    B_pad = -(-B // B_tile) * B_tile
    if B_pad != B:
        pad = ((0, 0), (0, B_pad - B), (0, 0))
        u0 = jnp.pad(u0, pad)
        u1 = jnp.pad(u1, pad)
        u2 = jnp.pad(u2, pad)
        skip = jnp.pad(skip, pad)
    grid = (B_pad // B_tile,)

    def bspec():
        return pl.BlockSpec((L, B_tile, H), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    gate_spec = pl.BlockSpec((1, H), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)

    kernel = functools.partial(_sru_dir_kernel, reverse=reverse)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[bspec(), bspec(), bspec(), bspec(),
                  gate_spec, gate_spec, gate_spec, gate_spec],
        out_specs=bspec(),
        out_shape=jax.ShapeDtypeStruct((L, B_pad, H), u0.dtype),
        interpret=interpret,
    )(u0, u1, u2, skip,
      v_f.reshape(1, H), v_r.reshape(1, H),
      b_f.reshape(1, H), b_r.reshape(1, H))
    return out[:, :B] if B_pad != B else out
