"""Differentiable Pallas SRU direction — forward AND backward kernels.

The inference backend (``sru_kernel_v3.py``) eliminated the scan path's
per-step HLO machinery for no-grad steps; this module does the same for
TRAINING: the SRU backward is itself an elementwise *reverse* recurrence

    dc_{t-1} = dc_t·f_t + da_t·v_f + dm_t·v_r

so it maps onto the identical batch-on-lanes kernel shape. ``custom_vjp``
wires a Pallas forward that additionally streams out the cell sequence
``c`` (needed by the backward) and a Pallas backward that produces
du0/du1/du2/dskip in one pass plus per-tile partial reductions for the
(v_f, v_r, b_f, b_r) gate grads (summed outside — they are (H,)-sized).

Cell semantics identical to ``ops.rnn._sru_direction_split`` (sru==2.6 v2,
reference ``src/models/layers/rnn_layers.py:99``):
    f_t = σ(u1_t + v_f⊙c_{t-1} + b_f)
    r_t = σ(u2_t + v_r⊙c_{t-1} + b_r)
    c_t = f_t⊙c_{t-1} + (1-f_t)⊙u0_t
    h_t = r_t⊙c_t + (1-r_t)⊙skip_t

Layout contract: all sequence operands are (L, H, B) — batch on lanes —
the orientation the v3 inference stack already uses. The fori_loop walks
L (the major dim); H=32 keeps sublane slices aligned.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(u0_ref, u1_ref, u2_ref, sk_ref, g_ref,
                h_ref, c_ref, *, reverse: bool):
    L, H, _ = u0_ref.shape
    vf = g_ref[0:H]
    vr = g_ref[H:2 * H]
    bf = g_ref[2 * H:3 * H]
    br = g_ref[3 * H:4 * H]

    def step(i, c):
        t = (L - 1 - i) if reverse else i
        u0 = u0_ref[t].astype(jnp.float32)
        u1 = u1_ref[t].astype(jnp.float32)
        u2 = u2_ref[t].astype(jnp.float32)
        sk = sk_ref[t].astype(jnp.float32)
        f = jax.nn.sigmoid(u1 + vf * c + bf)
        r = jax.nn.sigmoid(u2 + vr * c + br)
        c_new = f * c + (1.0 - f) * u0
        h_ref[t] = (r * c_new + (1.0 - r) * sk).astype(h_ref.dtype)
        c_ref[t] = c_new.astype(c_ref.dtype)
        return c_new

    lax.fori_loop(0, L, step, jnp.zeros((H, u0_ref.shape[2]), jnp.float32))


def _bwd_kernel(u0_ref, u1_ref, u2_ref, sk_ref, c_ref, g_ref, dh_ref,
                du0_ref, du1_ref, du2_ref, dsk_ref, dg_ref, *,
                reverse: bool):
    """Reverse-order sweep. For the forward direction this walks t = L-1..0
    (carrying dc backwards); for a reversed direction it walks t = 0..L-1.
    Gate/bias grads accumulate per-lane in f32 and are written as per-tile
    partials (summed to (H,) outside)."""
    L, H, B = u0_ref.shape
    vf = g_ref[0:H]
    vr = g_ref[H:2 * H]
    bf = g_ref[2 * H:3 * H]
    br = g_ref[3 * H:4 * H]

    def step(i, carry):
        dc, dvf, dvr, dbf, dbr = carry
        # iterate in reverse-time of the direction's forward order
        t = i if reverse else (L - 1 - i)
        t_prev_valid = (i < L - 1)
        # c_{t-1}: 0 at the direction's first step
        cp_t = (t + 1) if reverse else (t - 1)
        c_prev = jnp.where(
            t_prev_valid,
            c_ref[jnp.clip(cp_t, 0, L - 1)].astype(jnp.float32),
            jnp.zeros((H, B), jnp.float32))
        c_t = c_ref[t].astype(jnp.float32)
        u0 = u0_ref[t].astype(jnp.float32)
        u1 = u1_ref[t].astype(jnp.float32)
        u2 = u2_ref[t].astype(jnp.float32)
        sk = sk_ref[t].astype(jnp.float32)
        dh = dh_ref[t].astype(jnp.float32)

        f = jax.nn.sigmoid(u1 + vf * c_prev + bf)
        r = jax.nn.sigmoid(u2 + vr * c_prev + br)

        dr = dh * (c_t - sk)
        dm = dr * r * (1.0 - r)
        dct = dh * r + dc
        df = dct * (c_prev - u0)
        da = df * f * (1.0 - f)

        du0_ref[t] = (dct * (1.0 - f)).astype(du0_ref.dtype)
        du1_ref[t] = da.astype(du1_ref.dtype)
        du2_ref[t] = dm.astype(du2_ref.dtype)
        dsk_ref[t] = (dh * (1.0 - r)).astype(dsk_ref.dtype)

        dvf = dvf + da * c_prev
        dvr = dvr + dm * c_prev
        dbf = dbf + da
        dbr = dbr + dm
        dc_next = dct * f + da * vf + dm * vr
        return dc_next, dvf, dvr, dbf, dbr

    z = jnp.zeros((H, B), jnp.float32)
    _, dvf, dvr, dbf, dbr = lax.fori_loop(0, L, step, (z, z, z, z, z))
    dg_ref[0, 0] = dvf
    dg_ref[0, 1] = dvr
    dg_ref[0, 2] = dbf
    dg_ref[0, 3] = dbr


def _vmem_tile(L: int, H: int, B: int, itemsize: int, n_bufs: int) -> int:
    # only tiles that divide B: grid=(B // tile,) covers every batch
    # column iff tile | B (a 256 tile on B=384 would silently skip the
    # last 128 columns)
    tiles = [t for t in (256, 128) if t <= B and B % t == 0] or [B]
    for tile in tiles:
        if n_bufs * L * H * tile * itemsize * 2 + 6 * H * tile * 4 < 13e6:
            return tile
    return 0


def sru_train_supported(L: int, B: int, H: int, itemsize: int) -> bool:
    # backward streams 11 (L, H, tile) buffers — the binding case
    return (H % 8 == 0 and B >= 128 and B % 128 == 0
            and _vmem_tile(L, H, B, itemsize, 11) > 0)


def _gates(v_f, v_r, b_f, b_r):
    return jnp.concatenate([
        v_f.astype(jnp.float32), v_r.astype(jnp.float32),
        b_f.astype(jnp.float32), b_r.astype(jnp.float32),
    ]).reshape(-1, 1)


def _fwd_call(u0, u1, u2, sk, gates, reverse, interpret):
    L, H, B = u0.shape
    tile = _vmem_tile(L, H, B, u0.dtype.itemsize, 11) or 128
    assert B % tile == 0, (B, tile)

    def bspec():
        return pl.BlockSpec((L, H, tile), lambda i: (0, 0, i),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_fwd_kernel, reverse=reverse),
        grid=(B // tile,),
        in_specs=[bspec()] * 4 + [
            pl.BlockSpec((4 * H, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=[bspec(), bspec()],
        out_shape=[jax.ShapeDtypeStruct((L, H, B), u0.dtype),
                   jax.ShapeDtypeStruct((L, H, B), u0.dtype)],
        interpret=interpret,
    )(u0, u1, u2, sk, gates)


def _bwd_call(u0, u1, u2, sk, c, gates, dh, reverse, interpret):
    L, H, B = u0.shape
    tile = _vmem_tile(L, H, B, u0.dtype.itemsize, 11) or 128
    assert B % tile == 0, (B, tile)
    n_tiles = B // tile

    def bspec():
        return pl.BlockSpec((L, H, tile), lambda i: (0, 0, i),
                            memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, reverse=reverse),
        grid=(n_tiles,),
        in_specs=[bspec()] * 5 + [
            pl.BlockSpec((4 * H, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            bspec()],
        out_specs=[bspec(), bspec(), bspec(), bspec(),
                   pl.BlockSpec((1, 4, H, tile), lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((L, H, B), u0.dtype)] * 4 + [
            jax.ShapeDtypeStruct((n_tiles, 4, H, tile), jnp.float32)],
        interpret=interpret,
    )(u0, u1, u2, sk, c, gates, dh)
    du0, du1, du2, dsk, dg = outs
    dg = dg.sum(axis=(0, 3))  # (4, H)
    return du0, du1, du2, dsk, dg[0], dg[1], dg[2], dg[3]


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def sru_direction_train(u0, u1, u2, sk, v_f, v_r, b_f, b_r,
                        reverse: bool = False, interpret: bool = False):
    """One differentiable SRU direction on (L, H, B) operands."""
    h, _ = _fwd_call(u0, u1, u2, sk, _gates(v_f, v_r, b_f, b_r),
                     reverse, interpret)
    return h


def _train_fwd(u0, u1, u2, sk, v_f, v_r, b_f, b_r, reverse, interpret):
    gates = _gates(v_f, v_r, b_f, b_r)
    h, c = _fwd_call(u0, u1, u2, sk, gates, reverse, interpret)
    return h, (u0, u1, u2, sk, c, v_f, v_r, b_f, b_r)


def _train_bwd(reverse, interpret, res, dh):
    u0, u1, u2, sk, c, v_f, v_r, b_f, b_r = res
    du0, du1, du2, dsk, dvf, dvr, dbf, dbr = _bwd_call(
        u0, u1, u2, sk, c, _gates(v_f, v_r, b_f, b_r), dh,
        reverse, interpret)
    return (du0, du1, du2, dsk,
            dvf.astype(v_f.dtype), dvr.astype(v_r.dtype),
            dbf.astype(b_f.dtype), dbr.astype(b_r.dtype))


sru_direction_train.defvjp(_train_fwd, _train_bwd)
