"""Pallas TPU SRU backend v3 — whole-stack (L, C, B) orientation.

v2 (a per-direction kernel fed from the model's layout; measured, then
deleted — see DESIGN.md) proved the batch-on-lanes recurrence kernel
beats the unrolled ``lax.scan`` per direction, but feeding it from the
model's (L, B, C) sequence layout cost more than it saved: the
(L,B,C)→(L,H,B) boundary transposes (~42 ms) and batch padding (~18 ms)
showed up as top rows in the serving HLO profile.

v3 keeps the ENTIRE multi-layer SRU in (L, channels, B) orientation:

* the input projections are 1×1 convs with permuted dimension numbers
  (``('HCN','OIH','HCN')``) that emit (L, k·O, B) directly — XLA lowers
  them onto the MXU without boundary transposes (measured faster than
  dot + transpose pair);
* ONE kernel call per layer runs BOTH directions (two ``fori_loop``s over
  the same VMEM-resident block) and writes the (L, O, B) output that the
  next layer's conv consumes as-is;
* chunk/direction selection is static sublane slicing (H=32 keeps every
  offset 8-aligned), so no per-step slice/squeeze HLO machinery exists at
  all — that machinery was ~75% of DualPathRNN serving time.

The only transpose left is one (L, O, B) → (L, B, O) at the very end of
the stack.

Gradients: none by design — inference backend only (``ops.rnn`` routes
here for the no-grad step kind; training keeps the differentiable scan).

Semantics identical to ``ops.rnn._sru_direction_split`` (sru==2.6 v2
cell, reference ``src/models/layers/rnn_layers.py:99``).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(u_ref, skip_ref, g_ref, out_ref, *,
            H: int, O: int, k: int, ndir: int, skip_from_u: bool):
    L = u_ref.shape[0]
    for d in range(ndir):
        off = d * 4 * H
        vf = g_ref[off:off + H]
        vr = g_ref[off + H:off + 2 * H]
        bf = g_ref[off + 2 * H:off + 3 * H]
        br = g_ref[off + 3 * H:off + 4 * H]
        reverse = d == 1

        def step(i, c, d=d, vf=vf, vr=vr, bf=bf, br=br, reverse=reverse):
            t = (L - 1 - i) if reverse else i
            s = d * H
            u0 = u_ref[t, s:s + H, :].astype(jnp.float32)
            u1 = u_ref[t, O + s:O + s + H, :].astype(jnp.float32)
            u2 = u_ref[t, 2 * O + s:2 * O + s + H, :].astype(jnp.float32)
            if skip_from_u:
                sk = u_ref[t, 3 * O + s:3 * O + s + H, :].astype(jnp.float32)
            else:
                sk = skip_ref[t, s:s + H, :].astype(jnp.float32)
            f = jax.nn.sigmoid(u1 + vf * c + bf)
            r = jax.nn.sigmoid(u2 + vr * c + br)  # r-gate sees c_{t-1}
            c = f * c + (1.0 - f) * u0
            out_ref[t, s:s + H, :] = (r * c + (1.0 - r) * sk).astype(out_ref.dtype)
            return c

        c0 = jnp.zeros((H, u_ref.shape[2]), jnp.float32)
        lax.fori_loop(0, L, step, c0)


def _pick_tile(L: int, k: int, O: int, B: int, itemsize: int) -> int:
    """Largest lane tile whose (u, skip, out) blocks double-buffer within
    the ~16 MB VMEM budget. Mosaic requires the lane block dim to be a
    multiple of 128 or exactly the array dim, so sub-128 tiles are only
    legal when they cover all of B. k==4 streams no skip block (the 4th
    u chunk IS the highway; the kernel gets a (1,1,1) placeholder)."""
    n_chan = k * O + O + (O if k == 3 else 0)  # u + out (+ skip iff k==3)
    tiles = (256, 128) if B >= 128 else (B,)
    for tile in tiles:
        bufs = n_chan * L * tile * itemsize
        if bufs * 2 + 4 * O * tile * 4 < 13e6:
            return tile
    return 0


def _pick_chunk(k: int, O: int, B: int, itemsize: int):
    """(L_chunk, B_tile) for the carry-chunked per-direction path: one
    (Lc, k·O + H + H) block set per call, plus the (H, tile) carries."""
    n_chan = k * O + O + (O if k == 3 else 0)  # u + out (+ skip iff k==3)
    for tile in ((256, 128) if B >= 128 else (B,)):
        per_row = n_chan * tile * itemsize
        lc = int(10e6 / (2 * per_row)) // 8 * 8
        if lc >= 32:
            return lc, tile
    return 0, 0


def sru_v3_supported(L: int, B: int, H: int, k: int, ndir: int,
                     itemsize: int) -> bool:
    if H % 8 != 0 or B < 8:
        return False
    O = H * ndir
    if _pick_tile(L, k, O, B, itemsize) > 0:
        return True
    return _pick_chunk(k, O, B, itemsize)[0] > 0


def _kernel_chunk(u_ref, skip_ref, g_ref, cin_ref, out_ref, cout_ref, *,
                  H: int, O: int, d: int, n_valid: int, reverse: bool,
                  skip_from_u: bool):
    """One direction over one L-chunk, carry in/out — the VMEM-tight path
    (long L: RTFS-6/12 time-axis recurrences)."""
    vf = g_ref[0:H]
    vr = g_ref[H:2 * H]
    bf = g_ref[2 * H:3 * H]
    br = g_ref[3 * H:4 * H]
    s = d * H

    def step(i, c):
        t = (n_valid - 1 - i) if reverse else i
        u0 = u_ref[t, s:s + H, :].astype(jnp.float32)
        u1 = u_ref[t, O + s:O + s + H, :].astype(jnp.float32)
        u2 = u_ref[t, 2 * O + s:2 * O + s + H, :].astype(jnp.float32)
        if skip_from_u:
            sk = u_ref[t, 3 * O + s:3 * O + s + H, :].astype(jnp.float32)
        else:
            sk = skip_ref[t, s:s + H, :].astype(jnp.float32)
        f = jax.nn.sigmoid(u1 + vf * c + bf)
        r = jax.nn.sigmoid(u2 + vr * c + br)
        c = f * c + (1.0 - f) * u0
        out_ref[t, :, :] = (r * c + (1.0 - r) * sk).astype(out_ref.dtype)
        return c

    cout_ref[...] = lax.fori_loop(0, n_valid, step, cin_ref[...])


def _chunked_direction(u, skip, gates_d, *, H, O, k, d, L, B, Lc, B_tile,
                       skip_from_u, interpret):
    """Run one direction as ceil(L/Lc) carry-chained pallas calls; the
    chunk offset lives in the block index maps, so the big (L, k·O, B)
    array is never sliced or copied."""
    n_chunks = -(-L // Lc)
    reverse = d == 1
    order = range(n_chunks - 1, -1, -1) if reverse else range(n_chunks)
    c = jnp.zeros((H, B), jnp.float32)
    outs = [None] * n_chunks
    skip_spec = (
        # k==4: the kernel never reads skip — a (1,1,1) placeholder block
        # avoids DMA-ing an unread (Lc, O, B_tile) stream per chunk
        pl.BlockSpec((1, 1, 1), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM)
        if skip_from_u else
        None)
    for ci in order:
        n_valid = min(Lc, L - ci * Lc)
        call = pl.pallas_call(
            functools.partial(_kernel_chunk, H=H, O=O, d=d,
                              n_valid=n_valid, reverse=reverse,
                              skip_from_u=skip_from_u),
            grid=(B // B_tile,),
            in_specs=[
                pl.BlockSpec((Lc, k * O, B_tile),
                             lambda i, ci=ci: (ci, 0, i),
                             memory_space=pltpu.VMEM),
                skip_spec or
                pl.BlockSpec((Lc, O, B_tile),
                             lambda i, ci=ci: (ci, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4 * H, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((H, B_tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((Lc, H, B_tile), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((H, B_tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((Lc, H, B), u.dtype),
                jax.ShapeDtypeStruct((H, B), jnp.float32),
            ],
            interpret=interpret,
        )
        h_chunk, c = call(u, skip, gates_d, c)
        outs[ci] = h_chunk[:n_valid]
    return jnp.concatenate(outs, axis=0) if n_chunks > 1 else outs[0]


@functools.partial(jax.jit,
                   static_argnames=("H", "k", "ndir", "interpret"))
def sru_stack_layer(u, skip, v, b, *, H: int, k: int, ndir: int,
                    interpret: bool = False):
    """One SRU layer, both directions fused.

    u: (L, k·O, B) projected inputs in channel-major orientation
    (chunk-major: columns ``c*O + d*H + h``); skip: (L, O, B) highway
    input for the k==3 case (ignored when k==4 — the 4th chunk is the
    highway); v, b: the module's (2·O,) gate params. Returns (L, O, B).
    """
    L, KO, B = u.shape
    O = H * ndir
    assert KO == k * O
    skip_from_u = k == 4
    if skip_from_u:
        # the kernel never reads skip when k==4 (the 4th u chunk is the
        # highway): a (1,1,1) placeholder avoids materializing/streaming
        # an unread (L, O, B) array on the hot path
        skip = jnp.zeros((1, 1, 1), u.dtype)
    assert skip is not None

    gs = []
    for d in range(ndir):
        sl = slice(d * H, (d + 1) * H)
        gs += [v[:O][sl], v[O:2 * O][sl], b[:O][sl], b[O:2 * O][sl]]
    gates = jnp.concatenate([g.astype(jnp.float32) for g in gs]).reshape(-1, 1)

    B_tile = _pick_tile(L, k, O, B, u.dtype.itemsize)
    if B_tile == 0:
        # long-L path: carry-chunked per-direction calls
        Lc, B_tile = _pick_chunk(k, O, B, u.dtype.itemsize)
        B_pad = -(-B // B_tile) * B_tile
        if B_pad != B:
            u = jnp.pad(u, ((0, 0), (0, 0), (0, B_pad - B)))
            if not skip_from_u:
                skip = jnp.pad(skip, ((0, 0), (0, 0), (0, B_pad - B)))
        dirs = [
            _chunked_direction(
                u, skip, gates[d * 4 * H:(d + 1) * 4 * H], H=H, O=O, k=k,
                d=d, L=L, B=B_pad, Lc=Lc, B_tile=B_tile,
                skip_from_u=skip_from_u, interpret=interpret)
            for d in range(ndir)
        ]
        out = jnp.concatenate(dirs, axis=1) if ndir > 1 else dirs[0]
        return out[:, :, :B] if B_pad != B else out
    B_pad = -(-B // B_tile) * B_tile
    if B_pad != B:
        u = jnp.pad(u, ((0, 0), (0, 0), (0, B_pad - B)))
        if not skip_from_u:
            skip = jnp.pad(skip, ((0, 0), (0, 0), (0, B_pad - B)))

    out = pl.pallas_call(
        functools.partial(_kernel, H=H, O=O, k=k, ndir=ndir,
                          skip_from_u=skip_from_u),
        grid=(B_pad // B_tile,),
        in_specs=[
            pl.BlockSpec((L, KO, B_tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
            if skip_from_u else
            pl.BlockSpec((L, O, B_tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * H * ndir, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, O, B_tile), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, O, B_pad), u.dtype),
        interpret=interpret,
    )(u, skip, gates)
    return out[:, :, :B] if B_pad != B else out
