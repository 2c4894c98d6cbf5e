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


def _kernel(u_ref, skip_ref, g_ref, out_ref, ub1_ref, ub2_ref, *,
            H: int, O: int, k: int, ndir: int, skip_from_u: bool,
            hoist: bool, unroll: bool):
    """Whole-L kernel. Round-4 restructuring (the per-grid-step cost was
    ~2.7x the DMA roofline — tiny (H, B_tile) VPU ops dominated):

    * both directions advance in the SAME loop trip (forward at t, backward
      at L-1-t, independent carries) — halves loop-iteration overhead;
    * ``hoist``: the gate streams' convert+bias-add run once as whole-block
      (L, H, B) ops into VMEM scratch instead of 2 tiny ops per step
      (Mosaic can't dynamic-index hoisted *values* in a fori_loop, hence
      refs; f32 association changes from (u1 + v*c) + b to (u1 + b) + v*c
      — within test tolerance);
    * ``unroll``: L is static, so small L emits straight-line code with
      static slices instead of a fori_loop.
    """
    L = u_ref.shape[0]
    f32 = jnp.float32
    dirs = []
    for d in range(ndir):
        off = d * 4 * H
        s = d * H
        vf = g_ref[off:off + H]
        vr = g_ref[off + H:off + 2 * H]
        bf = g_ref[off + 2 * H:off + 3 * H]
        br = g_ref[off + 3 * H:off + 4 * H]
        if hoist:
            ub1_ref[d] = u_ref[:, O + s:O + s + H, :].astype(f32) + bf[None]
            ub2_ref[d] = u_ref[:, 2 * O + s:2 * O + s + H, :].astype(f32) + br[None]
        dirs.append((s, vf, vr, bf, br))

    def step_dir(i, d, c):
        s, vf, vr, bf, br = dirs[d]
        t = (L - 1 - i) if d == 1 else i
        u0 = u_ref[t, s:s + H, :].astype(f32)
        if skip_from_u:
            sk = u_ref[t, 3 * O + s:3 * O + s + H, :].astype(f32)
        else:
            sk = skip_ref[t, s:s + H, :].astype(f32)
        if hoist:
            f = jax.nn.sigmoid(ub1_ref[d, t] + vf * c)
            r = jax.nn.sigmoid(ub2_ref[d, t] + vr * c)  # r-gate sees c_{t-1}
        else:
            u1 = u_ref[t, O + s:O + s + H, :].astype(f32)
            u2 = u_ref[t, 2 * O + s:2 * O + s + H, :].astype(f32)
            f = jax.nn.sigmoid(u1 + vf * c + bf)
            r = jax.nn.sigmoid(u2 + vr * c + br)
        c = f * c + (1.0 - f) * u0
        out_ref[t, s:s + H, :] = (r * c + (1.0 - r) * sk).astype(out_ref.dtype)
        return c

    B_t = u_ref.shape[2]
    if unroll:
        cs = [jnp.zeros((H, B_t), f32) for _ in range(ndir)]
        for i in range(L):
            for d in range(ndir):
                cs[d] = step_dir(i, d, cs[d])
    else:
        def step(i, cs):
            return tuple(step_dir(i, d, cs[d]) for d in range(ndir))

        lax.fori_loop(0, L, step,
                      tuple(jnp.zeros((H, B_t), f32) for _ in range(ndir)))


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


def _pick_chunk(k: int, O: int, B: int, itemsize: int, H: int = 0):
    """(L_chunk, B_tile) for the carry-chunked per-direction path: one
    (Lc, k·O + H + H) block set per call, plus the (H, tile) carries and
    the two hoisted (Lc, H, tile) f32 gate streams."""
    n_chan = k * O + O + (O if k == 3 else 0)  # u + out (+ skip iff k==3)
    h = H or O
    for tile in ((256, 128) if B >= 128 else (B,)):
        per_row = n_chan * tile * itemsize + 8 * h * tile
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
    return _pick_chunk(k, O, B, itemsize, H)[0] > 0


def _kernel_chunk(u_ref, skip_ref, g_ref, out_ref, c_ref, ub1_ref, ub2_ref,
                  *, H: int, O: int, d: int, L: int, Lc: int, n_chunks: int,
                  reverse: bool, skip_from_u: bool):
    """One direction, chunk index as the second GRID dim — the VMEM-tight
    path (long L: RTFS-6/12 time-axis recurrences). The carry lives in
    VMEM scratch that persists across grid steps (re-zeroed when each
    batch tile starts), so the whole direction is ONE pallas_call and
    Mosaic's revolving block buffers overlap the next chunk's DMA with the
    current chunk's cell loop — the round-3 version issued one call per
    chunk (serial DMA, 6x the calls) and threaded the carry through HBM.
    Gate streams' convert+bias hoisted per chunk (see _kernel)."""
    f32 = jnp.float32
    ci = pl.program_id(1)
    ci_eff = (n_chunks - 1 - ci) if reverse else ci
    n_valid = jnp.minimum(Lc, L - ci_eff * Lc)

    @pl.when(ci == 0)
    def _init():
        c_ref[...] = jnp.zeros(c_ref.shape, c_ref.dtype)

    vf = g_ref[0:H]
    vr = g_ref[H:2 * H]
    s = d * H
    ub1_ref[...] = u_ref[:, O + s:O + s + H, :].astype(f32) + g_ref[2 * H:3 * H][None]
    ub2_ref[...] = u_ref[:, 2 * O + s:2 * O + s + H, :].astype(f32) + g_ref[3 * H:4 * H][None]

    def step(i, c):
        t = (n_valid - 1 - i) if reverse else i
        u0 = u_ref[t, s:s + H, :].astype(f32)
        if skip_from_u:
            sk = u_ref[t, 3 * O + s:3 * O + s + H, :].astype(f32)
        else:
            sk = skip_ref[t, s:s + H, :].astype(f32)
        f = jax.nn.sigmoid(ub1_ref[t] + vf * c)
        r = jax.nn.sigmoid(ub2_ref[t] + vr * c)  # r-gate sees c_{t-1}
        c = f * c + (1.0 - f) * u0
        out_ref[t, :, :] = (r * c + (1.0 - r) * sk).astype(out_ref.dtype)
        return c

    c_ref[...] = lax.fori_loop(0, n_valid, step, c_ref[...])


def _chunked_direction(u, skip, gates_d, *, H, O, k, d, L, B, Lc, B_tile,
                       skip_from_u, interpret):
    """Run one direction as ONE pallas_call with grid (B tiles, chunks);
    the chunk offset lives in the block index maps, so the big (L, k·O, B)
    array is never sliced or copied, and the carry never leaves VMEM."""
    n_chunks = -(-L // Lc)
    reverse = d == 1

    def chunk_ix(b, ci):
        return ((n_chunks - 1 - ci) if reverse else ci, 0, b)

    skip_spec = (
        # k==4: the kernel never reads skip — a (1,1,1) placeholder block
        # avoids DMA-ing an unread (Lc, O, B_tile) stream per chunk
        pl.BlockSpec((1, 1, 1), lambda b, ci: (0, 0, 0),
                     memory_space=pltpu.VMEM)
        if skip_from_u else
        pl.BlockSpec((Lc, O, B_tile), chunk_ix, memory_space=pltpu.VMEM))
    call = pl.pallas_call(
        functools.partial(_kernel_chunk, H=H, O=O, d=d, L=L, Lc=Lc,
                          n_chunks=n_chunks, reverse=reverse,
                          skip_from_u=skip_from_u),
        scratch_shapes=[
            pltpu.VMEM((H, B_tile), jnp.float32),  # carry, lives across ci
            pltpu.VMEM((Lc, H, B_tile), jnp.float32),
            pltpu.VMEM((Lc, H, B_tile), jnp.float32),
        ],
        grid=(B // B_tile, n_chunks),
        in_specs=[
            pl.BlockSpec((Lc, k * O, B_tile), chunk_ix,
                         memory_space=pltpu.VMEM),
            skip_spec,
            pl.BlockSpec((4 * H, 1), lambda b, ci: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Lc, H, B_tile), chunk_ix,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, H, B), u.dtype),
        interpret=interpret,
    )
    return call(u, skip, gates_d)


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
        Lc, B_tile = _pick_chunk(k, O, B, u.dtype.itemsize, H)
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

    # hoisted (ndir, L, H, B_tile) f32 gate streams in VMEM scratch:
    # 8·L·O·tile bytes; enable only when they fit alongside the
    # double-buffered blocks
    n_chan = k * O + O + (O if k == 3 else 0)
    blocks = n_chan * L * B_tile * u.dtype.itemsize * 2
    hoist = blocks + 8 * L * O * B_tile < 15e6
    scratch = [
        pltpu.VMEM((ndir, L, H, B_tile) if hoist else (1, 1, 1, 1),
                   jnp.float32)
        for _ in range(2)
    ]
    out = pl.pallas_call(
        functools.partial(_kernel, H=H, O=O, k=k, ndir=ndir,
                          skip_from_u=skip_from_u, hoist=hoist,
                          unroll=L <= 160),
        scratch_shapes=scratch,
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
