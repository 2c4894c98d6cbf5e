"""Recurrent cells as TPU-friendly scans.

The reference rides native CUDA recurrences (`sru` CUDA kernels, cuDNN
LSTM/GRU — SURVEY.md §2.9). Here each cell splits into:

  * a time-parallel input projection — one large matmul over (L·B, D) that
    XLA tiles onto the MXU, and
  * a `lax.scan` carrying only the elementwise recurrence (SRU: (B, H) of
    elementwise ops per step — the sequential part is tiny by design; this
    is exactly why SRU was built, and it maps perfectly to scan).

SRU semantics follow sru==2.6.0 defaults as pinned by the reference
(`setup/requirements.yaml:33`): v2 cell with weight_c gate terms
(``f_t = σ(U¹_t + v_f⊙c_{t−1} + b_f)``), 4-chunk projection when
input_size != output_size (the 4th chunk is the transformed highway input),
``use_tanh=False``, ``rescale=False``, ``highway_bias=0``.

An associative-scan variant (``sru_v1``) drops the ``v⊙c`` gate terms,
making ``c_t = f_t⊙c_{t−1} + (1−f_t)⊙U⁰_t`` a linear recurrence solvable
by ``lax.associative_scan`` in O(log L) depth — exposed for speed
experiments; not used by default configs.

Sequence layout everywhere: (L, B, D) — matching the reference's
DualPathRNN which feeds ``(unfolded_T, B·F, C·k)`` (rnn_layers.py:147).
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn
from jax import lax

from .conv import torch_conv_init, unfold_1d


def _sigmoid(x):
    return jax.nn.sigmoid(x)


def windowed_projection(x, w, kernel_size: int, stride: int):
    """``unfold_1d(x, k, s)`` → (L, B, C·k) → ``@ w`` computed as ONE k-wide
    strided conv on the pre-unfold tensor.

    The reference materializes the k×-expanded window tensor with
    ``nn.Unfold`` and feeds it to the recurrence's dense layer-0 projection
    (``rnn_layers.py:97,141-153``). That projection over unfolded windows
    is mathematically a k-wide 1-D conv on the original (B, C, T) tensor,
    so the (B, C·k, L) activation (the single biggest byte multiplier in
    DualPathRNN — 8× for the RTFS configs) never needs to exist.

    x: (B, C, T); w: (C·k, D) with rows ordered ``c*k + tap`` (the
    ``unfold_1d`` layout). Returns u: (L, B, D).
    """
    _, C, _ = x.shape
    rhs = w.reshape(C, kernel_size, -1).astype(x.dtype)  # (I, H, O)
    u = lax.conv_general_dilated(
        x, rhs, (stride,), "VALID",
        dimension_numbers=("NCH", "IHO", "NHC"))  # (B, L, D)
    return u.transpose(1, 0, 2)


def _sru_direction(u, x_skip, v_f, v_r, b_f, b_r, reverse: bool,
                   unroll: int = 1):
    """Scan one SRU direction.

    u: (L, B, k, H) projected inputs (k=3 or 4); x_skip: (L, B, H) highway
    input (raw x when k==3, u[...,3,:] when k==4). Returns h: (L, B, H).
    """
    return _sru_direction_split(u[:, :, 0], u[:, :, 1], u[:, :, 2], x_skip,
                                v_f, v_r, b_f, b_r, reverse, unroll)


def _sru_direction_split(u0, u1, u2, x_skip, v_f, v_r, b_f, b_r,
                         reverse: bool, unroll: int = 1):
    def step(c_prev, inputs):
        u0_t, u1_t, u2_t, xs_t = inputs
        f_t = _sigmoid(u1_t + v_f * c_prev + b_f)
        c_t = f_t * c_prev + (1.0 - f_t) * u0_t
        r_t = _sigmoid(u2_t + v_r * c_prev + b_r)
        h_t = r_t * c_t + (1.0 - r_t) * xs_t
        return c_t, h_t

    L, B, H = u0.shape
    c0 = jnp.zeros((B, H), u0.dtype)
    # unroll=8 (inference): the model runs ~7.6k sequential SRU steps per
    # forward and the while-loop per-iteration overhead dominates them on
    # TPU; unrolling 8 steps per iteration is worth +13% full-model
    # throughput (682.9 -> 602.5 ms/batch at B=128; unroll=16 regresses).
    # Training passes 1: differentiating the unrolled loop regressed the
    # backward 56.9 -> 67 ms/step. Callers pick per step kind (the value
    # is a module-call argument, not a global — it participates in jit
    # tracing like any other static).
    _, h = lax.scan(step, c0, (u0, u1, u2, x_skip), reverse=reverse,
                    unroll=unroll)
    return h


# "scan" = lax.scan elementwise recurrence (portable); "pallas" = fused
# Pallas TPU kernel per direction (ops/pallas/sru_kernel.py). Trace-time
# static; set before jit.
DEFAULT_SRU_BACKEND = "scan"


def _sru_lanes_path(mod, x, window, unroll, ndir, out_size, params):
    """Whole-stack (L, channels, B) Pallas execution for inference steps.

    Returns the (L, B, out) result, or None when the path doesn't apply
    (training steps, non-TPU backends, missing window entry, or shapes
    that don't fit the kernel's VMEM budget). See
    ``ops/pallas/sru_kernel_v3.py`` for the design; the scan path's
    per-step slice/squeeze HLO machinery was profiled at ~75% of
    DualPathRNN serving time, and the v2 per-direction kernel lost its
    win to (L,B,C)→(L,H,B) boundary transposes — v3 never leaves the
    lanes orientation between layers.
    """
    import os

    if window is None or (mod.backend or DEFAULT_SRU_BACKEND) != "scan":
        return None
    if os.environ.get("RTFS_PALLAS_SRU", "1") == "0":
        return None
    interpret = os.environ.get("RTFS_PALLAS_SRU_INTERPRET") == "1"
    if jax.default_backend() != "tpu" and not interpret:
        return None

    from .pallas.sru_kernel_v3 import sru_stack_layer, sru_v3_supported
    from .pallas.sru_train import sru_direction_train, sru_train_supported

    k_w, s_w = window
    Bp, C, T = x.shape
    L = (T - k_w) // s_w + 1
    H = mod.hidden_size
    train_step = unroll <= 1  # the differentiated step kind
    Bk = -(-Bp // 128) * 128  # train kernel pads the folded batch to lanes
    if train_step:
        # Measured on-chip (v5e, RTFS-4 full train step, bf16+remat,
        # scripts/bench_sru_train.py). Round 3: B=4 51.7 vs scan 45.8
        # ms/step (0.89x — the folded batch 4·129=516 pads to 640 lanes,
        # 24% wasted), B=16 94.1 vs 98.2 (1.04x) — kept opt-in. Round 5
        # re-measure under the r4 baseline (fused MHSA2D einsums, ft
        # layout): B=4 42.1 vs 42.3 (1.00x), B=16 87.2 vs 91.1 (1.05x) —
        # the kernel no longer loses anywhere measured, so it is now the
        # DEFAULT when lane-padding waste is <=25% (B=1/2-style smoke
        # shapes pad 2x and stay on scan). RTFS_PALLAS_SRU_TRAIN=1 forces
        # it on regardless of waste; =0 forces scan.
        env = os.environ.get("RTFS_PALLAS_SRU_TRAIN")
        if env == "0":
            return None
        if env != "1" and (Bk - Bp) * 4 > Bp:
            return None
        ok = sru_train_supported(L, Bk, H, x.dtype.itemsize)
    else:
        ok = all(sru_v3_supported(L, Bp, H, k, ndir, x.dtype.itemsize)
                 for (k, _, _, _) in params)
    if not ok:
        return None
    if params[0][0] != 4:
        return None  # k==3 layer-0 would need the unfolded skip sequence

    def run_layer(u, skip, k, v, b):
        if not train_step:
            return sru_stack_layer(u, skip, v, b, H=H, k=k, ndir=ndir,
                                   interpret=interpret)
        # training: per-direction custom_vjp kernel (Pallas fwd + bwd —
        # the SRU backward is itself an elementwise reverse recurrence)
        O = H * ndir
        pad = Bk - u.shape[2]
        if pad:
            u = jnp.pad(u, ((0, 0), (0, 0), (0, pad)))
            skip = None if skip is None else jnp.pad(
                skip, ((0, 0), (0, 0), (0, pad)))
        outs = []
        for d in range(ndir):
            s = d * H
            u0 = u[:, s:s + H, :]
            u1 = u[:, O + s:O + s + H, :]
            u2 = u[:, 2 * O + s:2 * O + s + H, :]
            sk = (u[:, 3 * O + s:3 * O + s + H, :] if k == 4
                  else skip[:, s:s + H, :])
            vf = v[s:s + H]
            vr = v[O + s:O + s + H]
            bf = b[s:s + H]
            br = b[O + s:O + s + H]
            outs.append(sru_direction_train(
                u0, u1, u2, sk, vf, vr, bf, br, d == 1, interpret))
        h = jnp.concatenate(outs, axis=1) if ndir > 1 else outs[0]
        return h[:, :, :u.shape[2] - pad] if pad else h

    h_cb = None
    for layer, (k, w, v, b) in enumerate(params):
        if layer == 0:
            # windowed projection emitting (L, k·O, B) directly
            rhs = w.reshape(C, k_w, -1).astype(x.dtype)  # (I, H, O)
            u = lax.conv_general_dilated(
                x, rhs, (s_w,), "VALID",
                dimension_numbers=("NCH", "IHO", "HCN"))
            skip = None
        else:
            rhs = w.T.reshape(k * out_size, out_size, 1).astype(h_cb.dtype)
            u = lax.conv_general_dilated(
                h_cb, rhs, (1,), "VALID",
                dimension_numbers=("HCN", "OIH", "HCN"))
            skip = h_cb
        h_cb = run_layer(u, skip, k, v, b)
    return h_cb.transpose(0, 2, 1)


class SRU(nn.Module):
    """Multi-layer (bi)directional SRU, sru==2.6.0 v2 cell semantics."""

    input_size: int
    hidden_size: int
    num_layers: int = 2
    bidirectional: bool = False
    backend: Optional[str] = None

    @nn.compact
    def __call__(self, x, window=None, unroll: int = 1):
        # x: (L, B, input_size) -> (L, B, hidden*ndir).
        # With window=(k, s), x is the PRE-unfold (B', C, T) tensor with
        # C·k == input_size: layer 0's projection runs as a k-wide strided
        # conv (windowed_projection) so the unfolded activation is never
        # materialized. In the 4-chunk case (every active RTFS config) even
        # the highway skip comes from the projection, so nothing else needs
        # the windows.
        ndir = 2 if self.bidirectional else 1
        out_size = self.hidden_size * ndir
        # create all params up front so both execution paths (scan and the
        # Pallas lanes backend) see the identical variable tree
        params = []
        for layer in range(self.num_layers):
            d_in = self.input_size if layer == 0 else out_size
            k = 4 if d_in != out_size else 3
            w = self.param(
                f"weight_l{layer}",
                # sru init: uniform(-sqrt(3/d_in), sqrt(3/d_in))
                lambda key, shape: jax.random.uniform(
                    key, shape, jnp.float32,
                    -math.sqrt(3.0 / shape[0]), math.sqrt(3.0 / shape[0]),
                ),
                (d_in, k * out_size),
            )
            v = self.param(f"weight_c_l{layer}", nn.initializers.zeros, (2 * out_size,))
            b = self.param(f"bias_l{layer}", nn.initializers.zeros, (2 * out_size,))
            params.append((k, w, v, b))

        lanes = _sru_lanes_path(self, x, window, unroll, ndir, out_size, params)
        if lanes is not None:
            return lanes

        h = x
        for layer in range(self.num_layers):
            d_in = self.input_size if layer == 0 else out_size
            k, w, v, b = params[layer]

            if layer == 0 and window is not None:
                k_w, s_w = window
                u = windowed_projection(h, w, k_w, s_w)  # (L, B', k*out)
                L, B = u.shape[:2]
                u = u.reshape(L, B, k, out_size)
                # k==3 (input_size == out_size) needs the raw unfolded
                # sequence as the highway skip — fall back to materializing
                # it (no active config hits this: C·k is 8× out there).
                h_seq = (unfold_1d(h, k_w, s_w).transpose(2, 0, 1)
                         if k == 3 else None)
            else:
                L, B, _ = h.shape
                u = (h.reshape(L * B, d_in) @ w.astype(h.dtype)).reshape(L, B, k, out_size)
                h_seq = h
            backend = self.backend or DEFAULT_SRU_BACKEND
            outs = []
            for d in range(ndir):
                sl = slice(d * self.hidden_size, (d + 1) * self.hidden_size)
                if k == 4:
                    skip = u[:, :, 3, sl]
                else:
                    skip = h_seq[:, :, sl]
                v_f = v[sl].astype(h.dtype)
                v_r = v[out_size + d * self.hidden_size:
                        out_size + (d + 1) * self.hidden_size].astype(h.dtype)
                b_f = b[sl].astype(h.dtype)
                b_r = b[out_size + d * self.hidden_size:
                        out_size + (d + 1) * self.hidden_size].astype(h.dtype)
                if backend == "pallas":
                    import os

                    from .pallas.sru_kernel import sru_direction_pallas

                    interp = os.environ.get("RTFS_PALLAS_INTERPRET") == "1"
                    outs.append(sru_direction_pallas(
                        u[:, :, 0, sl], u[:, :, 1, sl], u[:, :, 2, sl], skip,
                        v_f, v_r, b_f, b_r, reverse=(d == 1),
                        interpret=interp,
                    ))
                else:
                    outs.append(_sru_direction_split(
                        u[:, :, 0, sl], u[:, :, 1, sl], u[:, :, 2, sl],
                        skip, v_f, v_r, b_f, b_r, reverse=(d == 1),
                        unroll=unroll,
                    ))
            h = jnp.concatenate(outs, axis=-1) if ndir > 1 else outs[0]
        return h


def sru_v1_layer(u0, f_pre, r_pre, x_skip):
    """Associative-scan SRU-v1 direction: gates independent of c.

    c_t = f_t⊙c_{t−1} + (1−f_t)⊙u0_t is the linear recurrence
    c_t = a_t·c_{t−1} + b_t, composed associatively as
    (a, b)∘(a', b') = (a·a', a'·b + b').
    """
    f = _sigmoid(f_pre)
    a = f
    b = (1.0 - f) * u0

    def combine(x, y):
        ax, bx = x
        ay, by = y
        return ax * ay, ay * bx + by

    _, c = lax.associative_scan(combine, (a, b), axis=0)
    r = _sigmoid(r_pre)
    return r * c + (1.0 - r) * x_skip


class LSTM(nn.Module):
    """torch ``nn.LSTM`` semantics (gate order i,f,g,o; both biases)."""

    input_size: int
    hidden_size: int
    num_layers: int = 1
    bidirectional: bool = False
    batch_first: bool = False

    @nn.compact
    def __call__(self, x, window=None, unroll: int = 1):
        if self.batch_first:
            x = jnp.swapaxes(x, 0, 1)
        ndir = 2 if self.bidirectional else 1
        h = x
        H = self.hidden_size
        for layer in range(self.num_layers):
            d_in = self.input_size if layer == 0 else H * ndir
            outs = []
            for d in range(ndir):
                sfx = f"_l{layer}" + ("_reverse" if d == 1 else "")
                w_ih = self.param(f"weight_ih{sfx}", torch_conv_init(H), (4 * H, d_in))
                w_hh = self.param(f"weight_hh{sfx}", torch_conv_init(H), (4 * H, H))
                b_ih = self.param(f"bias_ih{sfx}", torch_conv_init(H), (4 * H,))
                b_hh = self.param(f"bias_hh{sfx}", torch_conv_init(H), (4 * H,))
                if layer == 0 and window is not None:
                    # h is the pre-unfold (B', C, T); fuse the unfold into
                    # the input projection (see windowed_projection).
                    u = windowed_projection(h, w_ih.T, *window) \
                        + (b_ih + b_hh).astype(h.dtype)
                    L, B = u.shape[:2]
                else:
                    L, B, _ = h.shape
                    u = (h.reshape(L * B, d_in) @ w_ih.T.astype(h.dtype) + (b_ih + b_hh).astype(h.dtype)).reshape(L, B, 4 * H)
                whh = w_hh.T.astype(h.dtype)

                def step(carry, u_t):
                    h_prev, c_prev = carry
                    g = u_t + h_prev @ whh
                    i, f, gg, o = jnp.split(g, 4, axis=-1)
                    c = _sigmoid(f) * c_prev + _sigmoid(i) * jnp.tanh(gg)
                    hh = _sigmoid(o) * jnp.tanh(c)
                    return (hh, c), hh

                init = (jnp.zeros((B, H), h.dtype), jnp.zeros((B, H), h.dtype))
                _, out = lax.scan(step, init, u, reverse=(d == 1),
                                  unroll=unroll)
                outs.append(out)
            h = jnp.concatenate(outs, axis=-1) if ndir > 1 else outs[0]
        if self.batch_first:
            h = jnp.swapaxes(h, 0, 1)
        return h


class GRU(nn.Module):
    """torch ``nn.GRU`` semantics (gate order r,z,n; reset gate applied to
    the hidden-projection of n as in cuDNN: n = tanh(W_in x + b_in +
    r⊙(W_hn h + b_hn)))."""

    input_size: int
    hidden_size: int
    num_layers: int = 1
    bidirectional: bool = False
    batch_first: bool = False

    @nn.compact
    def __call__(self, x, window=None, unroll: int = 1):
        if self.batch_first:
            x = jnp.swapaxes(x, 0, 1)
        ndir = 2 if self.bidirectional else 1
        h = x
        H = self.hidden_size
        for layer in range(self.num_layers):
            d_in = self.input_size if layer == 0 else H * ndir
            outs = []
            for d in range(ndir):
                sfx = f"_l{layer}" + ("_reverse" if d == 1 else "")
                w_ih = self.param(f"weight_ih{sfx}", torch_conv_init(H), (3 * H, d_in))
                w_hh = self.param(f"weight_hh{sfx}", torch_conv_init(H), (3 * H, H))
                b_ih = self.param(f"bias_ih{sfx}", torch_conv_init(H), (3 * H,))
                b_hh = self.param(f"bias_hh{sfx}", torch_conv_init(H), (3 * H,))
                if layer == 0 and window is not None:
                    u = windowed_projection(h, w_ih.T, *window) \
                        + b_ih.astype(h.dtype)
                    L, B = u.shape[:2]
                else:
                    L, B, _ = h.shape
                    u = (h.reshape(L * B, d_in) @ w_ih.T.astype(h.dtype) + b_ih.astype(h.dtype)).reshape(L, B, 3 * H)
                whh = w_hh.T.astype(h.dtype)
                bhh = b_hh.astype(h.dtype)

                def step(h_prev, u_t):
                    g_h = h_prev @ whh + bhh
                    ur, uz, un = jnp.split(u_t, 3, axis=-1)
                    hr, hz, hn = jnp.split(g_h, 3, axis=-1)
                    r = _sigmoid(ur + hr)
                    z = _sigmoid(uz + hz)
                    n = jnp.tanh(un + r * hn)
                    h_new = (1.0 - z) * n + z * h_prev
                    return h_new, h_new

                init = jnp.zeros((B, H), u.dtype)
                _, out = lax.scan(step, init, u, reverse=(d == 1),
                                  unroll=unroll)
                outs.append(out)
            h = jnp.concatenate(outs, axis=-1) if ndir > 1 else outs[0]
        if self.batch_first:
            h = jnp.swapaxes(h, 0, 1)
        return h


def get_rnn(rnn_type: str):
    return {"SRU": SRU, "LSTM": LSTM, "GRU": GRU}[rnn_type]
