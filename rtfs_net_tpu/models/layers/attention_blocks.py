"""Attention blocks (reference: ``src/models/layers/attention.py``).

Sequence lengths here are short (T<=251 after the STFT hop), so attention
is plain einsum softmax — XLA fuses QK^T/softmax/AV efficiently at these
sizes and a flash kernel would only add overhead (SURVEY.md §2.9).
"""
from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from ...ops.conv import Conv, DropPath, Linear
from ...ops.normalizations import LayerNorm
from .conv_blocks import ConvActNorm, apply_norm


def positional_encoding(length: int, channels: int, max_len: int = 10000) -> np.ndarray:
    """Sinusoidal PE (reference ``attention.py:9-25``; note its div_term uses
    log(max_len) — replicated)."""
    position = np.arange(max_len)[:, None].astype(np.float32)
    div_term = np.exp(
        np.arange(0, channels, 2).astype(np.float32) * -(math.log(float(max_len)) / channels)
    )
    pe = np.zeros((max_len, channels), np.float32)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe[:length]


class TorchMultiheadAttention(nn.Module):
    """torch ``nn.MultiheadAttention`` equivalent (packed qkv in_proj,
    out_proj, dropout on attention weights). Input (B, L, E) if
    batch_first else (L, B, E)."""

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    batch_first: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        E, H = self.embed_dim, self.num_heads
        hd = E // H
        # torch inits: in_proj xavier_uniform, biases zero, out_proj default
        def in_proj_init(key, shape, dtype=jnp.float32):
            bound = math.sqrt(6.0 / (shape[0] / 3 + shape[1]))
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        w_in = self.param("in_proj_weight", in_proj_init, (3 * E, E))
        b_in = self.param("in_proj_bias", nn.initializers.zeros, (3 * E,))

        seq = x if self.batch_first else jnp.swapaxes(x, 0, 1)  # (B, L, E)
        B, L, _ = seq.shape
        qkv = seq @ w_in.T.astype(seq.dtype) + b_in.astype(seq.dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(B, L, H, hd).transpose(0, 2, 1, 3)  # (B, H, L, hd)

        q, k, v = heads(q), heads(k), heads(v)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(hd)
        attn = jax.nn.softmax(logits, axis=-1)
        if train and self.dropout > 0:
            attn = nn.Dropout(self.dropout, deterministic=False)(attn)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, E)
        out = Linear(E, E, name="out_proj")(out)
        if not self.batch_first:
            out = jnp.swapaxes(out, 0, 1)
        return out


class MultiHeadSelfAttention(nn.Module):
    """LN -> PE -> MHA -> dropout+res -> LN -> DropPath+res on (B, C, T)
    (or (L, B, C) when not batch_first) — reference ``attention.py:28-73``."""

    in_chan: int
    n_head: int = 8
    dropout: float = 0.1
    positional_encoding: bool = True
    batch_first: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        res = x
        y = jnp.swapaxes(x, 1, 2) if self.batch_first else x  # (B,T,C) / (L,B,C)
        y = LayerNorm(self.in_chan, name="norm1")(y)
        if self.positional_encoding:
            # reference attention.py:24 indexes pe by x.size(1) regardless of
            # batch_first — for (L, B, C) inputs the PE is applied along the
            # BATCH axis (a reference quirk, replicated for parity; hit by
            # DualPathRNN rnn_type=Attn which passes batch_first=False)
            pe = jnp.asarray(positional_encoding(y.shape[1], self.in_chan),
                             y.dtype)
            y = y + pe[None]
        residual = y
        y = TorchMultiheadAttention(
            self.in_chan, self.n_head, self.dropout, batch_first=self.batch_first,
            name="attention",
        )(y, train)
        if train and self.dropout > 0:
            y = nn.Dropout(self.dropout, deterministic=False)(y)
        y = LayerNorm(self.in_chan, name="norm2")(y + residual)
        if self.batch_first:
            y = jnp.swapaxes(y, 2, 1)
        y = DropPath(self.dropout)(y, deterministic=not train) + res
        return y


class MultiHeadSelfAttention2D(nn.Module):
    """RTFS TF-attention over (B, C, T, F): fused Q/K/V head projections,
    heads folded into batch, attention over T with E·F-dim keys
    (reference ``attention.py:76-189``). ``dim=4`` transposes T<->F so the
    same block attends over frequency.

    TPU-first redesign of the reference's 3×n_head separate 1×1
    ConvActNorms (``attention.py:156-158``): ONE 1×1 conv produces every
    head's Q, K and V in a single MXU matmul; the per-head PReLU alphas
    and LayerNormalization4D affines are stacked along a leading head axis
    and applied batched (numerically identical — LN4D statistics are per
    (head, sample, frame) either way). The checkpoint converter
    (``utils/avnet_convert.map_mhsa2d``) packs the reference's per-head
    weights into this fused layout.
    """

    in_chan: int
    n_freqs: int
    n_head: int = 4
    hid_chan: int = 4
    act_type: Any = "PReLU"
    norm_type: Any = "LayerNormalization4D"
    dim: int = 3
    # Input (T,F) axes stored transposed (internal "ft" layout, see
    # AVNet.tf_order): the configured dim is flipped; everything below the
    # entry transpose (and all params) stays canonical.
    spatial_swapped: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        dim = ({3: 4, 4: 3}[self.dim] if self.spatial_swapped else self.dim)
        if dim == 4:
            x = jnp.swapaxes(x, -2, -1)
        B, C, T, F = x.shape
        residual = x
        H, E, Cv = self.n_head, self.hid_chan, C // self.n_head
        if self.norm_type not in ("LayerNormalization4D", None):
            raise NotImplementedError(
                f"fused MHSA2D supports LayerNormalization4D, got {self.norm_type}")

        qkv = Conv(self.in_chan, H * (2 * E + Cv), 1, ndim=2,
                   name="qkv_conv")(x)  # (B, H*(2E+Cv), T, F)
        q, k, v = jnp.split(qkv, [H * E, 2 * H * E], axis=1)
        # heads folded into batch (row order b*H+h): plain reshapes, and
        # all norm reduces stay the proven 4-D LN4D pattern (dims (1,3)).
        # (A 5-D no-fold variant — heads kept as a tensor dim, reduces over
        # (2,4) — measured WORSE on-chip: 305.1 vs 307.8 utt/s serve and
        # 50.9 vs 44.6 ms/step train B=4; XLA schedules the folded form
        # better. Round-4 measurement, kept for the record.)
        q = q.reshape(B * H, E, T, F)
        k = k.reshape(B * H, E, T, F)
        v = v.reshape(B * H, Cv, T, F)
        # the TPU AOT compiler (libtpu 2026-08 era) miscompiles the fused
        # conv -> channel-slice -> (B*H) reshape -> reduce pattern
        # ("Expected instruction to have shape..." post-optimization
        # verifier failure); a barrier here blocks that fusion. No-op on
        # CPU, negligible on TPU (the qkv activation is materialized once).
        q, k, v = jax.lax.optimization_barrier((q, k, v))

        def act_norm(y, name, chan):
            # per-head PReLU (scalar alpha each, torch default) + per-head
            # LN4D over (chan, F) dims; head-indexed params are tiled over
            # the batch (tile matches the b*H+h row order)
            if self.act_type == "PReLU":
                alpha = self.param(f"{name}_alpha",
                                   nn.initializers.constant(0.25), (H,))
                a = jnp.tile(alpha, (B,)).reshape(B * H, 1, 1, 1).astype(y.dtype)
                y = jnp.where(y >= 0, y, a * y)
            elif self.act_type is not None:
                from ...ops import activations as _acts

                y = _acts.get(self.act_type)()(y)
            yf = y.astype(jnp.float32)
            mu = yf.mean(axis=(1, 3), keepdims=True)
            var = yf.var(axis=(1, 3), keepdims=True)
            yf = (yf - mu) / jnp.sqrt(var + 1e-5)
            gamma = self.param(f"{name}_scale", nn.initializers.ones,
                               (H, chan, 1, self.n_freqs))
            beta = self.param(f"{name}_bias", nn.initializers.zeros,
                              (H, chan, 1, self.n_freqs))
            gamma = jnp.tile(gamma, (B, 1, 1, 1))
            beta = jnp.tile(beta, (B, 1, 1, 1))
            return (yf * gamma + beta).astype(y.dtype)

        q = act_norm(q, "q", E)
        k = act_norm(k, "k", E)
        v = act_norm(v, "v", Cv)

        # attention over T with (E*F)-dim keys, heads in batch. Contract
        # (E, F) / expand (Cv, F) directly on the (B·H, chan, T, F) layout:
        # one dot_general with two contracting dims instead of
        # transpose->reshape->matmul (the explicit per-head layout copies).
        # Identical math: the old qf[b,t,e*F+f] flattening summed over the
        # same (e, f) pairs these einsums contract. Measured (B=128 bf16
        # serving / train B=4): 302.9->307.8 utt/s, 49.1->44.6 ms/step.
        logits = jnp.einsum("betf,besf->bts", q, k) / math.sqrt(E * F)
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bts,bcsf->bctf", attn, v)
        out = out.reshape(B, C, T, F)

        out = ConvActNorm(
            in_chan=self.in_chan, out_chan=self.in_chan, kernel_size=1,
            act_type=self.act_type, norm_type=self.norm_type,
            n_freqs=self.n_freqs, is2d=True, name="attn_concat_proj",
        )(out, train)

        out = out + residual
        if dim == 4:
            out = jnp.swapaxes(out, -2, -1)
        return out


class GlobalAttention(nn.Module):
    """MHSA + conv-FFN on (B, C, T) — the video-branch layer
    (reference ``attention.py:192-220``)."""

    in_chan: int
    hid_chan: Optional[int] = None
    ffn_name: str = "FeedForwardNetwork"
    kernel_size: int = 5
    n_head: int = 8
    dropout: float = 0.1
    pos_enc: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        from . import get_ffn

        hid = self.hid_chan if self.hid_chan is not None else 2 * self.in_chan
        y = MultiHeadSelfAttention(
            self.in_chan, self.n_head, self.dropout, self.pos_enc, name="MHSA"
        )(x, train)
        y = get_ffn(self.ffn_name)(
            self.in_chan, hid, self.kernel_size, dropout=self.dropout, name="FFN"
        )(y, train)
        return y


class GlobalAttention2D(nn.Module):
    """time-axis MHSA+FFN then freq-axis MHSA+FFN via reshape-to-batch
    (reference ``attention.py:223-280``)."""

    in_chan: int
    hid_chan: Optional[int] = None
    ffn_name: str = "FeedForwardNetwork"
    kernel_size: int = 5
    n_head: int = 8
    dropout: float = 0.1
    single_ffn: bool = True
    group_ffn: bool = False
    pos_enc: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        from . import get_ffn

        hid = self.hid_chan if self.hid_chan is not None else 2 * self.in_chan
        B, C, H, W = x.shape
        # reference attention.py:253-254,273,280: ONE group_FFN module shared
        # between both applications
        group = (get_ffn("FeedForwardNetwork")(
            self.in_chan, hid, self.kernel_size, dropout=self.dropout,
            is2d=True, name="group_FFN") if self.group_ffn else None)

        y = x.transpose(0, 3, 1, 2).reshape(B * W, C, H)
        y = MultiHeadSelfAttention(self.in_chan, self.n_head, self.dropout, self.pos_enc, name="time_MHSA")(y, train)
        if self.single_ffn:
            y = get_ffn(self.ffn_name)(self.in_chan, hid, self.kernel_size, dropout=self.dropout, name="time_FFN")(y, train)
        y = y.reshape(B, W, C, H).transpose(0, 2, 3, 1)

        if group is not None:
            y = group(y, train)

        z = y.transpose(0, 2, 1, 3).reshape(B * H, C, W)
        z = MultiHeadSelfAttention(self.in_chan, self.n_head, self.dropout, self.pos_enc, name="freq_MHSA")(z, train)
        if self.single_ffn:
            z = get_ffn(self.ffn_name)(self.in_chan, hid, self.kernel_size, dropout=self.dropout, name="freq_FFN")(z, train)
        z = z.reshape(B, H, C, W).transpose(0, 2, 1, 3)

        if group is not None:
            z = group(z, train)
        return z


class CBAMBlock(nn.Module):
    """channel+spatial squeeze attention (legacy configs,
    reference ``attention.py:283-343``)."""

    in_chan: int = 512
    reduction: int = 16
    kernel_size: int = 49

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        B, C, H, W = x.shape
        # channel attention: shared MLP over max- and avg-pooled descriptors
        maxd = jnp.max(x, axis=(2, 3), keepdims=True)
        avgd = jnp.mean(x, axis=(2, 3), keepdims=True)
        se1 = Conv(C, C // self.reduction, 1, ndim=2, use_bias=False, name="se1")
        se2 = Conv(C // self.reduction, C, 1, ndim=2, use_bias=False, name="se2")
        ca = jax.nn.sigmoid(se2(jax.nn.relu(se1(maxd))) + se2(jax.nn.relu(se1(avgd))))
        y = x * ca
        # spatial attention
        mx = jnp.max(y, axis=1, keepdims=True)
        av = jnp.mean(y, axis=1, keepdims=True)
        sa = Conv(2, 1, self.kernel_size, ndim=2,
                  padding=self.kernel_size // 2, name="sa")(jnp.concatenate([mx, av], 1))
        y = y * jax.nn.sigmoid(sa)
        return y + residual


class ShuffleAttention(nn.Module):
    """grouped channel/spatial attention with channel shuffle (legacy,
    reference ``attention.py:346-408``)."""

    in_chan: int = 512
    G: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, C, H, W = x.shape
        G = self.G
        cpg = C // (2 * G)
        cweight = self.param("cweight", nn.initializers.zeros, (1, cpg, 1, 1))
        cbias = self.param("cbias", nn.initializers.ones, (1, cpg, 1, 1))
        sweight = self.param("sweight", nn.initializers.zeros, (1, cpg, 1, 1))
        sbias = self.param("sbias", nn.initializers.ones, (1, cpg, 1, 1))

        y = x.reshape(B * G, -1, H, W)
        x0, x1 = jnp.split(y, 2, axis=1)
        # channel branch
        xc = jnp.mean(x0, axis=(2, 3), keepdims=True)
        xc = cweight * xc + cbias
        xc = x0 * jax.nn.sigmoid(xc)
        # spatial branch: GroupNorm(cpg, cpg) == per-channel instance norm
        mean = jnp.mean(x1, axis=(2, 3), keepdims=True)
        var = jnp.mean(jnp.square(x1 - mean), axis=(2, 3), keepdims=True)
        gn_scale = self.param("gn_scale", nn.initializers.ones, (cpg,))
        gn_bias = self.param("gn_bias", nn.initializers.zeros, (cpg,))
        xs = (x1 - mean) / jnp.sqrt(var + 1e-5)
        xs = xs * gn_scale.reshape(1, -1, 1, 1) + gn_bias.reshape(1, -1, 1, 1)
        xs = sweight * xs + sbias
        xs = x1 * jax.nn.sigmoid(xs)

        out = jnp.concatenate([xc, xs], axis=1).reshape(B, -1, H, W)
        # channel shuffle groups=2
        out = out.reshape(B, 2, -1, H, W).transpose(0, 2, 1, 3, 4).reshape(B, -1, H, W)
        return out


class CoTAttention(nn.Module):
    """contextual transformer attention (legacy, reference
    ``attention.py:411-446``)."""

    in_chan: int = 512
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ...ops.normalizations import BatchNorm2d

        B, C, H, W = x.shape
        k1 = Conv(C, C, self.kernel_size, ndim=2, padding=self.kernel_size // 2,
                  groups=4, use_bias=False, name="key_conv")(x)
        k1 = apply_norm(BatchNorm2d(C, name="key_bn"), k1, train)
        k1 = jax.nn.relu(k1)
        v = Conv(C, C, 1, ndim=2, use_bias=False, name="value_conv")(x)
        v = apply_norm(BatchNorm2d(C, name="value_bn"), v, train).reshape(B, C, -1)

        y = jnp.concatenate([k1, x], axis=1)
        factor = 4
        att = Conv(2 * C, 2 * C // factor, 1, ndim=2, use_bias=False, name="att1")(y)
        att = apply_norm(BatchNorm2d(2 * C // factor, name="att_bn"), att, train)
        att = jax.nn.relu(att)
        att = Conv(2 * C // factor, self.kernel_size ** 2 * C, 1, ndim=2, name="att2")(att)
        att = att.reshape(B, C, self.kernel_size ** 2, H, W).mean(axis=2).reshape(B, C, -1)
        k2 = jax.nn.softmax(att, axis=-1) * v
        return k1 + k2.reshape(B, C, H, W)
