"""Legacy patch-MLP layers (reference: ``src/models/layers/mlp.py`` /
``permutator.py`` — MLP-Mixer and ViP-Permutator blocks used by legacy
configs): patchify (B,C,H,W) -> mixer layers over patch/channel (or
segmented-axis permutations) -> unpatchify, pad/crop to the patch grid."""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...ops.conv import Linear
from ...ops.normalizations import LayerNorm


def _pair(x):
    return tuple(x) if isinstance(x, (tuple, list)) else (x, x)


def _patchify(x, p):
    B, C, H, W = x.shape
    h, w = H // p, W // p
    x = x.reshape(B, C, h, p, w, p)
    # 'b c (h p1) (w p2) -> b (h w) (p1 p2 c)'
    return x.transpose(0, 2, 4, 3, 5, 1).reshape(B, h * w, p * p * C)


def _unpatchify(x, p, h, w, C):
    B = x.shape[0]
    x = x.reshape(B, h, w, p, p, C)
    return x.transpose(0, 5, 1, 3, 2, 4).reshape(B, C, h * p, w * p)


def _grid_pad(x, p):
    """Reference padding rule (mlp.py:57-60): always pad up to the NEXT
    multiple of patch_size (adds a full extra patch when already aligned)."""
    old_w, old_h = x.shape[-2:]
    new_w = (old_w // p) * p + p - old_w
    new_h = (old_h // p) * p + p - old_h
    return jnp.pad(x, ((0, 0), (0, 0), (0, new_w), (0, new_h))), old_w, old_h


class _MixerFF(nn.Module):
    dim_in: int
    dim_hidden: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = Linear(self.dim_in, self.dim_hidden, name="fc1")(x)
        y = jax.nn.gelu(y, approximate=False)  # torch nn.GELU default = exact erf
        if train and self.dropout > 0:
            y = nn.Dropout(self.dropout, deterministic=False)(y)
        y = Linear(self.dim_hidden, self.dim_in, name="fc2")(y)
        if train and self.dropout > 0:
            y = nn.Dropout(self.dropout, deterministic=False)(y)
        return y


class MLP(nn.Module):
    """MLP-Mixer over TF patches (legacy layer_type ``MLP``)."""

    in_chan: int
    image_size: Sequence[int]
    patch_size: int
    dim: int = 64
    depth: int = 2
    expansion_factor: int = 4
    expansion_factor_token: float = 0.5
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.patch_size
        x, old_w, old_h = _grid_pad(x, p)
        B, C, H, W = x.shape
        h, w = H // p, W // p
        num_patches = h * w

        y = _patchify(x, p)
        y = Linear(p * p * C, self.dim, name="embed")(y)
        for d in range(self.depth):
            # token mixing (over patches)
            res = y
            z = LayerNorm(self.dim, name=f"norm_tok{d}")(y)
            z = jnp.swapaxes(z, 1, 2)  # (B, dim, patches)
            z = _MixerFF(num_patches, num_patches * self.expansion_factor,
                         self.dropout, name=f"tok{d}")(z, train)
            y = jnp.swapaxes(z, 1, 2) + res
            # channel mixing
            res = y
            z = LayerNorm(self.dim, name=f"norm_ch{d}")(y)
            z = _MixerFF(self.dim, int(self.dim * self.expansion_factor_token),
                         self.dropout, name=f"ch{d}")(z, train)
            y = z + res
        y = LayerNorm(self.dim, name="norm_out")(y)
        y = Linear(self.dim, p * p * C, name="unembed")(y)
        out = _unpatchify(y, p, h, w, C)
        return out[..., :old_w, :old_h]


class Permutator(nn.Module):
    """ViP-style axis-permutation MLP (legacy layer_type ``Permutator``)."""

    in_chan: int
    image_size: Sequence[int]
    patch_size: int
    dim: int = 64
    depth: int = 2
    segments: int = 4
    expansion_factor: int = 4
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.patch_size
        x, old_w, old_h = _grid_pad(x, p)
        B, C, H, W = x.shape
        h, w = H // p, W // p
        s = self.segments
        assert self.dim % s == 0

        y = _patchify(x, p).reshape(B, h, w, p * p * C)
        y = Linear(p * p * C, self.dim, name="embed")(y)
        for d in range(self.depth):
            res = y
            z = LayerNorm(self.dim, name=f"norm_perm{d}")(y)
            c = self.dim // s
            # height mixing: 'b h w (c s) -> b w c (h s)'
            zh = z.reshape(B, h, w, c, s).transpose(0, 2, 3, 1, 4).reshape(B, w, c, h * s)
            zh = Linear(h * s, h * s, name=f"hmix{d}")(zh)
            zh = zh.reshape(B, w, c, h, s).transpose(0, 3, 1, 2, 4).reshape(B, h, w, c * s)
            # width mixing: 'b h w (c s) -> b h c (w s)'
            zw = z.reshape(B, h, w, c, s).transpose(0, 1, 3, 2, 4).reshape(B, h, c, w * s)
            zw = Linear(w * s, w * s, name=f"wmix{d}")(zw)
            zw = zw.reshape(B, h, c, w, s).transpose(0, 1, 3, 2, 4).reshape(B, h, w, c * s)
            zc = Linear(self.dim, self.dim, name=f"cmix{d}")(z)
            y = Linear(self.dim, self.dim, name=f"proj{d}")(zh + zw + zc) + res

            res = y
            z = LayerNorm(self.dim, name=f"norm_ff{d}")(y)
            z = _MixerFF(self.dim, self.dim * self.expansion_factor,
                         self.dropout, name=f"ff{d}")(z, train)
            y = z + res
        y = LayerNorm(self.dim, name="norm_out")(y)
        y = Linear(self.dim, p * p * C, name="unembed")(y)
        out = _unpatchify(y.reshape(B, h * w, p * p * C), p, h, w, C)
        return out[..., :old_w, :old_h]
