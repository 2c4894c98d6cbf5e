"""Fusion cells (reference: ``src/models/layers/fusion.py``).

InjectionMultiSum is the TF-AR attention-reconstruction unit used at every
scale of a TDANet block; ATTNFusionCell is the CAF cross-modal fusion block
used by RTFS-Net configs.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from ...ops.conv import interpolate_nearest
from .conv_blocks import ConvNormAct


def _spatial_shape(x):
    """Trailing-spatial shape tuple, same rule as the reference's
    ``shape[-(len(shape)//2):]`` (1 dim for 3-D tensors, 2 for 4-D)."""
    return x.shape[-(len(x.shape) // 2):]


class InjectionMultiSum(nn.Module):
    """sigmoid-gated global injection: local_emb * gate(global) + global_emb,
    interpolating whichever side is smaller (reference ``fusion.py:9-69``)."""

    in_chan: int
    kernel_size: int
    norm_type: Any = "gLN"
    is2d: bool = False
    spatial_swapped: bool = False  # (T,F) axes transposed; see ops.conv.Conv

    @nn.compact
    def __call__(self, local_features, global_features, train: bool = False):
        old_shape = _spatial_shape(global_features)
        new_shape = _spatial_shape(local_features)

        local_emb = ConvNormAct(
            self.in_chan, self.in_chan, self.kernel_size, groups=self.in_chan,
            norm_type=self.norm_type, bias=False, is2d=self.is2d,
            spatial_swapped=self.spatial_swapped, name="local_embedding",
        )(local_features, train)

        g_embed = ConvNormAct(
            self.in_chan, self.in_chan, self.kernel_size, groups=self.in_chan,
            norm_type=self.norm_type, bias=False, is2d=self.is2d,
            spatial_swapped=self.spatial_swapped, name="global_embedding",
        )
        g_gate = ConvNormAct(
            self.in_chan, self.in_chan, self.kernel_size, groups=self.in_chan,
            norm_type=self.norm_type, act_type="Sigmoid", bias=False,
            is2d=self.is2d, spatial_swapped=self.spatial_swapped,
            name="global_gate",
        )

        if int(np.prod(new_shape)) > int(np.prod(old_shape)):
            global_emb = interpolate_nearest(g_embed(global_features, train), new_shape)
            gate = interpolate_nearest(g_gate(global_features, train), new_shape)
        else:
            g_interp = interpolate_nearest(global_features, new_shape)
            global_emb = g_embed(g_interp, train)
            gate = g_gate(g_interp, train)

        return local_emb * gate + global_emb


class ConvLSTMFusionCell(nn.Module):
    """LSTM-gate-style cross-modal fusion (reference ``fusion.py:72-124``)."""

    in_chan_a: int
    in_chan_b: int
    kernel_size: int = 1
    bidirectional: bool = False
    is2d: bool = False

    @nn.compact
    def __call__(self, tensor_a, tensor_b, train: bool = False):
        num_dir = 2 if self.bidirectional else 1
        if self.bidirectional:
            flip = (lambda t: jnp.flip(t, (-1, -2))) if self.is2d else (lambda t: jnp.flip(t, -1))
            tensor_a = jnp.concatenate([tensor_a, flip(tensor_a)], axis=1)
            tensor_b = jnp.concatenate([tensor_b, flip(tensor_b)], axis=1)

        conv_a = ConvNormAct(
            self.in_chan_a * num_dir, self.in_chan_a * 4, self.kernel_size,
            is2d=self.is2d, groups=self.in_chan_a // 4, norm_type="gLN",
            name="conv_a",
        )
        conv_b = ConvNormAct(
            self.in_chan_b * num_dir, self.in_chan_a * 4, self.kernel_size,
            is2d=self.is2d, groups=self.in_chan_a // 4, norm_type="gLN",
            name="conv_b",
        )

        old_shape = _spatial_shape(tensor_b)[-(len(tensor_a.shape) // 2):]
        new_shape = _spatial_shape(tensor_a)
        if int(np.prod(new_shape)) > int(np.prod(old_shape)):
            gates = conv_a(tensor_a, train) + interpolate_nearest(conv_b(tensor_b, train), new_shape)
        else:
            gates = conv_a(tensor_a, train) + conv_b(interpolate_nearest(tensor_b, new_shape), train)

        i_t, f_t, g_t, o_t = jnp.split(gates, 4, axis=1)
        c_next = jax.nn.sigmoid(f_t) + jax.nn.sigmoid(i_t) * jnp.tanh(g_t)
        h_next = jax.nn.sigmoid(o_t) * jnp.tanh(c_next)
        return h_next


class ConvGRUFusionCell(nn.Module):
    """GRU-gate-style cross-modal fusion (reference ``fusion.py:127-191``)."""

    in_chan_a: int
    in_chan_b: int
    kernel_size: int = 1
    bidirectional: bool = False
    is2d: bool = False

    @nn.compact
    def __call__(self, tensor_a, tensor_b, train: bool = False):
        num_dir = 2 if self.bidirectional else 1
        if self.bidirectional:
            flip = (lambda t: jnp.flip(t, (-1, -2))) if self.is2d else (lambda t: jnp.flip(t, -1))
            tensor_a = jnp.concatenate([tensor_a, flip(tensor_a)], axis=1)
            tensor_b = jnp.concatenate([tensor_b, flip(tensor_b)], axis=1)

        conv_a = ConvNormAct(
            self.in_chan_a * num_dir, self.in_chan_a * 3, self.kernel_size,
            is2d=self.is2d, groups=self.in_chan_a, norm_type="gLN", name="conv_a",
        )
        conv_b = ConvNormAct(
            self.in_chan_b * num_dir, self.in_chan_a * 3, self.kernel_size,
            is2d=self.is2d, groups=self.in_chan_a, norm_type="gLN", name="conv_b",
        )

        old_shape = _spatial_shape(tensor_b)[-(len(tensor_a.shape) // 2):]
        new_shape = _spatial_shape(tensor_a)
        xg = conv_a(tensor_a, train)
        if int(np.prod(new_shape)) > int(np.prod(old_shape)):
            hg = interpolate_nearest(conv_b(tensor_b, train), new_shape)
        else:
            hg = conv_b(interpolate_nearest(tensor_b, new_shape), train)

        x_r, x_z, x_n = jnp.split(xg, 3, axis=1)
        h_r, h_z, h_n = jnp.split(hg, 3, axis=1)
        r_t = jax.nn.sigmoid(x_r + h_r)
        z_t = jax.nn.sigmoid(x_z + h_z)
        n_t = jnp.tanh(x_n + r_t * h_n)
        return (1.0 - z_t) * n_t


class ATTNFusionCell(nn.Module):
    """CAF block (reference ``fusion.py:194-274``): modality b produces
    (1) a multiplicative resize gate on a's keys and (2) softmax attention
    weights (mean over kernel taps, softmax over b's time axis, nearest-
    interp to a's time axis) gating a's values; output k1 + k2."""

    in_chan_a: int
    in_chan_b: int
    kernel_size: int = 1
    is2d: bool = False
    # tensor_a's (T,F) axes stored transposed (internal "ft" layout): its
    # time axis is -1 and video broadcasts over F at axis -2. Only the
    # 4D-a/3D-b leg supports this — the 3D-a/4D-b leg is dead in every
    # buildable config (the reference crashes on it; see
    # tests/test_fusion_strategy_parity).
    spatial_swapped: bool = False

    @nn.compact
    def __call__(self, tensor_a, tensor_b, train: bool = False):
        swapped = self.spatial_swapped and tensor_a.ndim == 4
        if self.spatial_swapped and tensor_b.ndim == 4:
            raise NotImplementedError(
                "spatial_swapped ATTNFusionCell with a 4D modality-b")
        batch_size = tensor_a.shape[0]
        time_steps = tensor_a.shape[3 if swapped else 2]

        def bcast_time(t):
            # unsqueeze the video-derived (B, C, T) stream so it broadcasts
            # over the frequency axis of a
            return t[:, :, None, :] if swapped else t[..., None]

        b_resized = ConvNormAct(
            self.in_chan_b, self.in_chan_a, 1, groups=self.in_chan_a,
            norm_type="gLN", name="resize",
        )(tensor_b, train)
        b_transformed = interpolate_nearest(b_resized, (time_steps,))
        if self.is2d:
            b_transformed = bcast_time(b_transformed)

        k1 = ConvNormAct(
            self.in_chan_a, self.in_chan_a, 1, groups=self.in_chan_a,
            norm_type="BatchNorm2d" if self.is2d else "BatchNorm1d",
            act_type="ReLU", bias=False, is2d=self.is2d,
            spatial_swapped=self.spatial_swapped, name="key_embed",
        )(tensor_a, train) * b_transformed

        v = ConvNormAct(
            self.in_chan_a, self.in_chan_a, 1, groups=self.in_chan_a,
            norm_type="BatchNorm2d" if self.is2d else "BatchNorm1d",
            bias=False, is2d=self.is2d,
            spatial_swapped=self.spatial_swapped, name="value_embed",
        )(tensor_a, train)

        att = ConvNormAct(
            self.in_chan_b, self.kernel_size * self.in_chan_a, 1,
            groups=self.in_chan_a, norm_type="gLN", name="attention_embed",
        )(tensor_b, train)
        att = att.reshape(batch_size, self.in_chan_a, self.kernel_size, -1)
        att = att.mean(axis=2).reshape(batch_size, self.in_chan_a, -1)
        att = interpolate_nearest(jax.nn.softmax(att, axis=-1), (time_steps,))
        if self.is2d:
            att = bcast_time(att)
        k2 = att * v

        return k1 + k2
