"""Recurrent blocks (reference: ``src/models/layers/rnn_layers.py``).

DualPathRNN is the RTFS core: unfold k-sample windows along one TF axis,
run a (bi)RNN over the window sequence with the other axis folded into the
batch, and overlap-add back with a ConvTranspose — bounding recurrence
length and turning most of the work into batched MXU matmuls.
"""
from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...ops import activations
from ...ops.conv import Conv, ConvTranspose, Linear, unfold_1d
from ...ops.normalizations import LayerNorm
from ...ops.rnn import SRU, LSTM, GRU
from .conv_blocks import make_norm, apply_norm, ConvActNorm, FeedForwardNetwork
from .attention_blocks import MultiHeadSelfAttention


class RNNProjection(nn.Module):
    """LayerNorm -> bidir RNN -> PReLU/Dropout/Linear proj -> LayerNorm with
    double residual (reference ``rnn_layers.py:12-59``)."""

    input_size: int
    hidden_size: int
    rnn_type: str = "LSTM"
    dropout: float = 0.0
    bidirectional: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, C, L)
        num_dir = 2 if self.bidirectional else 1
        res = x
        y = jnp.swapaxes(x, 1, 2)  # (B, L, C)
        y = LayerNorm(self.input_size, name="norm1")(y)
        residual = y
        rnn_cls = {"LSTM": LSTM, "GRU": GRU}[self.rnn_type]
        y = rnn_cls(
            self.input_size, self.hidden_size, num_layers=1,
            bidirectional=self.bidirectional, batch_first=True, name="rnn",
        )(y, unroll=1 if train else 4)
        y = activations.PReLU(name="prelu")(y)
        if train and self.dropout > 0:
            y = nn.Dropout(self.dropout, deterministic=False)(y)
        y = Linear(self.hidden_size * num_dir, self.input_size, name="proj")(y)
        if train and self.dropout > 0:
            y = nn.Dropout(self.dropout, deterministic=False)(y)
        y = LayerNorm(self.input_size, name="norm2")(y + residual)
        y = jnp.swapaxes(y, 1, 2)
        return y + res


class DualPathRNN(nn.Module):
    """Axis-factorized windowed RNN over (B, C, T, F)
    (reference ``rnn_layers.py:62-162``).

    ``dim=4`` transposes so the recurrence runs along F; ``dim=3`` runs
    along T. Both axes are padded up to the unfold grid, the off-axis is
    folded into the batch, k-wide windows are unfolded (stride s), the RNN
    consumes (L, B·F, C·k), and a ConvTranspose1d overlap-adds back to C
    channels with a residual.
    """

    in_chan: int
    hid_chan: int
    dim: int
    kernel_size: int = 8
    stride: int = 1
    rnn_type: str = "LSTM"
    num_layers: int = 1
    norm_type: Any = "LayerNormalization4D"
    act_type: Any = "Tanh"
    bidirectional: bool = True
    apply_ffn: bool = False
    # Input (T,F) axes stored transposed (the internal "ft" layout, see
    # AVNet.tf_order): the configured dim is flipped so the recurrence
    # still runs along the configured logical axis. Params are orientation
    # independent (everything below the entry transpose is canonical).
    spatial_swapped: bool = False
    # Scan-unroll for the recurrence when NOT training: unrolling the
    # elementwise recurrence 8 steps/iteration wins ~13% full-model serving
    # throughput, while differentiating the unrolled loop regresses the
    # backward — so training always uses 1 (picked per-call from `train`).
    eval_unroll: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        dim = ({3: 4, 4: 3}[self.dim] if self.spatial_swapped else self.dim)
        if dim == 4:
            x = jnp.swapaxes(x, -2, -1)
        B, C, old_T, old_F = x.shape
        k, s = self.kernel_size, self.stride
        new_T = int(math.ceil((old_T - k) / s) * s + k)
        new_F = int(math.ceil((old_F - k) / s) * s + k)
        x = jnp.pad(x, ((0, 0), (0, 0), (0, new_T - old_T), (0, new_F - old_F)))

        residual = x
        norm = make_norm(self.norm_type, self.in_chan, 1, name="norm")
        y = apply_norm(norm, x, train)

        # fold F into batch; T windows are consumed pre-unfold: the RNN
        # paths fuse the k-wide unfold into their layer-0 input projection
        # (ops/rnn.py windowed_projection) so the (B·F, C·k, L) tensor is
        # only ever materialized for the Attn path, which needs it as its
        # embedding sequence.
        y = y.transpose(0, 3, 1, 2).reshape(B * new_F, C, new_T)

        unfolded_chan = C * k
        num_dir = 2 if self.bidirectional else 1
        unroll = 1 if train else self.eval_unroll
        if self.rnn_type == "SRU":
            rnn_out_chan = self.hid_chan * num_dir
            y = SRU(unfolded_chan, self.hid_chan, self.num_layers,
                    self.bidirectional, name="rnn")(
                        y, window=(k, s), unroll=unroll)
        elif self.rnn_type == "Attn":
            rnn_out_chan = unfolded_chan
            y = unfold_1d(y, k, s)  # (B*F, C*k, L)
            y = y.transpose(2, 0, 1)  # (L, B*F, C*k)
            y = MultiHeadSelfAttention(unfolded_chan, 8, batch_first=False,
                                       name="rnn")(y, train)
        else:
            rnn_out_chan = self.hid_chan * num_dir
            cls = {"LSTM": LSTM, "GRU": GRU}[self.rnn_type]
            y = cls(unfolded_chan, self.hid_chan, self.num_layers,
                    self.bidirectional, name="rnn")(
                        y, window=(k, s), unroll=max(1, unroll // 2))

        y = y.transpose(1, 2, 0)  # (B*F, rnn_out, L)
        if self.apply_ffn:
            y = FeedForwardNetwork(unfolded_chan, unfolded_chan * 2, k,
                                   dropout=0.1, name="ffn")(y, train)
        y = ConvTranspose(rnn_out_chan, self.in_chan, k, ndim=1, stride=s,
                          name="linear")(y)  # (B*F, C, new_T)
        y = y.reshape(B, new_F, C, new_T).transpose(0, 2, 3, 1)
        y = y + residual
        y = y[..., :old_T, :old_F]
        if dim == 4:
            y = jnp.swapaxes(y, -2, -1)
        return y


class ConvLSTMCell(nn.Module):
    """conv-gated LSTM cell used by BiLSTM2D (legacy,
    reference ``rnn_layers.py:165-228``)."""

    in_chan: int
    hid_chan: int
    kernel_size: int = 1
    num_directions: int = 1

    @nn.compact
    def __call__(self, inputs, hidden_t, cell_t, train: bool = False):
        batch_size = inputs.shape[0]

        def ih(name):
            def f(z, tr):
                z = ConvActNorm(self.in_chan, self.in_chan, self.kernel_size,
                                groups=self.in_chan, name=f"{name}_dw")(z, tr)
                return ConvActNorm(self.in_chan, 4 * self.hid_chan, 1,
                                   name=f"{name}_pw")(z, tr)
            return f

        def hh(name):
            return lambda z, tr: ConvActNorm(self.hid_chan, 4 * self.hid_chan, 1,
                                             name=name)(z, tr)

        if self.num_directions > 1:
            in_f, in_b = jnp.split(inputs, 2, axis=1)
            h_f, h_b = jnp.split(hidden_t, 2, axis=1)
            gates_f = ih("linear_ih")(in_f, train) + hh("linear_hh")(h_f, train)[:batch_size]
            gates_b = ih("linear_ih_b")(in_b, train) + hh("linear_hh_b")(h_b, train)[:batch_size]
            gates = jnp.concatenate([gates_f, gates_b], axis=1)
        else:
            gates = ih("linear_ih")(inputs, train) + hh("linear_hh")(hidden_t, train)[:batch_size]

        i_t, f_t, g_t, o_t = jnp.split(gates, 4, axis=1)
        i_t = jax.nn.sigmoid(i_t)
        f_t = jax.nn.sigmoid(f_t)
        g_t = jnp.tanh(g_t)
        o_t = jax.nn.sigmoid(o_t)
        c_next = f_t * cell_t[:batch_size] + i_t * g_t
        h_next = o_t * jnp.tanh(c_next)
        return h_next, c_next


class BiLSTM2D(nn.Module):
    """conv-gated LSTM scanned over frequency windows (legacy,
    reference ``rnn_layers.py:231-301``): slices of ``window`` columns are
    unfolded and fed through one ConvLSTMCell whose state threads across
    slices; bidirectionality via channel-concat of the flipped input."""

    in_chan: int
    hid_chan: int
    dim: int = 3
    kernel_size: int = 5
    window: int = 8
    stride: int = 1
    act_type: Any = "PReLU"
    norm_type: Any = "gLN"
    bidirectional: bool = True
    spatial_swapped: bool = False  # flips the configured dim; see DualPathRNN

    @nn.compact
    def __call__(self, x, train: bool = False):
        dim = ({3: 4, 4: 3}[self.dim] if self.spatial_swapped else self.dim)
        num_dir = 2 if self.bidirectional else 1
        residual = x
        norm = make_norm(self.norm_type, self.in_chan, name="norm")
        y = apply_norm(norm, x, train)

        if self.bidirectional:
            y = jnp.concatenate([y, jnp.flip(y, dim - 1)], axis=1)
        if dim == 3:
            y = jnp.swapaxes(y, -1, -2)

        bs = y.shape[0]
        old_w, old_h = y.shape[-2:]
        w_, s_ = self.window, self.stride
        new_w = int(math.ceil((old_w - w_) / s_) * s_ + w_)
        new_h = int(math.ceil((old_h - w_) / s_) * s_ + w_)
        y = jnp.pad(y, ((0, 0), (0, 0), (0, new_w - old_w), (0, new_h - old_h)))
        iterations = int(math.ceil(new_h / w_))

        cell = ConvLSTMCell(self.in_chan * w_, self.hid_chan, self.kernel_size,
                            num_dir, name="lstm_cell")
        hidden = jnp.zeros((1, self.hid_chan * num_dir, 1), y.dtype)
        cell_t = jnp.zeros((1, self.hid_chan * num_dir, 1), y.dtype)
        outputs = []
        cin = self.in_chan * num_dir
        for i in range(iterations):
            sl = y[..., i * w_: (i + 1) * w_]
            wdim, hdim = sl.shape[-2:]
            sl = sl.transpose(0, 3, 1, 2).reshape(bs * hdim, cin, wdim)
            sl = unfold_1d(sl, w_, s_)  # (bs*h, C*w, L)
            hidden, cell_t = cell(sl, hidden, cell_t, train)
            outputs.append(
                hidden.reshape(bs, hdim, self.hid_chan * num_dir, -1)
                .transpose(0, 2, 3, 1)
            )
        y = jnp.concatenate(outputs, axis=-1)

        hd = self.hid_chan * num_dir
        y = ConvTranspose(hd, hd, (w_, 1), ndim=2, stride=(s_, 1), groups=hd,
                          name="proj_deconv")(y)
        y = activations.get(self.act_type)(name="proj_act")(y)
        pnorm = make_norm(self.norm_type, hd, name="proj_norm")
        y = apply_norm(pnorm, y, train)
        y = ConvActNorm(hd, self.in_chan, 1, is2d=True, name="proj_out")(y, train)
        y = y[..., :old_w, :old_h]
        if dim == 3:
            y = jnp.swapaxes(y, -1, -2)
        return y + residual


class GlobalAttentionRNN(nn.Module):
    """RNNProjection wrapper (reference ``rnn_layers.py:304-326``)."""

    in_chan: int
    hid_chan: Optional[int] = None
    dropout: float = 0.1
    rnn_type: str = "LSTM"
    bidirectional: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        hid = self.hid_chan if self.hid_chan is not None else self.in_chan
        return RNNProjection(self.in_chan, hid, self.rnn_type, self.dropout,
                             self.bidirectional, name="RNN")(x, train)


class GlobalGALR(nn.Module):
    """time-RNN + freq-MHSA+FFN hybrid (GALR style,
    reference ``rnn_layers.py:329-379``)."""

    in_chan: int
    hid_chan: Optional[int] = None
    ffn_name: str = "FeedForwardNetwork"
    kernel_size: int = 5
    n_head: int = 8
    dropout: float = 0.1
    group_ffn: bool = False
    pos_enc: bool = True
    rnn_type: str = "LSTM"
    bidirectional: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        from . import get_ffn

        hid = self.hid_chan if self.hid_chan is not None else 2 * self.in_chan
        B, C, H, W = x.shape

        y = x.transpose(0, 3, 1, 2).reshape(B * W, C, H)
        y = RNNProjection(self.in_chan, self.in_chan, self.rnn_type,
                          self.dropout, self.bidirectional, name="time_RNN")(y, train)
        y = y.reshape(B, W, C, H).transpose(0, 2, 3, 1)

        z = y.transpose(0, 2, 1, 3).reshape(B * H, C, W)
        z = MultiHeadSelfAttention(self.in_chan, self.n_head, self.dropout,
                                   self.pos_enc, name="freq_MHSA")(z, train)
        z = get_ffn(self.ffn_name)(self.in_chan, hid, self.kernel_size,
                                   dropout=self.dropout, name="freq_FFN")(z, train)
        z = z.reshape(B, H, C, W).transpose(0, 2, 1, 3)

        if self.group_ffn:
            z = FeedForwardNetwork(self.in_chan, hid, self.kernel_size,
                                   dropout=self.dropout, is2d=True,
                                   name="group_FFN")(z, train)
        return z
