"""Layer-level parity vs inline torch replicas of the reference blocks."""
import math

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

from rtfs_net_tpu.models import layers as L


def _init(module, x, train=False, method=None):
    return module.init(jax.random.PRNGKey(0), jnp.asarray(x), train)


def test_conv_norm_act_shapes(rng):
    x = rng.standard_normal((2, 8, 21, 13)).astype(np.float32)
    m = L.ConvNormAct(in_chan=8, out_chan=16, kernel_size=3, is2d=True,
                      pre_norm_type="gLN", pre_act_type="ReLU", norm_type="gLN",
                      act_type="PReLU")
    v = _init(m, x)
    y = m.apply(v, jnp.asarray(x))
    assert y.shape == (2, 16, 21, 13)
    # kernel<=0 => identity
    m0 = L.ConvNormAct(in_chan=8, kernel_size=-1, is2d=True)
    y0 = m0.apply(m0.init(jax.random.PRNGKey(0), jnp.asarray(x)), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y0), x)


def test_mhsa_matches_torch(rng):
    """MultiHeadSelfAttention vs a torch replica of attention.py:28-73."""
    B, C, T = 2, 16, 23
    x = rng.standard_normal((B, C, T)).astype(np.float32)

    torch.manual_seed(0)
    tm_norm1 = tnn.LayerNorm(C)
    tm_attn = tnn.MultiheadAttention(C, 4, 0.0, batch_first=True)
    tm_norm2 = tnn.LayerNorm(C)
    with torch.no_grad():
        for p in list(tm_norm1.parameters()) + list(tm_norm2.parameters()):
            p.uniform_(-0.5, 0.5)

    xt = torch.from_numpy(x).transpose(1, 2)
    y = tm_norm1(xt)
    # positional encoding replica (reference attention.py:9-25)
    pe = np.asarray(L.positional_encoding(T, C))
    y = y + torch.from_numpy(pe)[None]
    residual = y
    att = tm_attn(y, y, y)[0]
    y = tm_norm2(att + residual).transpose(2, 1)
    golden = (y + torch.from_numpy(x)).detach().numpy()

    m = L.MultiHeadSelfAttention(C, 4, dropout=0.0)
    params = {
        "norm1": {"scale": jnp.asarray(tm_norm1.weight.detach().numpy()),
                  "bias": jnp.asarray(tm_norm1.bias.detach().numpy())},
        "norm2": {"scale": jnp.asarray(tm_norm2.weight.detach().numpy()),
                  "bias": jnp.asarray(tm_norm2.bias.detach().numpy())},
        "attention": {
            "in_proj_weight": jnp.asarray(tm_attn.in_proj_weight.detach().numpy()),
            "in_proj_bias": jnp.asarray(tm_attn.in_proj_bias.detach().numpy()),
            "out_proj": {"weight": jnp.asarray(tm_attn.out_proj.weight.detach().numpy()),
                         "bias": jnp.asarray(tm_attn.out_proj.bias.detach().numpy())},
        },
    }
    got = m.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), golden, atol=2e-5)


class _TorchDualPathLSTM(tnn.Module):
    """Inline torch replica of DualPathRNN (rnn_layers.py:62-162) with LSTM."""

    def __init__(self, C, H, dim, k, s):
        super().__init__()
        self.dim, self.k, self.s, self.C = dim, k, s, C
        # LayerNormalization4D with param (C, 1)
        self.gamma = tnn.Parameter(torch.randn(1, C, 1, 1) * 0.1 + 1)
        self.beta = tnn.Parameter(torch.randn(1, C, 1, 1) * 0.1)
        self.unfold = tnn.Unfold((k, 1), stride=(s, 1))
        self.rnn = tnn.LSTM(C * k, H, num_layers=2, bidirectional=True)
        self.linear = tnn.ConvTranspose1d(H * 2, C, k, stride=s)

    def forward(self, x):
        if self.dim == 4:
            x = x.transpose(-2, -1).contiguous()
        B, C, old_T, old_F = x.shape
        new_T = math.ceil((old_T - self.k) / self.s) * self.s + self.k
        new_F = math.ceil((old_F - self.k) / self.s) * self.s + self.k
        x = tF.pad(x, (0, new_F - old_F, 0, new_T - old_T))
        residual = x
        mu = x.mean(dim=(1,), keepdim=True)
        std = torch.sqrt(x.var(dim=(1,), unbiased=False, keepdim=True) + 1e-5)
        x = ((x - mu) / std) * self.gamma + self.beta
        x = x.permute(0, 3, 1, 2).contiguous().view(B * new_F, C, new_T, 1)
        x = self.unfold(x)
        x = x.permute(2, 0, 1)
        x = self.rnn(x)[0]
        x = x.permute(1, 2, 0)
        x = self.linear(x)
        x = x.view([B, new_F, C, new_T]).permute(0, 2, 3, 1).contiguous()
        x = x + residual
        x = x[..., :old_T, :old_F]
        if self.dim == 4:
            x = x.transpose(-2, -1).contiguous()
        return x


@pytest.mark.parametrize("dim", [3, 4])
def test_dualpath_rnn_lstm_matches_torch(rng, dim):
    B, C, T, F, H, k, s = 2, 6, 13, 11, 5, 4, 1
    x = rng.standard_normal((B, C, T, F)).astype(np.float32)
    torch.manual_seed(1)
    tm = _TorchDualPathLSTM(C, H, dim, k, s)
    golden = tm(torch.from_numpy(x)).detach().numpy()

    m = L.DualPathRNN(in_chan=C, hid_chan=H, dim=dim, kernel_size=k, stride=s,
                      rnn_type="LSTM", num_layers=2, bidirectional=True)
    rnn_params = {name: jnp.asarray(v.detach().numpy()) for name, v in tm.rnn.named_parameters()}
    params = {
        "norm": {"scale": jnp.asarray(tm.gamma.detach().numpy()),
                 "bias": jnp.asarray(tm.beta.detach().numpy())},
        "rnn": rnn_params,
        "linear": {"weight": jnp.asarray(tm.linear.weight.detach().numpy()),
                   "bias": jnp.asarray(tm.linear.bias.detach().numpy())},
    }
    got = m.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), golden, atol=5e-5)


def test_dualpath_rnn_sru_shape(rng):
    """RTFS config shape smoke: 4-layer bi-SRU DualPathRNN over both axes."""
    x = rng.standard_normal((1, 16, 21, 17)).astype(np.float32)
    for dim in (4, 3):
        m = L.DualPathRNN(in_chan=16, hid_chan=8, dim=dim, kernel_size=8,
                          stride=1, rnn_type="SRU", num_layers=4,
                          bidirectional=True)
        v = _init(m, x)
        y = m.apply(v, jnp.asarray(x))
        assert y.shape == x.shape
        assert np.isfinite(np.asarray(y)).all()
        x = np.asarray(y)


def test_mhsa2d_shape_and_freq_axis(rng):
    x = rng.standard_normal((2, 16, 21, 17)).astype(np.float32)
    for dim in (3, 4):
        m = L.MultiHeadSelfAttention2D(in_chan=16, n_freqs=17 if dim == 3 else 21,
                                       n_head=4, hid_chan=4, dim=dim)
        v = _init(m, x)
        y = m.apply(v, jnp.asarray(x))
        assert y.shape == x.shape
        assert np.isfinite(np.asarray(y)).all()


def test_injection_multi_sum_both_directions(rng):
    big = rng.standard_normal((2, 8, 21, 17)).astype(np.float32)
    small = rng.standard_normal((2, 8, 11, 9)).astype(np.float32)
    m = L.InjectionMultiSum(in_chan=8, kernel_size=5, is2d=True)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(big), jnp.asarray(small))
    y1 = m.apply(v, jnp.asarray(big), jnp.asarray(small))   # local bigger
    assert y1.shape == big.shape
    y2 = m.apply(v, jnp.asarray(small), jnp.asarray(big))   # local smaller
    assert y2.shape == small.shape


def test_attn_fusion_cell_audio_video(rng):
    """CAF: 4D audio (B,C,T,F) fused with 3D video (B,C2,T2)."""
    audio = rng.standard_normal((2, 12, 21, 17)).astype(np.float32)
    video = rng.standard_normal((2, 24, 9)).astype(np.float32)
    m = L.ATTNFusionCell(in_chan_a=12, in_chan_b=24, kernel_size=4, is2d=True)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(audio), jnp.asarray(video))
    y = m.apply(v, jnp.asarray(audio), jnp.asarray(video))
    assert y.shape == audio.shape
    assert np.isfinite(np.asarray(y)).all()


def test_global_attention_video_branch(rng):
    x = rng.standard_normal((2, 16, 50)).astype(np.float32)
    m = L.GlobalAttention(in_chan=16, ffn_name="FeedForwardNetwork",
                          kernel_size=3, n_head=8, dropout=0.1)
    v = _init(m, x)
    y = m.apply(v, jnp.asarray(x))
    assert y.shape == x.shape


def test_feed_forward_network(rng):
    x = rng.standard_normal((2, 16, 50)).astype(np.float32)
    m = L.FeedForwardNetwork(in_chan=16, hid_chan=32, kernel_size=5)
    v = _init(m, x)
    y = m.apply(v, jnp.asarray(x))
    assert y.shape == x.shape


def test_build_filters_unknown_kwargs():
    m = L.build("DualPathRNN", in_chan=8, hid_chan=4, dim=3, layer_type="DualPathRNN",
                kernel_size=8, stride=1, rnn_type="SRU", num_layers=4,
                bidirectional=True, bogus_key=123)
    assert isinstance(m, L.DualPathRNN)
