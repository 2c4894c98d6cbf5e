"""Numerical parity for remaining legacy-config layers vs torch replicas:
GlobalAttention2D and RNNProjection/GlobalAttentionRNN (LSTM path)."""
import numpy as np
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from rtfs_net_tpu.models import layers as L


def test_rnn_projection_matches_torch(rng):
    """RNNProjection replica (rnn_layers.py:12-59)."""
    B, C, T, H = 2, 12, 17, 8
    x = rng.standard_normal((B, C, T)).astype(np.float32)

    torch.manual_seed(0)
    norm1 = tnn.LayerNorm(C)
    rnn = tnn.LSTM(C, H, num_layers=1, batch_first=True, bidirectional=True)
    prelu = tnn.PReLU()
    proj = tnn.Linear(2 * H, C)
    norm2 = tnn.LayerNorm(C)
    with torch.no_grad():
        for p in list(norm1.parameters()) + list(norm2.parameters()):
            p.uniform_(-0.5, 0.5)

    xt = torch.from_numpy(x)
    res = xt
    y = xt.transpose(1, 2)
    y = norm1(y)
    residual = y
    y = rnn(y)[0]
    y = proj(prelu(y))
    y = norm2(y + residual).transpose(2, 1)
    golden = (y + res).detach().numpy()

    m = L.RNNProjection(C, H, "LSTM", dropout=0.0, bidirectional=True)
    params = {
        "norm1": {"scale": jnp.asarray(norm1.weight.detach().numpy()),
                  "bias": jnp.asarray(norm1.bias.detach().numpy())},
        "norm2": {"scale": jnp.asarray(norm2.weight.detach().numpy()),
                  "bias": jnp.asarray(norm2.bias.detach().numpy())},
        "rnn": {n: jnp.asarray(v.detach().numpy()) for n, v in rnn.named_parameters()},
        "prelu": {"alpha": jnp.asarray(prelu.weight.detach().numpy())},
        "proj": {"weight": jnp.asarray(proj.weight.detach().numpy()),
                 "bias": jnp.asarray(proj.bias.detach().numpy())},
    }
    got = m.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), golden, atol=3e-5)


def test_global_attention_2d_shapes(rng):
    x = rng.standard_normal((1, 16, 13, 11)).astype(np.float32)
    m = L.GlobalAttention2D(in_chan=16, n_head=4, kernel_size=3, dropout=0.1,
                            group_ffn=True)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = m.apply(v, jnp.asarray(x))
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_global_galr_shapes(rng):
    x = rng.standard_normal((1, 16, 13, 11)).astype(np.float32)
    m = L.GlobalGALR(in_chan=16, n_head=4, kernel_size=3)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = m.apply(v, jnp.asarray(x))
    assert y.shape == x.shape


def test_dualpath_rnn_gru_and_attn(rng):
    x = rng.standard_normal((1, 8, 13, 11)).astype(np.float32)
    for rnn_type in ("GRU", "Attn"):
        m = L.DualPathRNN(in_chan=8, hid_chan=4, dim=3, kernel_size=8,
                          stride=1, rnn_type=rnn_type, num_layers=2,
                          bidirectional=True)
        v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
        y = m.apply(v, jnp.asarray(x))
        assert y.shape == x.shape, rnn_type


def test_cbam_shuffle_cot(rng):
    x = rng.standard_normal((1, 32, 9, 7)).astype(np.float32)
    for mod in (L.CBAMBlock(in_chan=32, reduction=4, kernel_size=7),
                L.ShuffleAttention(in_chan=32, G=4),
                L.CoTAttention(in_chan=32, kernel_size=3)):
        v = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
        y = mod.apply(v, jnp.asarray(x))
        assert y.shape == x.shape, type(mod).__name__
