"""Recurrence parity: LSTM/GRU vs torch CPU; SRU vs a naive reference loop."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from rtfs_net_tpu.ops import rnn as rnn_ops


def _np_sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def naive_sru(x, weights, hidden, bidirectional):
    """Straight-line numpy implementation of the sru==2.6.0 v2 cell."""
    ndir = 2 if bidirectional else 1
    out_size = hidden * ndir
    h = x
    for (w, v, b) in weights:
        d_in = h.shape[-1]
        k = 4 if d_in != out_size else 3
        L, B, _ = h.shape
        u = (h.reshape(L * B, d_in) @ w).reshape(L, B, k, out_size)
        outs = []
        for d in range(ndir):
            sl = slice(d * hidden, (d + 1) * hidden)
            v_f, v_r = v[:out_size][sl], v[out_size:][sl]
            b_f, b_r = b[:out_size][sl], b[out_size:][sl]
            order = range(L) if d == 0 else range(L - 1, -1, -1)
            c = np.zeros((B, hidden), np.float32)
            hs = np.zeros((L, B, hidden), np.float32)
            for t in order:
                f = _np_sigmoid(u[t, :, 1, sl] + v_f * c + b_f)
                r = _np_sigmoid(u[t, :, 2, sl] + v_r * c + b_r)
                c = f * c + (1 - f) * u[t, :, 0, sl]
                skip = u[t, :, 3, sl] if k == 4 else h[t, :, sl]
                hs[t] = r * c + (1 - r) * skip
            outs.append(hs)
        h = np.concatenate(outs, axis=-1)
    return h


@pytest.mark.parametrize("d_in,hidden,layers,bidir", [
    (24, 8, 1, False),
    (24, 8, 2, True),   # k=4 on layer 0, k=3 after
    (16, 8, 4, True),   # the RTFS config shape class: 4-layer bi-SRU
])
def test_sru_matches_naive(rng, d_in, hidden, layers, bidir):
    L, B = 11, 3
    x = rng.standard_normal((L, B, d_in)).astype(np.float32)
    m = rnn_ops.SRU(d_in, hidden, num_layers=layers, bidirectional=bidir)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    p = variables["params"]
    weights = [
        (np.asarray(p[f"weight_l{i}"]), np.asarray(p[f"weight_c_l{i}"]), np.asarray(p[f"bias_l{i}"]))
        for i in range(layers)
    ]
    # randomize v and b so gate c-dependence is actually exercised
    rng2 = np.random.default_rng(7)
    weights = [(w, rng2.standard_normal(v.shape).astype(np.float32) * 0.3,
                rng2.standard_normal(b.shape).astype(np.float32) * 0.3) for (w, v, b) in weights]
    p2 = dict(p)
    for i, (w, v, b) in enumerate(weights):
        p2[f"weight_c_l{i}"] = jnp.asarray(v)
        p2[f"bias_l{i}"] = jnp.asarray(b)
    golden = naive_sru(x, weights, hidden, bidir)
    got = m.apply({"params": p2}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), golden, atol=2e-5)


@pytest.mark.parametrize("layers,bidir", [(1, True), (2, True), (1, False)])
def test_lstm_matches_torch(rng, layers, bidir):
    L, B, d_in, H = 9, 2, 12, 8
    x = rng.standard_normal((L, B, d_in)).astype(np.float32)
    tm = torch.nn.LSTM(d_in, H, num_layers=layers, bidirectional=bidir)
    golden = tm(torch.from_numpy(x))[0].detach().numpy()

    m = rnn_ops.LSTM(d_in, H, num_layers=layers, bidirectional=bidir)
    params = {}
    for name, val in tm.named_parameters():
        params[name] = jnp.asarray(val.detach().numpy())
    got = m.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), golden, atol=1e-5)


@pytest.mark.parametrize("layers,bidir", [(1, True), (2, False)])
def test_gru_matches_torch(rng, layers, bidir):
    L, B, d_in, H = 9, 2, 12, 8
    x = rng.standard_normal((L, B, d_in)).astype(np.float32)
    tm = torch.nn.GRU(d_in, H, num_layers=layers, bidirectional=bidir)
    golden = tm(torch.from_numpy(x))[0].detach().numpy()

    m = rnn_ops.GRU(d_in, H, num_layers=layers, bidirectional=bidir)
    params = {name: jnp.asarray(v.detach().numpy()) for name, v in tm.named_parameters()}
    got = m.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), golden, atol=1e-5)


def test_sru_v1_associative_matches_scan(rng):
    """The fast v1 path equals a naive loop of the v1 recurrence."""
    L, B, H = 17, 3, 8
    u0 = rng.standard_normal((L, B, H)).astype(np.float32)
    f_pre = rng.standard_normal((L, B, H)).astype(np.float32)
    r_pre = rng.standard_normal((L, B, H)).astype(np.float32)
    skip = rng.standard_normal((L, B, H)).astype(np.float32)

    c = np.zeros((B, H), np.float32)
    golden = np.zeros((L, B, H), np.float32)
    for t in range(L):
        f = _np_sigmoid(f_pre[t])
        c = f * c + (1 - f) * u0[t]
        r = _np_sigmoid(r_pre[t])
        golden[t] = r * c + (1 - r) * skip[t]

    got = rnn_ops.sru_v1_layer(
        jnp.asarray(u0), jnp.asarray(f_pre), jnp.asarray(r_pre), jnp.asarray(skip)
    )
    np.testing.assert_allclose(np.asarray(got), golden, atol=1e-5)
