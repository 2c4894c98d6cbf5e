"""Norm/activation parity vs torch CPU goldens."""
import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from rtfs_net_tpu.ops import normalizations as norms
from rtfs_net_tpu.ops import activations as acts


def test_gln_matches_groupnorm(rng):
    C = 16
    x3 = rng.standard_normal((2, C, 37)).astype(np.float32)
    x4 = rng.standard_normal((2, C, 13, 11)).astype(np.float32)
    tm = tnn.GroupNorm(1, C, eps=1e-5)
    gamma = rng.standard_normal(C).astype(np.float32)
    beta = rng.standard_normal(C).astype(np.float32)
    with torch.no_grad():
        tm.weight.copy_(torch.from_numpy(gamma))
        tm.bias.copy_(torch.from_numpy(beta))
    m = norms.GlobalLayerNorm(C)
    params = {"params": {"scale": jnp.asarray(gamma), "bias": jnp.asarray(beta)}}
    for x in (x3, x4):
        golden = tm(torch.from_numpy(x)).detach().numpy()
        got = m.apply(params, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), golden, atol=2e-5)


@pytest.mark.parametrize("param_freq", [1, 11])
def test_ln4d(rng, param_freq):
    B, C, T, Fr = 2, 8, 13, 11
    x = rng.standard_normal((B, C, T, Fr)).astype(np.float32)
    gamma = rng.standard_normal((1, C, 1, param_freq)).astype(np.float32)
    beta = rng.standard_normal((1, C, 1, param_freq)).astype(np.float32)

    xt = torch.from_numpy(x)
    dim = (1, 3) if param_freq > 1 else (1,)
    mu = xt.mean(dim=dim, keepdim=True)
    std = torch.sqrt(xt.var(dim=dim, unbiased=False, keepdim=True) + 1e-5)
    golden = (((xt - mu) / std) * torch.from_numpy(gamma) + torch.from_numpy(beta)).numpy()

    m = norms.LayerNormalization4D(C, param_freq)
    got = m.apply({"params": {"scale": jnp.asarray(gamma), "bias": jnp.asarray(beta)}}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), golden, atol=2e-5)


def test_batchnorm_train_and_eval(rng):
    C = 8
    x = rng.standard_normal((4, C, 19)).astype(np.float32)
    tm = tnn.BatchNorm1d(C)
    m = norms.BatchNorm1d(C)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x), use_running_average=False)

    # train step: normalize by batch stats, update running stats
    tm.train()
    golden = tm(torch.from_numpy(x)).detach().numpy()
    got, updates = m.apply(variables, jnp.asarray(x), use_running_average=False, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(got), golden, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(updates["batch_stats"]["mean"]),
        tm.running_mean.numpy(), atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(updates["batch_stats"]["var"]),
        tm.running_var.numpy(), rtol=1e-4,
    )

    # eval: use running stats
    tm.eval()
    golden_eval = tm(torch.from_numpy(x)).detach().numpy()
    var_eval = {"params": variables.get("params", {}), "batch_stats": updates["batch_stats"]}
    got_eval = m.apply(var_eval, jnp.asarray(x), use_running_average=True)
    np.testing.assert_allclose(np.asarray(got_eval), golden_eval, atol=5e-3)


def test_layernorm(rng):
    x = rng.standard_normal((4, 19, 16)).astype(np.float32)
    tm = tnn.LayerNorm(16)
    golden = tm(torch.from_numpy(x)).detach().numpy()
    m = norms.LayerNorm(16)
    got = m.apply(
        {"params": {"scale": jnp.ones(16), "bias": jnp.zeros(16)}}, jnp.asarray(x)
    )
    np.testing.assert_allclose(np.asarray(got), golden, atol=2e-5)


def test_prelu(rng):
    x = rng.standard_normal((4, 8, 19)).astype(np.float32)
    tm = tnn.PReLU()
    golden = tm(torch.from_numpy(x)).detach().numpy()
    m = acts.PReLU()
    got = m.apply({"params": {"alpha": jnp.asarray([0.25])}}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), golden)


def test_registries():
    assert norms.get("gLN") is norms.GlobalLayerNorm
    assert norms.get("LayerNormalization4D") is norms.LayerNormalization4D
    assert norms.get("BatchNorm1d") is norms.BatchNorm1d
    assert norms.get(None) is norms.Identity
    assert acts.get("ReLU") is acts.ReLU
    assert acts.get("PReLU") is acts.PReLU
    assert acts.get(None) is acts.Identity
    with pytest.raises(ValueError):
        norms.get("NoSuchNorm")
