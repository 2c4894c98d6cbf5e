"""Pallas SRU kernel: exact parity with the lax.scan implementation
(interpret mode on the CPU test platform)."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rtfs_net_tpu.ops.rnn import SRU, _sru_direction
from rtfs_net_tpu.ops.pallas.sru_kernel import sru_direction_pallas


@pytest.mark.parametrize("reverse", [False, True])
@pytest.mark.parametrize("L,B,H", [(13, 16, 8), (57, 40, 32)])
def test_direction_kernel_matches_scan(rng, reverse, L, B, H):
    u = jnp.asarray(rng.standard_normal((L, B, 3, H)).astype(np.float32))
    skip = jnp.asarray(rng.standard_normal((L, B, H)).astype(np.float32))
    vf, vr, bf, br = [
        jnp.asarray(rng.standard_normal(H).astype(np.float32) * 0.3)
        for _ in range(4)
    ]
    want = _sru_direction(u, skip, vf, vr, bf, br, reverse)
    got = sru_direction_pallas(u[:, :, 0], u[:, :, 1], u[:, :, 2], skip,
                               vf, vr, bf, br, reverse=reverse, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_full_sru_pallas_backend_matches_scan(rng, monkeypatch):
    monkeypatch.setenv("RTFS_PALLAS_INTERPRET", "1")
    L, B, d_in, H = 11, 6, 24, 8
    x = jnp.asarray(rng.standard_normal((L, B, d_in)).astype(np.float32))
    m_scan = SRU(d_in, H, num_layers=2, bidirectional=True, backend="scan")
    m_pal = SRU(d_in, H, num_layers=2, bidirectional=True, backend="pallas")
    v = m_scan.init(jax.random.PRNGKey(0), x)
    # randomize gate params so the c-dependence is exercised
    p = dict(v["params"])
    rng2 = np.random.default_rng(5)
    for i in range(2):
        p[f"weight_c_l{i}"] = jnp.asarray(
            rng2.standard_normal(p[f"weight_c_l{i}"].shape).astype(np.float32) * 0.3)
        p[f"bias_l{i}"] = jnp.asarray(
            rng2.standard_normal(p[f"bias_l{i}"].shape).astype(np.float32) * 0.3)
    a = m_scan.apply({"params": p}, x)
    b = m_pal.apply({"params": p}, x)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)
