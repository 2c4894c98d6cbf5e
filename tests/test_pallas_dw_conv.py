"""Pallas depthwise-conv stencil kernel: exact parity vs lax conv, fwd and
custom_vjp grads (interpret mode on CPU). The kernel is OFF by default on
TPU — measured slower than XLA's conv lowering at the serving hot shape
(see ops/pallas/dw_conv.py) — but stays verified here so the
RTFS_PALLAS_DW=1 escape hatch can't rot.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtfs_net_tpu.ops.pallas.dw_conv import (
    _lax_dw_conv,
    dw_conv2d_same,
    pallas_dw_supported,
)


CASES = [
    # (B, C, T, F, k_t, k_f) — odd/even kernels, non-aligned T/F, multi-tile T
    (8, 4, 17, 9, 3, 3),
    (8, 3, 12, 7, 5, 5),
    (16, 2, 9, 13, 4, 4),
    (8, 5, 8, 8, 2, 3),
    (8, 2, 70, 9, 3, 3),  # T spans multiple tiles (T_tile=16 for f32)
]


def _pads(k_t, k_f):
    return ((k_t - 1) // 2, k_t // 2), ((k_f - 1) // 2, k_f // 2)


@pytest.mark.parametrize("B,C,T,F,k_t,k_f", CASES)
def test_forward_parity(B, C, T, F, k_t, k_f, rng):
    pads = _pads(k_t, k_f)
    x = jnp.asarray(rng.standard_normal((B, C, T, F)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((C, 1, k_t, k_f)), jnp.float32)
    y = dw_conv2d_same(x, w, pads)
    y_ref = _lax_dw_conv(x, w, pads)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-5)


def test_custom_vjp_grads(rng):
    B, C, T, F, k_t, k_f = 8, 3, 20, 9, 3, 3
    pads = _pads(k_t, k_f)
    x = jnp.asarray(rng.standard_normal((B, C, T, F)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((C, 1, k_t, k_f)), jnp.float32)
    f = lambda x, w: jnp.sum(jnp.sin(dw_conv2d_same(x, w, pads)))
    g = lambda x, w: jnp.sum(jnp.sin(_lax_dw_conv(x, w, pads)))
    dx, dw = jax.grad(f, argnums=(0, 1))(x, w)
    dx_r, dw_r = jax.grad(g, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_r), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_r), rtol=1e-4, atol=1e-3)


def test_conv_module_route(rng, monkeypatch):
    """Conv(groups=C) produces identical outputs with the kernel on/off."""
    from rtfs_net_tpu.ops.conv import Conv

    monkeypatch.setenv("RTFS_PALLAS_DW_INTERPRET", "1")
    x = jnp.asarray(rng.standard_normal((64, 8, 24, 16)), jnp.float32)
    m = Conv(in_chan=8, out_chan=8, kernel_size=(3, 3), ndim=2,
             padding="same", groups=8)
    p = m.init(jax.random.PRNGKey(0), x)
    y_pallas = m.apply(p, x)
    monkeypatch.setenv("RTFS_PALLAS_DW_INTERPRET", "0")
    y_lax = m.apply(p, x)
    np.testing.assert_allclose(np.asarray(y_pallas), np.asarray(y_lax), atol=2e-5)


def test_gate_rejects_unsupported():
    ok = dict(x_shape=(128, 8, 64, 32), kernel=(3, 3), stride=(1, 1),
              dilation=(1, 1), groups=8, in_chan=8, out_chan=8, ndim=2,
              pads=((1, 1), (1, 1)))
    assert pallas_dw_supported(**ok)
    assert not pallas_dw_supported(**{**ok, "ndim": 1})
    assert not pallas_dw_supported(**{**ok, "groups": 1})
    assert not pallas_dw_supported(**{**ok, "stride": (2, 1)})
    assert not pallas_dw_supported(**{**ok, "dilation": (2, 2)})
    assert not pallas_dw_supported(**{**ok, "kernel": (1, 1)})
    assert not pallas_dw_supported(**{**ok, "x_shape": (8, 8, 64, 32)})  # tiny batch
    # shape-changing padding (valid conv) must NOT route to the kernel
    assert not pallas_dw_supported(**{**ok, "pads": ((0, 0), (0, 0))})
