"""Whole-stack (L, C, B) Pallas SRU backend: exact parity vs the scan path
(interpret mode on CPU). On TPU this backend serves all inference-step SRU
directions (``ops/rnn._sru_lanes_path``); training always uses the scan.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtfs_net_tpu.ops.rnn import SRU
from rtfs_net_tpu.ops.pallas.sru_kernel_v3 import sru_v3_supported


@pytest.mark.parametrize("num_layers,bidirectional,T", [
    (1, True, 27),
    (3, True, 27),
    (2, False, 40),
])
def test_stack_parity_vs_scan(num_layers, bidirectional, T, rng, monkeypatch):
    Bp, C, k_w, s_w, H = 16, 32, 8, 1, 16
    m = SRU(input_size=C * k_w, hidden_size=H, num_layers=num_layers,
            bidirectional=bidirectional)
    x = jnp.asarray(rng.standard_normal((Bp, C, T)), jnp.float32)
    p = m.init(jax.random.PRNGKey(0), x, window=(k_w, s_w))
    y_scan = m.apply(p, x, window=(k_w, s_w), unroll=8)
    monkeypatch.setenv("RTFS_PALLAS_SRU_INTERPRET", "1")
    y_v3 = m.apply(p, x, window=(k_w, s_w), unroll=8)
    assert y_v3.shape == y_scan.shape
    np.testing.assert_allclose(np.asarray(y_v3), np.asarray(y_scan),
                               atol=1e-5, rtol=1e-5)


def test_training_step_default_dispatch(rng, monkeypatch):
    """Round-5 default for the differentiated step kind (unroll==1):
    the custom_vjp train kernel runs when the folded batch's 128-lane
    padding waste is <=25%, scan otherwise (tiny smoke batches pad ~2x).
    RTFS_PALLAS_SRU_TRAIN=0/1 overrides both ways."""
    import rtfs_net_tpu.ops.pallas.sru_train as st

    calls = []
    real = st.sru_direction_train
    monkeypatch.setattr(st, "sru_direction_train",
                        lambda *a, **k: calls.append(1) or real(*a, **k))
    monkeypatch.setenv("RTFS_PALLAS_SRU_INTERPRET", "1")
    C, T, k_w, H = 16, 19, 8, 8
    m = SRU(input_size=C * k_w, hidden_size=H, num_layers=1,
            bidirectional=True)

    def grads(Bp):
        x = jnp.asarray(rng.standard_normal((Bp, C, T)), jnp.float32)
        p = m.init(jax.random.PRNGKey(0), x, window=(k_w, 1))

        def loss(p):
            return jnp.sum(jnp.square(m.apply(p, x, window=(k_w, 1),
                                              unroll=1)))

        return jax.grad(loss)(p)

    g = grads(8)  # waste (128-8)/8 >> 25% -> scan
    assert not calls
    assert all(bool(jnp.isfinite(a).all())
               for a in jax.tree_util.tree_leaves(g))
    grads(128)  # lane-aligned -> kernel by default
    assert calls
    calls.clear()
    monkeypatch.setenv("RTFS_PALLAS_SRU_TRAIN", "0")
    grads(128)  # forced off
    assert not calls
    monkeypatch.setenv("RTFS_PALLAS_SRU_TRAIN", "1")
    grads(8)  # forced on regardless of waste
    assert calls


def test_supported_gate():
    assert sru_v3_supported(58, 16128, 32, 4, 2, 2)
    assert sru_v3_supported(119, 8320, 32, 3, 2, 2)
    assert not sru_v3_supported(58, 16128, 30, 4, 2, 2)   # H not 8-aligned
    assert not sru_v3_supported(4000, 16128, 32, 4, 2, 4)  # VMEM blowout
    # long-L zoo shapes (RTFS-12 hop-64 time axis) ride the chunked path
    assert sru_v3_supported(494, 8320, 32, 4, 2, 2)
    assert sru_v3_supported(494, 8320, 32, 3, 2, 2)


def test_chunked_path_parity(rng, monkeypatch):
    """Carry-chunked long-L path (forced via the tile pickers so it runs
    at CPU-interpret scale): parity vs scan, including the k==4
    placeholder-skip block and a partial tail chunk (L=33, Lc=16)."""
    from rtfs_net_tpu.ops.pallas import sru_kernel_v3 as v3

    monkeypatch.setattr(v3, "_pick_tile", lambda *a: 0)
    monkeypatch.setattr(v3, "_pick_chunk", lambda *a: (16, 16))
    v3.sru_stack_layer.clear_cache()
    Bp, C, T, k_w, H = 16, 16, 40, 8, 8  # L = 33 -> chunks of 16,16,1
    m = SRU(input_size=C * k_w, hidden_size=H, num_layers=2,
            bidirectional=True)
    x = jnp.asarray(rng.standard_normal((Bp, C, T)), jnp.float32)
    p = m.init(jax.random.PRNGKey(0), x, window=(k_w, 1))
    y_scan = m.apply(p, x, window=(k_w, 1), unroll=8)
    monkeypatch.setenv("RTFS_PALLAS_SRU_INTERPRET", "1")
    y_ch = m.apply(p, x, window=(k_w, 1), unroll=8)
    np.testing.assert_allclose(np.asarray(y_ch), np.asarray(y_scan),
                               atol=1e-5, rtol=1e-5)
    v3.sru_stack_layer.clear_cache()


def test_train_kernel_nondividing_tile_batch(rng, monkeypatch):
    """Regression: B=384 is 128-aligned but NOT 256-aligned; the VMEM tile
    chooser must not pick a 256 tile there (grid=(B//256,)=(1,) would leave
    batch columns 256..383 unwritten). Shapes chosen so a 256 tile fits
    VMEM (small L, f32) — the exact case that used to drop columns."""
    Bp, C, T, k_w, H = 384, 16, 19, 8, 8
    m = SRU(input_size=C * k_w, hidden_size=H, num_layers=1,
            bidirectional=True)
    x = jnp.asarray(rng.standard_normal((Bp, C, T)), jnp.float32)
    p = m.init(jax.random.PRNGKey(0), x, window=(k_w, 1))
    y_s = m.apply(p, x, window=(k_w, 1), unroll=1)
    monkeypatch.setenv("RTFS_PALLAS_SRU_INTERPRET", "1")
    monkeypatch.setenv("RTFS_PALLAS_SRU_TRAIN", "1")
    y_k = m.apply(p, x, window=(k_w, 1), unroll=1)
    # compare every batch row — a dropped tile shows up as a zero tail
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_s), atol=1e-5)

    def loss(p):
        return jnp.sum(jnp.square(m.apply(p, x, window=(k_w, 1), unroll=1)))

    g_k = jax.grad(loss)(p)
    monkeypatch.delenv("RTFS_PALLAS_SRU_INTERPRET")
    monkeypatch.delenv("RTFS_PALLAS_SRU_TRAIN")
    g_s = jax.grad(loss)(p)
    for a, b in zip(jax.tree_util.tree_leaves(g_k),
                    jax.tree_util.tree_leaves(g_s)):
        scale = max(1.0, float(np.max(np.abs(np.asarray(b)))))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4 * scale)


def test_train_kernel_grads_match_scan(rng, monkeypatch):
    """RTFS_PALLAS_SRU_TRAIN=1 routes the differentiated step through the
    custom_vjp Pallas kernels; grads must match scan autodiff."""
    Bp, C, T, k_w, H = 128, 16, 19, 8, 8
    m = SRU(input_size=C * k_w, hidden_size=H, num_layers=2,
            bidirectional=True)
    x = jnp.asarray(rng.standard_normal((Bp, C, T)), jnp.float32)
    p = m.init(jax.random.PRNGKey(0), x, window=(k_w, 1))

    def loss(p):
        return jnp.sum(jnp.square(m.apply(p, x, window=(k_w, 1), unroll=1)))

    g_scan = jax.grad(loss)(p)
    monkeypatch.setenv("RTFS_PALLAS_SRU_INTERPRET", "1")
    monkeypatch.setenv("RTFS_PALLAS_SRU_TRAIN", "1")
    y_k = m.apply(p, x, window=(k_w, 1), unroll=1)
    g_k = jax.grad(loss)(p)
    monkeypatch.delenv("RTFS_PALLAS_SRU_INTERPRET")
    monkeypatch.delenv("RTFS_PALLAS_SRU_TRAIN")
    y_s = m.apply(p, x, window=(k_w, 1), unroll=1)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_s), atol=1e-5)
    flat_k = jax.tree_util.tree_leaves(g_k)
    flat_s = jax.tree_util.tree_leaves(g_scan)
    for a, b in zip(flat_k, flat_s):
        scale = max(1.0, float(np.max(np.abs(np.asarray(b)))))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4 * scale)
