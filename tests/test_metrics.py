"""Metric tests: STOI properties, tracker CSV schema, improvement math."""
import csv

import numpy as np
import pytest

from rtfs_net_tpu.metrics import ALLMetricsTracker, stoi


def _speechlike(rng, n=32000, sr=16000):
    t = np.arange(n) / sr
    f0 = 120 + 30 * np.sin(2 * np.pi * 3 * t)
    sig = np.sin(2 * np.pi * np.cumsum(f0) / sr)
    env = np.clip(np.sin(2 * np.pi * 2.5 * t), 0, None)
    return (sig * env + 0.01 * rng.standard_normal(n)).astype(np.float32)


def test_stoi_identity_is_high(rng):
    x = _speechlike(rng)
    assert stoi(x, x, 16000) > 0.99


def test_stoi_monotonic_in_noise(rng):
    x = _speechlike(rng)
    noise = rng.standard_normal(len(x)).astype(np.float32)
    scores = []
    for snr_db in (20, 5, -5):
        scale = np.linalg.norm(x) / (np.linalg.norm(noise) * 10 ** (snr_db / 20))
        scores.append(stoi(x, x + scale * noise, 16000))
    assert scores[0] > scores[1] > scores[2]
    assert 0 <= scores[-1] <= 1


def test_stoi_extended_runs(rng):
    x = _speechlike(rng)
    e = stoi(x, x + 0.1 * rng.standard_normal(len(x)).astype(np.float32),
             16000, extended=True)
    assert -1 <= e <= 1


def test_tracker_csv_and_improvements(rng, tmp_path):
    path = str(tmp_path / "metrics.csv")
    tracker = ALLMetricsTracker(path)
    clean = _speechlike(rng)[None]  # (1, L)
    noise = 0.3 * rng.standard_normal(clean.shape[1]).astype(np.float32)
    mix = clean[0] + noise
    est = clean[0] + 0.05 * noise  # much cleaner than the mixture

    tracker(mix, clean, est[None], "utt1")
    tracker(mix, clean, clean[0][None], "utt2")  # perfect estimate
    mean = tracker.get_mean()
    tracker.final()

    assert mean["si-snr_i"] > 5  # big improvement over mixture baseline
    assert mean["sdr_i"] > 5
    assert 0 < mean["stoi"] <= 1

    with open(path) as f:
        rows = list(csv.DictReader(f))
    assert [r["snt_id"] for r in rows] == ["utt1", "utt2", "avg", "std"]
    assert set(rows[0].keys()) == {"snt_id", "sdr", "sdr_i", "si-snr",
                                   "si-snr_i", "pesq", "stoi"}


def test_np_pit_matches_jax_losses(rng):
    """The tracker's numpy PIT metrics equal the jax loss implementations
    (n_src=2, both orderings)."""
    import jax.numpy as jnp

    from rtfs_net_tpu.losses import (PITLossWrapper, pairwise_neg_sisdr,
                                     pairwise_neg_snr)
    from rtfs_net_tpu.metrics.allwrapper import np_pit_neg_sdr

    from rtfs_net_tpu.losses.sdr import pairwise_neg_sdsdr

    est = rng.standard_normal((2, 4000)).astype(np.float32)
    ref = rng.standard_normal((2, 4000)).astype(np.float32)
    for kind, pairwise in (("sisdr", pairwise_neg_sisdr),
                           ("snr", pairwise_neg_snr),
                           ("sdsdr", pairwise_neg_sdsdr)):
        jax_val = float(PITLossWrapper(pairwise, pit_from="pw_mtx")(
            jnp.asarray(est[None]), jnp.asarray(ref[None])))
        np_val = np_pit_neg_sdr(est.astype(np.float64),
                                ref.astype(np.float64), kind)
        # f32 (jax) vs f64 (numpy) — tolerance scales with the dB value
        assert abs(jax_val - np_val) < 1e-3 * max(1.0, abs(np_val)), (
            kind, jax_val, np_val)
    # swapped estimate rows give the same (permutation-invariant) value
    np_swap = np_pit_neg_sdr(est[::-1].astype(np.float64),
                             ref.astype(np.float64), "sisdr")
    np.testing.assert_allclose(
        np_swap, np_pit_neg_sdr(est.astype(np.float64),
                                ref.astype(np.float64), "sisdr"), rtol=1e-9)


def test_eval_reorders_under_configured_loss():
    """run_batched_eval derives the reorder metric from the configured PIT
    loss (reference test.py:56-58 reorders under loss_func)."""
    from rtfs_net_tpu.evaluation import _loss_sdr_type
    from rtfs_net_tpu.losses import (PITLossWrapper, pairwise_neg_sisdr,
                                     pairwise_neg_snr)
    from rtfs_net_tpu.losses.sdr import pairwise_neg_sdsdr

    assert _loss_sdr_type(PITLossWrapper(pairwise_neg_sisdr)) == "sisdr"
    assert _loss_sdr_type(PITLossWrapper(pairwise_neg_snr)) == "snr"
    assert _loss_sdr_type(PITLossWrapper(pairwise_neg_sdsdr)) == "sdsdr"
    assert _loss_sdr_type(lambda e, t: 0.0) == "sisdr"  # fallback


def test_np_reorder_two_sources(rng):
    from rtfs_net_tpu.evaluation import _np_reorder

    ref = rng.standard_normal((2, 3000)).astype(np.float32)
    est = ref[::-1] + 0.01 * rng.standard_normal((2, 3000)).astype(np.float32)
    out = _np_reorder(est, ref)
    # after reordering, row i matches source i
    for i in range(2):
        c_match = np.dot(out[i], ref[i]) / (np.linalg.norm(out[i]) * np.linalg.norm(ref[i]))
        assert c_match > 0.99, c_match


def test_stoi_golden_regression_table():
    """Frozen STOI/eSTOI over a deterministic degradation sweep — pins this
    implementation so refactors can't silently shift scores (the property
    tests above bound absolute behavior, the goldens bound drift). Mirrors
    the PESQ golden table in tests/test_native.py."""
    fs = 16000
    rng = np.random.default_rng(3)
    sig = np.zeros(int(fs * 4.0), np.float32)
    for i in range(5):
        s = int((0.1 + 0.8 * i) * fs)
        e = s + int(0.45 * fs)
        t = np.arange(e - s) / fs
        env = np.sin(np.pi * np.arange(e - s) / (e - s)) ** 0.5
        v = (np.sin(2 * np.pi * 220 * t) + 0.5 * np.sin(2 * np.pi * 440 * t)
             + 0.3 * rng.standard_normal(e - s)) * env
        sig[s:e] = v.astype(np.float32)

    nrng = np.random.default_rng(99)
    noise = nrng.standard_normal(len(sig)).astype(np.float32)
    sp = float(np.mean(sig ** 2))
    got = {"identity": stoi(sig, sig, fs)}
    for snr in (20, 10, 0, -5):
        npow = sp / (10 ** (snr / 10))
        deg = (sig + noise * np.sqrt(npow / np.mean(noise ** 2))).astype(np.float32)
        got[f"awgn_{snr}dB"] = stoi(sig, deg, fs)
        got[f"awgn_{snr}dB_ext"] = stoi(sig, deg, fs, extended=True)
    deg = np.convolve(sig, np.ones(5, np.float32) / 5, "same").astype(np.float32)
    got["lowpass_ma5"] = stoi(sig, deg, fs)
    pk = float(np.abs(sig).max())
    got["clip_30pct"] = stoi(sig, np.clip(sig, -0.3 * pk, 0.3 * pk), fs)

    golden = {
        "identity": 1.000000,
        "awgn_20dB": 0.990065,
        "awgn_20dB_ext": 0.947491,
        "awgn_10dB": 0.904169,
        "awgn_10dB_ext": 0.681835,
        "awgn_0dB": 0.578717,
        "awgn_0dB_ext": 0.259854,
        "awgn_-5dB": 0.436740,
        "awgn_-5dB_ext": 0.150355,
        "lowpass_ma5": 0.988940,
        "clip_30pct": 0.846871,
    }
    for k, v in golden.items():
        assert abs(got[k] - v) < 1e-4, (k, got[k], v)


def test_pesq_gated():
    from rtfs_net_tpu.metrics import pesq as pesq_fn
    x = np.random.default_rng(0).standard_normal(16000).astype(np.float32)
    v = pesq_fn(x, x, 16000)
    # native/pypesq present -> a score; absent -> NaN (eval must not crash)
    assert np.isnan(v) or -0.5 <= v <= 4.6
