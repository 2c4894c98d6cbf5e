"""Native extension (C++): PESQ-style scorer + crc32c."""
import numpy as np
import pytest

nat = pytest.importorskip("rtfs_net_tpu_native",
                          reason="native ext not built (native/setup.py)")


def _speech(rng, n=32000, sr=16000):
    t = np.arange(n) / sr
    f0 = 120 + 30 * np.sin(2 * np.pi * 3 * t)
    env = np.clip(np.sin(2 * np.pi * 2.5 * t), 0, None)
    return (np.sin(2 * np.pi * np.cumsum(f0) / sr) * env).astype(np.float32)


def test_pesq_identity_and_scale_invariance(rng):
    x = _speech(rng)
    assert nat.pesq(x, x, 16000) == 4.5
    assert nat.pesq(x, (0.2 * x).astype(np.float32), 16000) > 4.4


def test_pesq_monotone_in_noise_operating_range(rng):
    """Monotone over the 30..0 dB SNR range separation estimates live in.
    (Below 0 dB the loudness-domain compression flattens the score — a
    documented limitation of this estimator vs the ITU reference code.)"""
    x = _speech(rng)
    noise = rng.standard_normal(len(x)).astype(np.float32)
    scores = []
    for snr in (30, 20, 10, 5, 0):
        scale = np.linalg.norm(x) / (np.linalg.norm(noise) * 10 ** (snr / 20))
        scores.append(nat.pesq(x, (x + scale * noise).astype(np.float32), 16000))
    assert all(a > b for a, b in zip(scores, scores[1:])), scores
    assert scores[0] > 3.8 and scores[-1] < 2.0


def test_pesq_penalizes_clipping(rng):
    x = _speech(rng)
    clipped = (np.clip(x * 4, -0.5, 0.5) / 4).astype(np.float32)
    v = nat.pesq(x, clipped, 16000)
    assert 2.0 < v < 4.2


def test_pesq_8k(rng):
    x = _speech(rng, n=16000, sr=8000)
    assert nat.pesq(x, x, 8000) == 4.5


def test_pesq_via_dispatcher(rng):
    from rtfs_net_tpu.metrics import pesq

    x = _speech(rng)
    assert pesq(x, x, 16000) == 4.5


def test_crc32c_matches_python():
    from rtfs_net_tpu.system.tb_writer import crc32c_py

    for blob in (b"", b"123456789", bytes(range(256)) * 7):
        assert nat.crc32c(blob) == crc32c_py(blob)
