"""Native extension (C++): P.862 PESQ scorer + crc32c."""
import numpy as np
import pytest

nat = pytest.importorskip("rtfs_net_tpu_native",
                          reason="native ext not built (native/setup.py)")


def _speech(rng, n=32000, sr=16000):
    """Harmonic-rich speech-like test signal: FM fundamental ~130 Hz with
    formant-weighted harmonics (energy inside P.862's 350-3250 Hz level-
    alignment band) and a syllabic envelope with silence gaps."""
    t = np.arange(n) / sr
    f0 = 120 + 30 * np.sin(2 * np.pi * 3 * t)
    phase = 2 * np.pi * np.cumsum(f0) / sr
    env = np.clip(np.sin(2 * np.pi * 2.5 * t), 0, None)
    x = np.zeros(n)
    for h in range(1, 25):
        fh = h * 130.0
        if fh >= sr / 2:
            break
        w = (np.exp(-0.5 * ((fh - 500) / 300) ** 2)
             + 0.7 * np.exp(-0.5 * ((fh - 1500) / 400) ** 2)
             + 0.4 * np.exp(-0.5 * ((fh - 2500) / 500) ** 2))
        x += w * np.sin(h * phase)
    return (x * env).astype(np.float32)


def test_pesq_identity_and_level_alignment(rng):
    x = _speech(rng)
    assert nat.pesq(x, x, 16000) == 4.5
    # P.862 aligns both signals to 1e7 band power: pure gain is invisible
    assert nat.pesq(x, (0.2 * x).astype(np.float32), 16000) == 4.5
    assert nat.pesq(x, (5.0 * x).astype(np.float32), 16000) == 4.5


def test_pesq_monotone_in_noise_operating_range(rng):
    """Monotone over the 40..0 dB SNR range separation estimates live in,
    with scores in the published P.862 ballpark for noisy speech."""
    x = _speech(rng)
    noise = rng.standard_normal(len(x)).astype(np.float32)
    scores = []
    for snr in (40, 30, 20, 10, 5, 0):
        scale = np.linalg.norm(x) / (np.linalg.norm(noise) * 10 ** (snr / 20))
        scores.append(nat.pesq(x, (x + scale * noise).astype(np.float32), 16000))
    assert all(a > b for a, b in zip(scores, scores[1:])), scores
    assert scores[1] > 3.8, scores   # 30 dB
    assert scores[-1] < 2.6, scores  # 0 dB


def test_pesq_penalizes_clipping(rng):
    x = _speech(rng)
    peak = float(np.abs(x).max())
    clipped = np.clip(x * 4, -peak / 2, peak / 2).astype(np.float32) / 4
    v = nat.pesq(x, clipped, 16000)
    assert 1.5 < v < 4.2, v


def test_pesq_delay_compensation(rng):
    """A 50 ms bulk delay is compensated by the cross-correlation
    alignment stage; the score stays near the aligned one."""
    x = _speech(rng)
    noise = rng.standard_normal(len(x)).astype(np.float32)
    scale = np.linalg.norm(x) / (np.linalg.norm(noise) * 10 ** (20 / 20))
    deg = (x + scale * noise).astype(np.float32)
    aligned = nat.pesq(x, deg, 16000)
    shifted = np.concatenate([np.zeros(800, np.float32), deg])
    delayed = nat.pesq(x, shifted[:len(x)], 16000)
    assert abs(aligned - delayed) < 0.3, (aligned, delayed)


def test_pesq_8k(rng):
    x = _speech(rng, n=16000, sr=8000)
    assert nat.pesq(x, x, 8000) == 4.5
    noise = rng.standard_normal(len(x)).astype(np.float32)
    scale = np.linalg.norm(x) / (np.linalg.norm(noise) * 10 ** (10 / 20))
    v = nat.pesq(x, (x + scale * noise).astype(np.float32), 8000)
    assert 1.5 < v < 4.0, v


def test_pesq_via_dispatcher(rng):
    from rtfs_net_tpu.metrics import pesq

    x = _speech(rng)
    assert pesq(x, x, 16000) == 4.5


def test_crc32c_matches_python():
    from rtfs_net_tpu.system.tb_writer import crc32c_py

    for blob in (b"", b"123456789", bytes(range(256)) * 7):
        assert nat.crc32c(blob) == crc32c_py(blob)
