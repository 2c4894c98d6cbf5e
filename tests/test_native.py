"""Native extension (C++): P.862 PESQ scorer + crc32c."""
import numpy as np
import pytest

from rtfs_net_tpu._native import load_native

nat = load_native()  # builds on demand with the baked-in toolchain
if nat is None:
    pytest.skip("native ext unavailable and no toolchain to build it",
                allow_module_level=True)


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


def test_crude_align_exact_delay_recovery(rng):
    """The two-stage crude alignment (4 ms log-energy envelope correlation
    -> sample-resolution refinement, P.862 crude_align structure) recovers
    bulk delays exactly — including delays that are NOT a multiple of the
    4 ms envelope frame, which only the refinement stage can resolve."""
    x = _speech(rng)
    n = len(x)
    for lag in (0, 480, 123, 64):
        deg = np.concatenate([np.zeros(lag, np.float32), x])[:n]
        assert nat.align_delay(x, deg, 16000) == lag
    # degraded LEADS the reference (negative delay)
    deg = np.concatenate([x[300:], np.zeros(300, np.float32)])
    assert nat.align_delay(x, deg, 16000) == -300
    # with additive noise the peak may move by a sample or two, no more
    noise = rng.standard_normal(n).astype(np.float32)
    scale = np.linalg.norm(x) / (np.linalg.norm(noise) * 10 ** (10 / 20))
    deg = np.concatenate(
        [np.zeros(480, np.float32), x + scale * noise])[:n].astype(np.float32)
    assert abs(nat.align_delay(x, deg, 16000) - 480) <= 2


def test_crude_align_periodic_signal(rng):
    """A strongly periodic waveform has an ambiguous raw autocorrelation
    (peaks at every pitch period); the envelope stage disambiguates via
    the signal's aperiodic energy contour (the reason ITU crude_align
    correlates frame energies, not waveforms)."""
    sr = 16000
    t = np.arange(2 * sr) / sr
    env = np.clip(np.sin(2 * np.pi * 1.7 * t), 0, None)  # syllabic bursts
    x = (np.sin(2 * np.pi * 500 * t) * env).astype(np.float32)  # period 32
    for lag in (480, 1000, 333):  # none a multiple of the 32-sample period
        deg = np.concatenate([np.zeros(lag, np.float32), x])[:len(x)]
        assert nat.align_delay(x, deg, sr) == lag


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


# ---------------------------------------------------------------------------
# Utterance-based fine time alignment (P.862 utterance realignment) + frozen
# golden regressions. The Bark tables are formula-derived (pesq_core.cpp
# header), so scores are not guaranteed bit-identical to the ITU reference
# code; the goldens pin THIS implementation so refactors can't silently
# shift the MOS scale (deviation envelope: the property tests above bound
# absolute behavior, the goldens bound drift).


def _speech_like(seed=3, fs=16000, dur=4.0, n_bursts=5):
    """Deterministic speech-like signal: amplitude-modulated tone+noise
    bursts separated by silences (so the crude VAD finds real utterances)."""
    rng = np.random.default_rng(seed)
    sig = np.zeros(int(fs * dur), np.float32)
    bursts = []
    for i in range(n_bursts):
        s = int((0.1 + 0.8 * i) * fs)
        e = s + int(0.45 * fs)
        t = np.arange(e - s) / fs
        env = np.sin(np.pi * np.arange(e - s) / (e - s)) ** 0.5
        v = (np.sin(2 * np.pi * 220 * t) + 0.5 * np.sin(2 * np.pi * 440 * t)
             + 0.3 * rng.standard_normal(e - s)) * env
        sig[s:e] = v.astype(np.float32)
        bursts.append((s, e))
    return sig, bursts


def test_pesq_utterance_realignment_recovers_shifted_utterance():
    """Shift ONE utterance by 30 ms (a packet-loss-style delay change):
    with per-utterance realignment the score stays near-perfect (pure
    delay is not distortion under P.862); the crude whole-signal path
    penalizes it by ~1 MOS."""
    fs = 16000
    sig, bursts = _speech_like()
    deg = sig.copy()
    s, e = bursts[2]
    deg[s:e] = 0.0
    deg[s + 480:e + 480] = sig[s:e]
    aligned = nat.pesq(sig, deg, fs, 1)
    crude = nat.pesq(sig, deg, fs, 0)
    assert aligned > 4.4, aligned
    assert crude < aligned - 0.8, (aligned, crude)


def test_pesq_utterance_split_recovers_mid_utterance_delay_jump():
    """A delay change INSIDE one continuous utterance (codec time warping:
    the second half of the speech arrives 30 ms late) is recovered by the
    recursive utterance split — a single per-utterance delay can only
    align one half."""
    fs = 16000
    rng = np.random.default_rng(5)
    n = int(1.6 * fs)
    t = np.arange(n) / fs
    env = np.sin(np.pi * np.arange(n) / n) ** 0.25  # one continuous burst
    sig = ((np.sin(2 * np.pi * 220 * t) + 0.5 * np.sin(2 * np.pi * 440 * t)
            + 0.3 * rng.standard_normal(n)) * env).astype(np.float32)
    pad = np.zeros(fs // 2, np.float32)
    ref = np.concatenate([pad, sig, pad])
    h = len(pad) + n // 2
    # second half arrives 480 samples (30 ms) late
    deg = np.concatenate([ref[:h], np.zeros(480, np.float32), ref[h:]])
    deg = deg[:len(ref)]
    split = nat.pesq(ref, deg, fs, 1)
    crude = nat.pesq(ref, deg, fs, 0)
    assert split > 3.9, (split, crude)
    assert split > crude + 0.5, (split, crude)


def test_pesq_golden_regression_table():
    """Frozen MOS over a deterministic degradation sweep — catches silent
    scale drift from any refactor of the scorer."""
    fs = 16000
    sig, bursts = _speech_like()
    rng = np.random.default_rng(99)
    noise = rng.standard_normal(len(sig)).astype(np.float32)
    sp = float(np.mean(sig ** 2))

    got = {"identity": nat.pesq(sig, sig, fs)}
    for snr in (30, 20, 10, 0):
        npow = sp / (10 ** (snr / 10))
        deg = (sig + noise * np.sqrt(npow / np.mean(noise ** 2))).astype(np.float32)
        got[f"awgn_{snr}dB"] = nat.pesq(sig, deg, fs)
    deg = np.convolve(sig, np.ones(5, np.float32) / 5, "same").astype(np.float32)
    got["lowpass_ma5"] = nat.pesq(sig, deg, fs)
    pk = float(np.abs(sig).max())
    got["clip_30pct"] = nat.pesq(sig, np.clip(sig, -0.3 * pk, 0.3 * pk), fs)
    deg = sig.copy()
    s, e = bursts[2]
    deg[s:e] = 0.0
    deg[s + 480:e + 480] = sig[s:e]
    got["utt3_shift30ms"] = nat.pesq(sig, deg, fs)
    got["utt3_shift30ms_crude"] = nat.pesq(sig, deg, fs, 0)

    golden = {
        "identity": 4.500000,
        "awgn_30dB": 4.429005,
        "awgn_20dB": 4.278503,
        "awgn_10dB": 3.886220,
        "awgn_0dB": 3.211834,
        "lowpass_ma5": 4.393844,
        "clip_30pct": 4.034036,
        "utt3_shift30ms": 4.498237,
        "utt3_shift30ms_crude": 3.486533,
    }
    for k, v in golden.items():
        assert abs(got[k] - v) < 5e-3, (k, got[k], v)
