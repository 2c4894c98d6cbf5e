"""Batched bucketed eval == serial eval, per-utterance (reference
``test.py:127-141`` evaluates batched at batch_size*2; round-1 here was a
serial batch-1 loop — this pins the batched engine to the serial
numbers)."""
import csv
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rtfs_net_tpu.evaluation import run_batched_eval, _pad_mouth
from rtfs_net_tpu.losses import PITLossWrapper, pairwise_neg_sisdr
from rtfs_net_tpu.metrics import ALLMetricsTracker
from rtfs_net_tpu.models import AVNet
from tests.test_system import TINY_AUDIONET

SR = 16000
LENGTHS = [1500, 1999, 2300, 3999, 1500, 2300, 700, 3999, 2300]


def _make_test_set(rng, with_mouths):
    samples = []
    for i, L in enumerate(LENGTHS):
        src = rng.standard_normal(L).astype(np.float32)
        mix = src + 0.5 * rng.standard_normal(L).astype(np.float32)
        if with_mouths:
            tv = -(-L * 25 // SR)
            mouth = rng.standard_normal((1, tv, 88, 88)).astype(np.float32)
            samples.append((mix, src, mouth, f"utt{i}.wav"))
        else:
            samples.append((mix, src, f"utt{i}.wav"))
    return samples


def _run(model, variables, test_set, video_apply, eval_bs, tmp_path, tag):
    path = os.path.join(tmp_path, f"metrics_{tag}.csv")
    metrics = ALLMetricsTracker(save_file=path)
    run_batched_eval(
        model=model, variables=variables, test_set=test_set, metrics=metrics,
        loss_func=PITLossWrapper(pairwise_neg_sisdr, pit_from="pw_mtx"),
        video_apply=video_apply, bucket=2000, eval_batch_size=eval_bs,
        sample_rate=SR, progress_every=0,
    )
    metrics.final()
    with open(path) as f:
        rows = {r["snt_id"]: r for r in csv.DictReader(f) if r["snt_id"]}
    return rows


def _rows_close(a, b):
    assert set(a) == set(b)
    for k in a:
        for col in ("si-snr", "si-snr_i", "sdr", "sdr_i", "stoi"):
            va, vb = float(a[k][col]), float(b[k][col])
            assert abs(va - vb) < 1e-2, (k, col, va, vb)


def test_batched_eval_matches_serial_audio_only(rng, tmp_path):
    conf = {**TINY_AUDIONET, "video_params": {}, "fusion_params": {},
            "video_bn_params": {}}
    model = AVNet(**conf)
    test_set = _make_test_set(rng, with_mouths=False)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 2000)), None)
    serial = _run(model, variables, test_set, None, 1, str(tmp_path), "serial")
    batched = _run(model, variables, test_set, None, 4, str(tmp_path), "batched")
    _rows_close(serial, batched)


def test_batched_eval_matches_serial_av(rng, tmp_path):
    model = AVNet(**TINY_AUDIONET)

    def video_apply(m):  # fake lip encoder: (B,1,TV,88,88) -> (B,16,TV)
        return jnp.swapaxes(m[:, 0, :, 0, :16], 1, 2)

    test_set = _make_test_set(rng, with_mouths=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2000)),
                           jnp.zeros((1, 16, 4)))
    serial = _run(model, variables, test_set, video_apply, 1, str(tmp_path), "serial")
    batched = _run(model, variables, test_set, video_apply, 4, str(tmp_path), "batched")
    _rows_close(serial, batched)


def test_batched_eval_uint8_mouths_match_float(rng, tmp_path):
    """device_normalize path: raw uint8 frames uploaded + normalized
    on-device produce (near-)identical metrics to host-normalized float
    frames (1 byte/pixel instead of 4 on the host->device transfer)."""
    from rtfs_net_tpu.datas.transform import (MOUTH_MEAN, MOUTH_STD,
                                              normalize_mouths)

    model = AVNet(**TINY_AUDIONET)

    def encode(norm_frames):  # fake lip encoder on normalized frames
        return jnp.swapaxes(norm_frames[:, 0, :, 0, :16], 1, 2)

    video_apply_float = encode
    video_apply_u8 = lambda m: encode(normalize_mouths(m))

    raw = [(np.clip(rng.random((1, -(-L * 25 // SR), 88, 88)) * 255, 0, 255)
            .astype(np.uint8)) for L in LENGTHS]
    float_set, u8_set = [], []
    for i, L in enumerate(LENGTHS):
        src = rng.standard_normal(L).astype(np.float32)
        mix = src + 0.5 * rng.standard_normal(L).astype(np.float32)
        norm = ((raw[i].astype(np.float32) - MOUTH_MEAN) / MOUTH_STD)
        float_set.append((mix, src, norm, f"utt{i}.wav"))
        u8_set.append((mix, src, raw[i], f"utt{i}.wav"))

    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2000)),
                           jnp.zeros((1, 16, 4)))

    def run(test_set, va, tag):
        path = os.path.join(str(tmp_path), f"m_{tag}.csv")
        metrics = ALLMetricsTracker(save_file=path)
        run_batched_eval(model=model, variables=variables, test_set=test_set,
                         metrics=metrics,
                         loss_func=PITLossWrapper(pairwise_neg_sisdr, pit_from="pw_mtx"),
                         video_apply=va, bucket=2000, eval_batch_size=4,
                         sample_rate=SR, progress_every=0)
        metrics.final()
        with open(path) as f:
            return {r["snt_id"]: r for r in csv.DictReader(f) if r["snt_id"]}

    a = run(float_set, video_apply_float, "float")
    b = run(u8_set, video_apply_u8, "u8")
    _rows_close(a, b)


def test_pad_mouth():
    m = np.arange(2 * 3 * 2 * 2, dtype=np.float32).reshape(2, 3, 2, 2)
    p = _pad_mouth(m, 5)
    assert p.shape == (2, 5, 2, 2)
    np.testing.assert_array_equal(p[:, :3], m)
    np.testing.assert_array_equal(p[:, 3:], 0)
    c = _pad_mouth(m, 2)
    assert c.shape == (2, 2, 2, 2)
