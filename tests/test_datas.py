"""Data pipeline tests: wav IO vs scipy golden, dataset semantics, loader."""
import json
import os

import numpy as np
import pytest
from scipy.io import wavfile

from rtfs_net_tpu.datas import (
    AVSpeechDataset, DataLoader, get_preprocessing_pipelines, wavio,
)


def test_wavio_pcm16_roundtrip_and_ranged_read(rng, tmp_path):
    sr = 16000
    x = (rng.standard_normal(40000) * 0.3).clip(-1, 1).astype(np.float32)
    p = str(tmp_path / "a.wav")
    wavio.write(p, x, sr)
    # golden read via scipy
    sr2, golden = wavfile.read(p)
    assert sr2 == sr
    data, sr3 = wavio.read(p)
    np.testing.assert_allclose(data, golden.astype(np.float32) / 32768.0)
    # ranged read
    seg, _ = wavio.read(p, start=100, stop=1100)
    np.testing.assert_allclose(seg, data[100:1100])
    # info
    n, s, c = wavio.info(p)
    assert (n, s, c) == (40000, sr, 1)


def test_wavio_float32(rng, tmp_path):
    sr = 16000
    x = rng.standard_normal(1000).astype(np.float32)
    p = str(tmp_path / "f32.wav")
    wavfile.write(p, sr, x)  # scipy writes IEEE float
    data, sr2 = wavio.read(p)
    assert sr2 == sr
    np.testing.assert_allclose(data, x)


def _make_manifest(tmp_path, rng, n_utts=4, n_samples=40000, short=0):
    sr = 16000
    mix, s1, s2 = [], [], []
    for i in range(n_utts):
        L = 10000 if i < short else n_samples
        paths = []
        for name in ("mix", "s1", "s2"):
            p = str(tmp_path / f"{name}_{i}.wav")
            wavio.write(p, rng.standard_normal(L).astype(np.float32) * 0.1, sr)
            paths.append(p)
        mouths = []
        for name in ("m1", "m2"):
            mp = str(tmp_path / f"{name}_{i}.npz")
            np.savez_compressed(mp, data=(rng.random((50, 96, 96)) * 255).astype(np.uint8))
            mouths.append(mp)
        mix.append([paths[0], L])
        s1.append([paths[1], mouths[0], L])
        s2.append([paths[2], mouths[1], L])
    for name, data in (("mix", mix), ("s1", s1), ("s2", s2)):
        with open(tmp_path / f"{name}.json", "w") as f:
            json.dump(data, f)
    return str(tmp_path)


def test_dataset_n_src_1(rng, tmp_path):
    d = _make_manifest(tmp_path, rng, n_utts=3, short=1)
    ds = AVSpeechDataset(d, n_src=1, sample_rate=16000, segment=2.0)
    # 3 utts, 1 short dropped, x2 speakers
    assert len(ds) == 4
    mix, src, mouth, key = ds[0]
    assert mix.shape == (32000,)
    assert src.shape == (32000,)
    assert mouth.shape == (1, 50, 88, 88)
    assert isinstance(key, str)


def test_dataset_n_src_2_and_normalize(rng, tmp_path):
    d = _make_manifest(tmp_path, rng, n_utts=2)
    ds = AVSpeechDataset(d, n_src=2, sample_rate=16000, segment=2.0,
                         normalize_audio=True)
    mix, srcs, mouths, key = ds[0]
    assert mix.shape == (32000,)
    assert srcs.shape == (2, 32000)
    assert mouths.shape == (2, 50, 88, 88)
    assert abs(float(mix.mean())) < 1e-3  # normalized


def test_dataset_test_mode_full_length(rng, tmp_path):
    d = _make_manifest(tmp_path, rng, n_utts=2)
    ds = AVSpeechDataset(d, n_src=2, sample_rate=16000, segment=None)
    mix, srcs, mouths, key = ds[0]
    assert srcs.shape[1] == 40000  # full length in test mode


def test_dataset_audio_only(rng, tmp_path):
    d = _make_manifest(tmp_path, rng, n_utts=2)
    ds = AVSpeechDataset(d, n_src=1, sample_rate=16000, segment=2.0,
                         audio_only=True)
    out = ds[0]
    assert len(out) == 3  # mix, src, key


def test_transforms():
    pipes = get_preprocessing_pipelines()
    frames = (np.random.default_rng(0).random((20, 96, 96)) * 255).astype(np.float32)
    out_train = pipes["train"](frames)
    out_val = pipes["val"](frames)
    assert out_train.shape == (20, 88, 88)
    assert out_val.shape == (20, 88, 88)
    # val crop deterministic: center
    c = pipes["val"](frames)
    np.testing.assert_allclose(out_val, c)


def test_loader_process_workers_survive_sigterm(rng, tmp_path):
    """Preemption signals land on the whole process GROUP under SLURM/k8s.
    Pool workers must IGNORE SIGTERM (the parent's handler owns the
    preempt-checkpoint flow): a worker killed mid-epoch leaves a
    never-resolving in-flight task that would hang the fit loop past the
    preemption grace window."""
    import signal
    import threading

    d = _make_manifest(tmp_path, rng, n_utts=4)
    ds = AVSpeechDataset(d, n_src=1, sample_rate=16000, segment=2.0)
    dl = DataLoader(ds, batch_size=1, shuffle=False, num_workers=2,
                    worker_type="process")
    it = iter(dl)
    next(it)  # forces pool spawn + first in-flight tasks
    assert dl._pool is not None
    workers = list(dl._pool._pool)
    for proc in workers:
        os.kill(proc.pid, signal.SIGTERM)
    rest = []
    t = threading.Thread(target=lambda: rest.extend(it), daemon=True)
    t.start()
    t.join(60)
    assert not t.is_alive(), "loader hung after SIGTERM to pool workers"
    assert len(rest) == len(dl) - 1
    for proc in workers:  # same processes, still alive — no respawn
        assert proc.is_alive()
    dl.close()


def test_loader_pool_survives_sigterm_during_bootstrap(rng, tmp_path):
    """The race the initializer alone can't close: a group-delivered
    SIGTERM landing while a spawned worker is still bootstrapping (before
    _worker_init installs SIG_IGN) would kill it with the default
    disposition. The parent blocks the preemption signals around the
    spawn (the mask is inherited), so the signal stays pending until the
    worker's SIG_IGN discards it. Signal immediately after Pool() returns
    — squarely inside the ~100ms spawn-bootstrap window."""
    import signal

    d = _make_manifest(tmp_path, rng, n_utts=4)
    ds = AVSpeechDataset(d, n_src=1, sample_rate=16000, segment=2.0)
    dl = DataLoader(ds, batch_size=1, shuffle=False, num_workers=2,
                    worker_type="process")
    pool = dl._get_pool()
    workers = list(pool._pool)
    for proc in workers:
        os.kill(proc.pid, signal.SIGTERM)
    out = list(iter(dl))
    assert len(out) == len(dl)
    for proc in workers:  # same processes, still alive — no respawn
        assert proc.is_alive()
    dl.close()


def test_loader_process_workers_match_thread(rng, tmp_path):
    """worker_type='process' (the default for AV datasets — the npz+
    transform path is GIL-bound) returns the same batches as threads, and
    'auto' routes AV->process / audio-only->thread."""
    import os

    d = _make_manifest(tmp_path, rng, n_utts=3)
    ds = AVSpeechDataset(d, n_src=1, sample_rate=16000, segment=2.0)
    expect_av = "process" if (os.cpu_count() or 1) > 2 else "thread"
    assert DataLoader(ds, batch_size=2).worker_type == expect_av
    ds_a = AVSpeechDataset(d, n_src=1, sample_rate=16000, segment=2.0,
                           audio_only=True)
    assert DataLoader(ds_a, batch_size=2).worker_type == "thread"

    dl_t = DataLoader(ds, batch_size=2, shuffle=False, num_workers=2,
                      worker_type="thread")
    dl_p = DataLoader(ds, batch_size=2, shuffle=False, num_workers=2,
                      worker_type="process")
    bt = list(dl_t)
    bp = list(dl_p)
    assert len(bt) == len(bp)
    for (mt, st, mot, kt), (mp_, sp_, mop, kp) in zip(bt, bp):
        np.testing.assert_array_equal(mt, mp_)
        np.testing.assert_array_equal(st, sp_)
        assert kt == kp
        # mouths: RandomCrop/HFlip are rng-driven per worker — compare
        # shapes/dtype only
        assert mot.shape == mop.shape and mot.dtype == mop.dtype
    # pool persists across epochs
    bp2 = list(dl_p)
    assert len(bp2) == len(bp)
    dl_p.close()


def test_loader_batches_and_sharding(rng, tmp_path):
    d = _make_manifest(tmp_path, rng, n_utts=4)
    ds = AVSpeechDataset(d, n_src=1, sample_rate=16000, segment=2.0)  # 8 items
    dl = DataLoader(ds, batch_size=2, shuffle=True, num_workers=2)
    batches = list(dl)
    assert len(batches) == 4
    mix, src, mouth, keys = batches[0]
    assert mix.shape == (2, 32000)
    assert mouth.shape == (2, 1, 50, 88, 88)
    assert len(keys) == 2
    # 2-host sharding partitions disjointly
    dl0 = DataLoader(ds, batch_size=2, shuffle=False, shard_index=0, num_shards=2)
    dl1 = DataLoader(ds, batch_size=2, shuffle=False, shard_index=1, num_shards=2)
    assert len(dl0) == 2 and len(dl1) == 2


class _SlowDataset:
    """Each item sleeps far longer than the test budget — used to pin
    close() latency with workers mid-task. Module-level so spawn can
    unpickle it in the worker (the loader pickles the dataset by value,
    the class by reference)."""

    audio_only = False

    def __len__(self):
        return 8

    def __getitem__(self, i):
        import time

        time.sleep(300)
        return (np.zeros(4, np.float32),)


def test_loader_close_kills_busy_workers():
    """Regression (round-5 full-suite deadlock): pool workers ignore
    SIGTERM by design, so Pool.terminate()'s SIGTERM backstop is void —
    a worker mid-task (or one whose per-worker None sentinel was eaten
    by CPython's _help_stuff_finish inqueue drain) left terminate()'s
    internal join waiting forever. close() must SIGKILL surviving
    workers after a bounded grace window (NOT before terminate: a worker
    killed inside inqueue.get() dies holding the queue's reader
    semaphore and deadlocks _help_stuff_finish instead) and return
    promptly."""
    import threading
    import time

    dl = DataLoader(_SlowDataset(), batch_size=2, shuffle=False,
                    num_workers=2, worker_type="process", prefetch=1)
    it = iter(dl)
    # drive the generator from a side thread: the first next() spawns the
    # pool and blocks on the (forever-sleeping) first batch
    t = threading.Thread(target=lambda: next(it, None), daemon=True)
    t.start()
    deadline = time.time() + 60
    while dl._pool is None and time.time() < deadline:
        time.sleep(0.1)
    assert dl._pool is not None, "pool never spawned"
    while time.time() < deadline:
        if all(p.is_alive() for p in dl._pool._pool):
            break
        time.sleep(0.1)
    t0 = time.time()
    dl.close()
    assert time.time() - t0 < 30, "close() hung on busy SIGTERM-immune workers"
