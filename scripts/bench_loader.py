#!/usr/bin/env python
"""Host data-loader throughput benchmark (VERDICT r2 #6).

Builds a synthetic ON-DISK dataset (real wav files + compressed mouth-npz
tracks + {mix,s1,s2}.json manifests — the exact format the manifest
builders emit), then measures `datas.loader.DataLoader` end-to-end decode
throughput (ranged WAV read + npz inflate + video transform + collate)
over worker-count and pipeline variants.

The number that matters: utt/s must exceed the device's training demand
(measured 138 utt/s/chip at the B=16 sweet spot, 73 utt/s at the
reference's B=4 — DESIGN.md). Worker scaling is only meaningful on
multi-core hosts (this dev box has nproc=1 — the `inproc` row is the
honest per-core decode rate there).

    python scripts/bench_loader.py [--n 256] [--workers 1 4 8 16]
"""
import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from rtfs_net_tpu.datas import AVSpeechDataset, wavio
from rtfs_net_tpu.datas.loader import DataLoader


def make_dataset(root: str, n: int, seconds: float = 3.0, fps: int = 25,
                 sr: int = 16000) -> str:
    rng = np.random.default_rng(0)
    L = int(seconds * sr)
    tv = int(seconds * fps)
    mix, s1, s2 = [], [], []
    for i in range(n):
        paths = []
        for name in ("mix", "s1", "s2"):
            p = os.path.join(root, f"{name}_{i}.wav")
            wavio.write(p, rng.standard_normal(L).astype(np.float32) * 0.1, sr)
            paths.append(p)
        mouths = []
        for name in ("m1", "m2"):
            mp = os.path.join(root, f"{name}_{i}.npz")
            # realistic mouth track: smooth-ish uint8, compresses like video
            frames = (rng.random((tv, 96, 96)) * 48 + 100).astype(np.uint8)
            np.savez_compressed(mp, data=frames)
            mouths.append(mp)
        mix.append([paths[0], L])
        s1.append([paths[1], mouths[0], L])
        s2.append([paths[2], mouths[1], L])
    for name, data in (("mix", mix), ("s1", s1), ("s2", s2)):
        with open(os.path.join(root, f"{name}.json"), "w") as f:
            json.dump(data, f)
    return root


def run_epoch(loader) -> float:
    """One full epoch through the loader; returns utterances/second."""
    n_utts = 0
    t0 = time.perf_counter()
    for batch in loader:
        n_utts += batch[0].shape[0]
    dt = time.perf_counter() - t0
    return n_utts / dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=256,
                   help="wav files (x2 speakers = 2n utterances/epoch)")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--workers", type=int, nargs="+", default=[1, 4, 8, 16])
    p.add_argument("--keep-dir", default=None,
                   help="reuse/create the dataset here instead of a tempdir")
    args = p.parse_args()

    ctx = None
    if args.keep_dir:
        root = args.keep_dir
        os.makedirs(root, exist_ok=True)
        if not os.path.exists(os.path.join(root, "mix.json")):
            make_dataset(root, args.n)
    else:
        ctx = tempfile.TemporaryDirectory()
        root = make_dataset(ctx.name, args.n)

    results = {}
    for dn, kwargs in (
        ("av_float", dict(audio_only=False)),
        ("av_uint8", dict(audio_only=False, device_normalize_video=True)),
        ("audio_only", dict(audio_only=True)),
    ):
        ds = AVSpeechDataset(root, n_src=1, sample_rate=16000, segment=2.0,
                             normalize_audio=False, **kwargs)
        # raw per-core decode rate, no loader machinery
        n_probe = min(64, len(ds))
        ds[0]
        t0 = time.perf_counter()
        for i in range(n_probe):
            ds[i]
        inproc = n_probe / (time.perf_counter() - t0)
        results[f"{dn}_inproc"] = round(inproc, 1)
        print(f"{dn:12s} in-proc       {inproc:8.1f} utt/s", flush=True)
        for w in args.workers:
            loader = DataLoader(ds, batch_size=args.batch_size, shuffle=True,
                                num_workers=w, drop_last=True)
            # warm epoch: page cache + worker spawn/import (paid once per
            # training run, not per epoch — the pool persists)
            run_epoch(loader)
            ups = run_epoch(loader)
            loader.close()
            results[f"{dn}_w{w}"] = round(ups, 1)
            print(f"{dn:12s} workers={w:3d}  {ups:8.1f} utt/s "
                  f"[{loader.worker_type}]", flush=True)

    best_av = max(v for k, v in results.items() if k.startswith("av_"))
    results["nproc"] = os.cpu_count()
    print(json.dumps({
        "metric": "loader_utt_per_s",
        "best_av": best_av,
        "train_demand_b16": 138.0,
        "headroom_x": round(best_av / 138.0, 2),
        **results,
    }))
    if ctx is not None:
        ctx.cleanup()


if __name__ == "__main__":
    main()
