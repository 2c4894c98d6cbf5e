"""Batched, bucketed, multi-chip evaluation engine.

The reference evaluates with a DataLoader at ``batch_size*2``
(reference ``test.py:127-141``); round 1 here ran a serial batch-1
Python loop on one chip. This engine restores batched throughput under
XLA's static shapes:

  * utterances are grouped by padded length (``bucket``-sample
    granularity; audio zero-padded, mouth frames zero-padded to the
    matching 25 fps count) — one compile per distinct padded shape;
  * groups run as fixed-size batches of ``eval_batch_size`` (short final
    batches repeat the last row so every batch hits the same compiled
    executable);
  * batches are sharded row-wise over the local device mesh
    (``jax.sharding`` data axis), params replicated — eval scales over
    every chip the way training does;
  * metrics stay PER-UTTERANCE and UNPADDED: rows are cropped back to
    their true length before PIT reordering and scoring, so numbers are
    identical to the serial loop (``tests/test_batched_eval.py``);
  * per-utterance scoring (PIT reorder + SI-SNR/SDR/PESQ/STOI + wav
    dumps) runs in HOST WORKER THREADS in pure numpy/C++, overlapped with
    the device computing the next batch — through the TPU tunnel, eager
    per-op jax metric math was the dominant eval cost, not the model.
"""
from __future__ import annotations

import itertools
import os
import threading
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from typing import Any, Callable, Dict, List, Optional

import numpy as np

from .metrics.allwrapper import _np_neg_sdr


def _loss_sdr_type(loss_func) -> str:
    """SDR flavor of the configured PIT eval loss, so reordering happens
    under the same objective the reference reorders with
    (``loss_func(..., return_ests=True)``, reference test.py:56-58) while
    staying in the fast numpy host path. Falls back to sisdr (the
    reference's eval loss) when the loss isn't a wrapped pairwise SDR."""
    inner = getattr(loss_func, "loss_func", loss_func)
    kw = getattr(inner, "keywords", None) or {}
    return kw.get("sdr_type", "sisdr")


def _np_reorder(est: np.ndarray, src: np.ndarray,
                sdr_type: str = "sisdr") -> np.ndarray:
    """Reorder estimate rows to the PIT-best permutation vs the sources
    (reference test.py:56-58 return_ests reorder)."""
    n_src = src.shape[0]
    if n_src == 1:
        return est
    pairwise = np.empty((n_src, n_src))
    for i in range(n_src):
        for j in range(n_src):
            pairwise[i, j] = _np_neg_sdr(est[i].astype(np.float64),
                                         src[j].astype(np.float64), sdr_type)
    best_perm = min(itertools.permutations(range(n_src)),
                    key=lambda p: np.mean([pairwise[i, pi]
                                           for i, pi in enumerate(p)]))
    # est[i] matches src[best_perm[i]] -> place est rows in source order
    out = np.empty_like(est)
    for i, pi in enumerate(best_perm):
        out[pi] = est[i]
    return out


@dataclass
class _Record:
    idx: int
    mix: np.ndarray        # (L,)
    sources: np.ndarray    # (n_src, L)
    mouths: Optional[np.ndarray]
    key: str
    length: int


def _pad_mouth(mouth: np.ndarray, tv: int) -> np.ndarray:
    """Pad (or crop) the frame axis (-3) to ``tv`` frames. Float frames
    (host-normalized) pad with 0.0; uint8 frames (device-normalize path)
    pad with the mean pixel so both normalize to the same zero frame."""
    t = mouth.shape[-3]
    if t == tv:
        return mouth
    if t > tv:
        sl = [slice(None)] * mouth.ndim
        sl[-3] = slice(0, tv)
        return mouth[tuple(sl)]
    pad = [(0, 0)] * mouth.ndim
    pad[-3] = (0, tv - t)
    if mouth.dtype == np.uint8:
        from .datas.transform import MOUTH_MEAN

        return np.pad(mouth, pad, constant_values=int(round(MOUTH_MEAN)))
    return np.pad(mouth, pad)


def run_batched_eval(
    model,
    variables,
    test_set,
    metrics,
    loss_func,
    video_apply: Optional[Callable],
    bucket: int,
    eval_batch_size: int,
    sample_rate: int,
    n_save_ex: int = 0,
    examples_dir: Optional[str] = None,
    fps: int = 25,
    progress_every: int = 50,
    metric_workers: int = 8,
) -> None:
    import jax
    import jax.numpy as jnp

    from .datas import wavio
    from .parallel import make_mesh, batch_sharded, replicated

    mesh = make_mesh(batch_size=eval_batch_size)
    shd = batch_sharded(mesh)
    rep = replicated(mesh)
    variables = jax.device_put(variables, rep)

    fwd_cache: Dict[Any, Callable] = {}

    def fwd(mix_b, emb_b):
        key = (mix_b.shape, None if emb_b is None else tuple(emb_b.shape))
        if key not in fwd_cache:
            fwd_cache[key] = jax.jit(lambda v, m, e: model.apply(v, m, e))
        return fwd_cache[key](variables, mix_b, emb_b)

    n_done = 0
    done_lock = threading.Lock()
    pool = ThreadPoolExecutor(max_workers=max(1, metric_workers))
    futures = []

    reorder_sdr = _loss_sdr_type(loss_func)

    def score(r: _Record, est: np.ndarray):
        nonlocal n_done
        est = _np_reorder(est, r.sources, reorder_sdr)
        metrics(mix=r.mix, clean=r.sources, estimate=est, key=r.key,
                sample_rate=sample_rate)
        if examples_dir and r.idx < n_save_ex:
            wavio.write(os.path.join(examples_dir, f"{r.idx}_est.wav"),
                        est[0], sample_rate)
            wavio.write(os.path.join(examples_dir, f"{r.idx}_gt.wav"),
                        r.sources[0], sample_rate)
            wavio.write(os.path.join(examples_dir, f"{r.idx}_mix.wav"),
                        r.mix, sample_rate)
        with done_lock:
            n_done += 1
            count = n_done
        if progress_every and count % progress_every == 0:
            print(f"[{count}/{len(test_set)}] {metrics.get_mean()}")

    n_dev = mesh.devices.size

    def flush(pad_len: int, recs: List[_Record]):
        # partial batches round up to n_dev x next-power-of-two rows, not
        # the full eval batch: a fragmented bucket tail costs <=2x its
        # utterances (at most log2 executables per bucket shape, all
        # cached) while staying shardable over the mesh
        per_dev = 1
        while per_dev * n_dev < len(recs):
            per_dev *= 2
        bs = min(per_dev * n_dev, eval_batch_size)
        rows = recs + [recs[-1]] * (bs - len(recs))
        mix_b = np.stack([np.pad(r.mix, (0, pad_len - r.length)) for r in rows])
        mix_b = jax.device_put(jnp.asarray(mix_b), shd)
        emb_b = None
        if video_apply is not None and rows[0].mouths is not None:
            tv = -(-pad_len * fps // sample_rate)
            mouth_b = np.stack([_pad_mouth(r.mouths, tv) for r in rows])
            # uint8 frames upload at 1 byte/pixel (device_normalize
            # pipelines); video_apply normalizes on-device
            if mouth_b.dtype != np.uint8:
                mouth_b = mouth_b.astype(np.float32)
            mouth_b = jax.device_put(jnp.asarray(mouth_b), shd)
            emb_b = video_apply(mouth_b)
        est_b = np.asarray(fwd(mix_b, emb_b))
        # hand scoring to the worker pool; the device starts the next batch
        for i, r in enumerate(recs):
            futures.append(pool.submit(score, r, est_b[i][:, : r.length]))

    pending: Dict[int, List[_Record]] = {}
    for idx in range(len(test_set)):
        sample = test_set[idx]
        mix, sources = np.asarray(sample[0]), np.asarray(sample[1])
        mouths = np.asarray(sample[2]) if len(sample) > 3 else None
        key = sample[3] if len(sample) > 3 else sample[2]
        if sources.ndim == 1:
            sources = sources[None]
        length = mix.shape[-1]
        pad_len = -(-length // bucket) * bucket
        rec = _Record(idx, mix, sources, mouths, key, length)
        pending.setdefault(pad_len, []).append(rec)
        if len(pending[pad_len]) == eval_batch_size:
            flush(pad_len, pending.pop(pad_len))

    for pad_len in sorted(pending):
        flush(pad_len, pending[pad_len])

    for f in futures:
        f.result()  # propagate worker exceptions
    pool.shutdown()
