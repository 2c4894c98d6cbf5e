#!/usr/bin/env python
"""Benchmark the differentiable Pallas SRU backend vs the scan backward.

The train-step kernel (`ops/pallas/sru_train.py`) is the default for
lane-aligned folded batches since round 5 (see ops/rnn.py dispatch;
RTFS_PALLAS_SRU_TRAIN=0/1 overrides); this script times the full
RTFS-4 train step (fwd + PIT-SNR + grads + AdamW, bf16 mixed precision,
per-block remat) with both backends at the reference per-GPU batch (4)
and the measured per-chip sweet spot (16).

    python scripts/bench_sru_train.py [--iters 6]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--batches", type=str, default="4,16")
    args = ap.parse_args()

    from rtfs_net_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import numpy as np
    import jax
    import jax.numpy as jnp
    import yaml

    from rtfs_net_tpu.models import AVNet
    from rtfs_net_tpu.losses import (PITLossWrapper, pairwise_neg_snr,
                                     pairwise_neg_sisdr)
    from rtfs_net_tpu.system import System, make_optimizer
    from rtfs_net_tpu.utils.profiling import timed

    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "..", "rtfs_net_tpu", "configs",
                           "lrs2_RTFSNet_4_layer.yaml")) as f:
        conf = yaml.safe_load(f)
    model = AVNet(**conf["audionet"])

    L, TV = 32000, 50
    rng = np.random.default_rng(0)
    mix_pool = [jnp.asarray(rng.standard_normal((16, L)).astype(np.float32))
                for _ in range(4)]
    mouth = jnp.asarray(rng.standard_normal((16, 512, TV)).astype(np.float32) * 0.1)

    system = System(
        model, make_optimizer(**conf["optim"]),
        {"train": PITLossWrapper(pairwise_neg_snr),
         "val": PITLossWrapper(pairwise_neg_sisdr)},
        compute_dtype=jnp.bfloat16,
    )
    state = system.init_state(jax.random.PRNGKey(0), mix_pool[0][:1], mouth[:1])
    tkey = jax.random.PRNGKey(1)

    def bench(TB, pallas_train):
        os.environ["RTFS_PALLAS_SRU_TRAIN"] = "1" if pallas_train else "0"
        # the env toggle is read at trace time — force a fresh trace
        step = jax.jit(system.train_step)
        tmouth = mouth[:TB]

        # NOTE: the TrainState is intentionally FROZEN across timed
        # iterations (same convention as bench.py / bench_zoo.py): once
        # `timed` jits `run`, only the mixture varies per call, so both
        # backends measure the identical step from the identical state —
        # optimizer state does not advance and is not meant to.
        def run(m):
            _, metrics = step(state, (m, m[:, None, :], tmouth), tkey)
            return metrics["loss"]

        loss0 = float(run(mix_pool[0][:TB]))  # compile + numeric probe
        stats = timed(
            run,
            make_args=lambda i: (mix_pool[i % len(mix_pool)][:TB]
                                 + float(i) * 1e-6,),
            iters=args.iters,
        )
        return stats["min_ms"], loss0

    for TB in [int(b) for b in args.batches.split(",")]:
        ms_scan, loss_scan = bench(TB, False)
        ms_pal, loss_pal = bench(TB, True)
        print(f"B={TB}: scan {ms_scan:.1f} ms/step | pallas {ms_pal:.1f} ms/step "
              f"({ms_scan / ms_pal:.2f}x) | loss scan={loss_scan:.4f} "
              f"pallas={loss_pal:.4f}")


if __name__ == "__main__":
    main()
