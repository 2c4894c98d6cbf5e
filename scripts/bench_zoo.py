"""Zoo benchmark: serving AND training for all four headline configs on
the real chip (vs the paper's published per-utterance GPU latency).

Serving: bf16 forward at batch 128 (measured throughput-optimal on v5e).
Training: full train step (fwd + PIT-SNR + grads + AdamW) bf16 mixed
precision with per-block remat at the reference's per-GPU batch of 4 AND
at the measured per-chip sweet spot of 16 (DESIGN.md). Run from anywhere:

    python scripts/bench_zoo.py [--serve-only|--train-only]
"""
import argparse
import os
import sys

import numpy as np
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)

from rtfs_net_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import jax
import jax.numpy as jnp

from rtfs_net_tpu.losses import PITLossWrapper, pairwise_neg_snr, pairwise_neg_sisdr
from rtfs_net_tpu.models import AVNet
from rtfs_net_tpu.system import System, make_optimizer
from rtfs_net_tpu.utils.profiling import timed

ZOO = [("lrs2_RTFSNet_4_layer", 57.8), ("lrs2_RTFSNet_6_layer", 64.7),
       ("lrs2_RTFSNet_12_layer", 109.9), ("lrs2_CTCNet_16_layer", 122.7)]


def bench_serve(model, pool, mouth, B):
    from rtfs_net_tpu.models import for_inference

    v = jax.jit(model.init)(jax.random.PRNGKey(0), pool[0][:1], mouth[:1])
    smodel = for_inference(model)
    fwd = jax.jit(lambda vv, m, mo: smodel.apply(
        vv, m.astype(jnp.bfloat16), mo.astype(jnp.bfloat16)).astype(jnp.float32))
    fwd(v, pool[0], mouth)
    st = timed(lambda m: fwd(v, m, mouth),
               make_args=lambda i: (pool[i % len(pool)] + float(i) * 1e-6,),
               iters=5)
    return st["min_ms"]


def bench_train(conf, model, pool, mouth, TB):
    system = System(
        model, make_optimizer(**conf["optim"]),
        {"train": PITLossWrapper(pairwise_neg_snr),
         "val": PITLossWrapper(pairwise_neg_sisdr)},
        compute_dtype=jnp.bfloat16,
    )
    tmouth = mouth[:TB]
    state = system.init_state(jax.random.PRNGKey(0), pool[0][:1], mouth[:1])
    step = jax.jit(system.train_step)
    key = jax.random.PRNGKey(1)
    box = [state]

    def run(m):
        new_state, metrics = step(box[0], (m, m[:, None, :], tmouth), key)
        box[0] = new_state
        return metrics["loss"]

    run(pool[0][:TB])  # compile
    st = timed(run,
               make_args=lambda i: (pool[i % len(pool)][:TB] + float(i) * 1e-6,),
               iters=5)
    return st["min_ms"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--serve-only", action="store_true")
    p.add_argument("--train-only", action="store_true")
    p.add_argument("--latency", action="store_true",
                   help="also measure unamortized B=1 serving latency (the "
                        "paper's Time(ms) column is per-utterance latency)")
    args = p.parse_args()

    rng = np.random.default_rng(0)
    B, L, TV = 128, 32000, 50
    pool = [jnp.asarray(rng.standard_normal((B, L)).astype(np.float32))
            for _ in range(4)]
    mouth = jnp.asarray(rng.standard_normal((B, 512, TV)).astype(np.float32) * 0.1)

    for name, paper_ms in ZOO:
        with open(f"rtfs_net_tpu/configs/{name}.yaml") as f:
            conf = yaml.safe_load(f)
        model = AVNet(**conf["audionet"])
        row = [name]
        if not args.train_only:
            ms = bench_serve(model, pool, mouth, B)
            row.append(f"serve {ms / B:.2f} ms/utt ({B / (ms / 1e3):.0f} utt/s, "
                       f"paper {paper_ms} -> {paper_ms / (ms / B):.1f}x)")
            if args.latency:
                lat = bench_serve(model, [m[:1] for m in pool], mouth[:1], 1)
                row.append(f"B=1 latency {lat:.2f} ms "
                           f"(paper {paper_ms} -> {paper_ms / lat:.1f}x)")
        if not args.serve_only:
            for TB in (4, 16):
                tms = bench_train(conf, model, pool, mouth, TB)
                row.append(f"train B={TB} {tms:.1f} ms/step "
                           f"({TB / (tms / 1e3):.0f} utt/s)")
        print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()
