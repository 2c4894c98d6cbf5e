"""Post-unfold-fusion re-sweeps on the real chip.

1. Serving batch sweep (XLA layout quality is strongly batch-dependent —
   round-2 found 128 optimal; the fused windowed projection changed the
   graph, so re-check).
2. Inference scan-unroll sweep (the per-step work shrank).

    python scripts/bench_sweep.py [--batches 64 96 128 160 192 256]
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

from rtfs_net_tpu.models import build_model
from rtfs_net_tpu.utils.profiling import timed


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=int, nargs="+",
                   default=[96, 128, 160, 192, 256])
    p.add_argument("--unrolls", type=int, nargs="+", default=[4, 8, 16])
    args = p.parse_args()

    with open("rtfs_net_tpu/configs/lrs2_RTFSNet_4_layer.yaml") as f:
        conf = yaml.safe_load(f)
    rng = np.random.default_rng(0)
    L, TV = 32000, 50

    best = (0.0, None, None)
    for B in args.batches:
        pool = [jnp.asarray(rng.standard_normal((B, L)).astype(np.float32))
                for _ in range(3)]
        mouth = jnp.asarray(
            rng.standard_normal((B, 512, TV)).astype(np.float32) * 0.1)
        for un in args.unrolls:
            # eval_unroll is a DualPathRNN field resolved from layer config;
            # override via the audio layer dicts
            a = yaml.safe_load(yaml.safe_dump(conf["audionet"]))
            for lc in a["audio_params"]["layers"].values():
                if lc.get("layer_type") == "DualPathRNN":
                    lc["eval_unroll"] = un
            model = build_model("AVNet", **a)
            v = jax.jit(model.init)(jax.random.PRNGKey(0), pool[0][:1], mouth[:1])
            fwd = jax.jit(lambda vv, m, mo: model.apply(
                vv, m.astype(jnp.bfloat16), mo.astype(jnp.bfloat16)
            ).astype(jnp.float32))
            fwd(v, pool[0], mouth)
            st = timed(lambda m: fwd(v, m, mouth),
                       make_args=lambda i: (pool[i % len(pool)] + float(i) * 1e-6,),
                       iters=5)
            ups = B / (st["min_ms"] / 1e3)
            print(f"B={B:4d} unroll={un:3d}: {st['min_ms']/B:.3f} ms/utt "
                  f"({ups:.1f} utt/s)", flush=True)
            if ups > best[0]:
                best = (ups, B, un)
    print(f"best: {best[0]:.1f} utt/s at B={best[1]} unroll={best[2]}")


if __name__ == "__main__":
    main()
