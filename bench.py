#!/usr/bin/env python
"""TPU benchmark: RTFS-Net-4 separation throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: 2 s @16 kHz mixture utterances separated per second per chip
(batch 32, full forward incl. STFT/iSTFT, lip embedding precomputed —
matching the paper's inference-latency measurement setup). vs_baseline is
the speedup over the reference's published per-utterance GPU latency of
57.8 ms (BASELINE.md: RTFS-Net-4 time).
"""
import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import yaml

    from rtfs_net_tpu.models import AVNet

    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "rtfs_net_tpu", "configs",
                           "lrs2_RTFSNet_4_layer.yaml")) as f:
        conf = yaml.safe_load(f)
    model = AVNet(**conf["audionet"])

    B, L, TV = 32, 32000, 50
    rng = np.random.default_rng(0)
    mix = jnp.asarray(rng.standard_normal((B, L)).astype(np.float32))
    mouth = jnp.asarray(rng.standard_normal((B, 512, TV)).astype(np.float32) * 0.1)

    variables = jax.jit(model.init)(jax.random.PRNGKey(0), mix[:1], mouth[:1])
    fwd = jax.jit(lambda v, m, mo: model.apply(v, m, mo))

    out = fwd(variables, mix, mouth)
    out.block_until_ready()
    assert bool(jnp.isfinite(out).all()), "non-finite output"

    n_iters = 30
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = fwd(variables, mix, mouth)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / n_iters

    utt_per_s = B / dt
    ms_per_utt = dt / B * 1e3
    baseline_ms_per_utt = 57.8  # reference paper RTFS-Net-4 inference time
    print(json.dumps({
        "metric": "rtfsnet4_2s_utterances_per_sec_per_chip",
        "value": round(utt_per_s, 2),
        "unit": "utt/s",
        "vs_baseline": round(baseline_ms_per_utt / ms_per_utt, 2),
    }))


if __name__ == "__main__":
    main()
