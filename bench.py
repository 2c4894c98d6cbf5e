#!/usr/bin/env python
"""TPU benchmark: RTFS-Net-4 separation + training throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} plus
auxiliary keys (train_ms_per_step_b4, train_utt_per_s_per_chip,
inference_ms_per_utt).

Primary metric: 2 s @16 kHz mixture utterances separated per second per
chip (serving batch 128 — the measured throughput-optimal batch on v5e;
round-5 figure 337.3 utt/s / 2.965 ms/utt — bf16 serving precision, 43 dB
output agreement with f32, full forward incl. STFT/iSTFT, lip embedding
precomputed, matching the paper's inference-latency measurement setup).
vs_baseline is the speedup over the reference's published per-utterance
GPU latency of 57.8 ms (BASELINE.md: RTFS-Net-4 time).

Training metric: full train step (fwd + PIT-SNR + grads + AdamW) at the
reference's per-device batch of 4 (lrs2_RTFSNet_4_layer.yaml:108-110),
bf16 mixed precision, per-block remat.
"""
import json
import os
import sys
import time

import numpy as np


def main():
    from rtfs_net_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import yaml

    from rtfs_net_tpu.models import AVNet

    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "rtfs_net_tpu", "configs",
                           "lrs2_RTFSNet_4_layer.yaml")) as f:
        conf = yaml.safe_load(f)
    # RTFS_TF_ORDER=tf|ft|auto A/Bs the internal TF-domain layout
    # (tests/test_tf_order.py proves the orders are numerically identical)
    model = AVNet(tf_order=os.environ.get("RTFS_TF_ORDER", "auto"),
                  **conf["audionet"])

    B, L, TV = 128, 32000, 50
    rng = np.random.default_rng(0)
    # IMPORTANT: the axon TPU client memoizes executions with identical
    # input buffers — every timed call must see distinct inputs or the
    # loop measures the RPC cache, not the chip.
    mix_pool = [jnp.asarray(rng.standard_normal((B, L)).astype(np.float32))
                for _ in range(4)]
    mouth = jnp.asarray(rng.standard_normal((B, 512, TV)).astype(np.float32) * 0.1)

    variables = jax.jit(model.init)(jax.random.PRNGKey(0), mix_pool[0][:1], mouth[:1])
    from rtfs_net_tpu.models import for_inference

    smodel = for_inference(model)  # unrolled repeats: ~2% serve win, same vars
    fwd = jax.jit(lambda v, m, mo: smodel.apply(v, m, mo))

    # correctness sanity on a small f32 slice (the timed loop runs bf16
    # at the full serving batch)
    out = fwd(variables, mix_pool[0][:8], mouth[:8])
    assert bool(jnp.isfinite(out).all()), "non-finite output"

    # honest timing: distinct inputs per call AND host-fetch fencing
    # (block_until_ready does not fence completion on the axon tunnel)
    from rtfs_net_tpu.utils.profiling import timed

    stats = timed(
        lambda m: smodel.apply(
            variables, m.astype(jnp.bfloat16), mouth.astype(jnp.bfloat16)
        ).astype(jnp.float32),
        make_args=lambda i: (mix_pool[i % len(mix_pool)] + float(i) * 1e-6,),
        iters=6,
    )
    dt = stats["min_ms"] / 1e3

    utt_per_s = B / dt
    ms_per_utt = dt / B * 1e3

    # ---- training step (per-chip batch 4, bf16 mixed precision) ----
    from rtfs_net_tpu.losses import PITLossWrapper, pairwise_neg_snr, pairwise_neg_sisdr
    from rtfs_net_tpu.system import System, make_optimizer

    system = System(
        model, make_optimizer(**conf["optim"]),
        {"train": PITLossWrapper(pairwise_neg_snr),
         "val": PITLossWrapper(pairwise_neg_sisdr)},
        compute_dtype=jnp.bfloat16,
    )
    # mouth embeddings enter precomputed (identity video path), so the
    # state holds the full AV param tree
    state = system.init_state(jax.random.PRNGKey(0), mix_pool[0][:1], mouth[:1])
    train_step = jax.jit(system.train_step)
    tkey = jax.random.PRNGKey(1)

    def bench_train(TB):
        tmouth = mouth[:TB]
        state_box = [state]

        def run_train(m):
            new_state, metrics = train_step(
                state_box[0], (m, m[:, None, :], tmouth), tkey)
            state_box[0] = new_state
            return metrics["loss"]

        run_train(mix_pool[0][:TB])  # warm-up / compile
        tstats = timed(
            run_train,
            make_args=lambda i: (mix_pool[i % len(mix_pool)][:TB] + float(i) * 1e-6,),
            iters=6,
        )
        return tstats["min_ms"]

    train_ms = bench_train(4)      # the reference's per-GPU batch
    train_ms_16 = bench_train(16)  # measured per-chip throughput sweet spot

    baseline_ms_per_utt = 57.8  # reference paper RTFS-Net-4 inference time
    print(json.dumps({
        "metric": "rtfsnet4_bf16_2s_utterances_per_sec_per_chip",
        "value": round(utt_per_s, 2),
        "unit": "utt/s",
        "vs_baseline": round(baseline_ms_per_utt / ms_per_utt, 2),
        "inference_ms_per_utt": round(ms_per_utt, 3),
        "train_ms_per_step_b4": round(train_ms, 1),
        "train_utt_per_s_per_chip": round(4 / (train_ms / 1e3), 2),
        "train_ms_per_step_b16": round(train_ms_16, 1),
        "train_utt_per_s_per_chip_b16": round(16 / (train_ms_16 / 1e3), 2),
    }))


if __name__ == "__main__":
    main()
