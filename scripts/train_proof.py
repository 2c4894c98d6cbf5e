#!/usr/bin/env python
"""Training proof on the real chip: overfit the FULL RTFS-Net-4 on a small
synthetic separation task and report SI-SNR improvement.

This is the end-to-end evidence that the flagship model *learns* under
this framework's training stack (fwd + PIT loss + remat backward + AdamW)
on TPU hardware — the piece local_test's 1-epoch smoke doesn't quantify.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
from rtfs_net_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax
import jax.numpy as jnp
import yaml

from rtfs_net_tpu.models import AVNet
from rtfs_net_tpu.losses import PITLossWrapper, pairwise_neg_snr, pairwise_neg_sisdr
from rtfs_net_tpu.system import System, make_optimizer


def speechlike(rng, n, sr=16000, f0=150.0):
    t = np.arange(n) / sr
    mod = f0 + 40 * np.sin(2 * np.pi * 2.1 * t + rng.uniform(0, 6))
    env = np.clip(np.sin(2 * np.pi * rng.uniform(2, 4) * t + rng.uniform(0, 6)), 0, None)
    sig = np.sin(2 * np.pi * np.cumsum(mod) / sr) * env
    return (sig + 0.05 * rng.standard_normal(n)).astype(np.float32)


def main(steps=200, B=4, L=32000):
    conf = yaml.safe_load(open(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..",
        "rtfs_net_tpu", "configs", "lrs2_RTFSNet_4_layer.yaml")))
    model = AVNet(**conf["audionet"])
    system = System(model, make_optimizer(**conf["optim"]),
                    {"train": PITLossWrapper(pairwise_neg_snr),
                     "val": PITLossWrapper(pairwise_neg_sisdr)})

    rng = np.random.default_rng(0)
    target = np.stack([speechlike(rng, L, f0=130 + 30 * i) for i in range(B)])
    noise = np.stack([speechlike(rng, L, f0=280 + 25 * i) for i in range(B)])
    mix = jnp.asarray(target + noise)
    tgt = jnp.asarray(target)[:, None, :]
    mouth = jnp.asarray(rng.standard_normal((B, 512, 50)).astype(np.float32) * 0.1)
    batch = (mix, tgt, mouth)

    state = system.init_state(jax.random.PRNGKey(0), mix[:1], mouth[:1])
    step = jax.jit(system.train_step)
    val = jax.jit(system.val_step)

    v0 = float(val(state, batch)["val_loss"])
    print(f"init val SI-SDR: {-v0:.2f} dB", flush=True)
    key = jax.random.PRNGKey(1)
    t0 = time.time()
    for i in range(steps):
        key, sub = jax.random.split(key)
        state, m = step(state, batch, sub)
        if (i + 1) % 25 == 0:
            vl = float(val(state, batch)["val_loss"])
            print(f"step {i+1}: train {-float(m['loss']):.2f} dB SNR, "
                  f"val {-vl:.2f} dB SI-SDR ({time.time()-t0:.0f}s)", flush=True)
    v1 = float(val(state, batch)["val_loss"])
    print(f"SI-SDR improvement after {steps} steps: {v0 - v1:.2f} dB "
          f"({-v0:.2f} -> {-v1:.2f})", flush=True)
    assert v1 < v0 - 5.0, "expected >5 dB improvement"
    print("TRAINING PROOF PASSED")


if __name__ == "__main__":
    main()
