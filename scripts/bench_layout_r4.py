#!/usr/bin/env python
"""Quantify the (B,C,T,F) vs (B,C,F,T) physical-layout cost at serving shapes.

On TPU the minor-most dim maps to lanes (padded to 128) and the
second-minor to sublanes (padded to 8). RTFS tensors are (B,C,T=251,F=129):
F=129 pads to 256 lanes -> ~1.98x wasted bytes/VPU work on every
intermediate. Swapped (B,C,F=129,T=251): T pads to 256 (2%), F to 136
(5%) -> ~1.07x waste. This script measures representative hot ops from
the B=128 serving HLO profile in both orders to size the win before a
layout refactor.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from rtfs_net_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from rtfs_net_tpu.utils.profiling import timed

B, C, T, F = 32, 64, 251, 129
DT = jnp.bfloat16
rng = np.random.default_rng(0)


def mk(*shapes):
    # generate on DEVICE: host->tunnel transfers dominate walltime otherwise
    bases = [
        jax.jit(lambda k, s=s: jax.random.normal(k, s, DT))(jax.random.PRNGKey(j))
        for j, s in enumerate(shapes)
    ]
    return lambda i: tuple(b + jnp.asarray(float(i) * 1e-3, DT) for b in bases)


def report(name, fn, make_args):
    stats = timed(fn, make_args, iters=6, warmup=2)
    print(f"{name:52s} {stats['min_ms']:8.2f} ms")
    return stats["min_ms"]


def main():
    print(jax.devices())

    for tag, (d2, d3) in (("TF (current)", (T, F)), ("FT (swapped)", (F, T))):
        print(f"--- spatial order {tag}: (B,{C},{d2},{d3})")
        x_shape = (B, C, d2, d3)

        # 1. elementwise chain (gLN-style normalize + PReLU), memory-bound
        g = jnp.asarray(rng.standard_normal((1, C, 1, 1)).astype(np.float32), DT)

        def ew(x):
            m = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
            v = jnp.mean(jnp.square(x), axis=(1, 2, 3), keepdims=True) - jnp.square(m)
            y = (x - m) * lax.rsqrt(v + 1e-5) * g
            return jnp.where(y > 0, y, 0.25 * y)

        report("gLN+PReLU elementwise", ew, mk(x_shape))

        # 2. 1x1 conv 64->256 + residual (the 11% residual_conv)
        w = jnp.asarray(rng.standard_normal((256, C, 1, 1)).astype(np.float32), DT)
        res = jax.jit(lambda k: jax.random.normal(k, (B, 256, d2, d3), DT))(
            jax.random.PRNGKey(1))

        def conv1x1(x):
            return lax.conv_general_dilated(
                x, w, (1, 1), "VALID",
                dimension_numbers=("NCHW", "OIHW", "NCHW")) + res

        report("1x1 64->256 + residual", conv1x1, mk(x_shape))

        # 3. DW 4x4 conv stride 1, torch even-'same' padding (the ~10% local_embedding)
        dw = jnp.asarray(rng.standard_normal((C, 1, 4, 4)).astype(np.float32), DT)

        def dwconv(x):
            return lax.conv_general_dilated(
                x, dw, (1, 1), ((2, 1), (2, 1)),
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
                feature_group_count=C)

        report("DW 4x4 conv", dwconv, mk(x_shape))

        # 4. DW 4x4 stride-2 down conv (down0)
        def dwdown(x):
            return lax.conv_general_dilated(
                x, dw, (2, 2), ((1, 1), (1, 1)),
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
                feature_group_count=C)

        report("DW 4x4 stride2", dwdown, mk(x_shape))

        # 5. copy (pure bandwidth reference)
        report("copy x*1.0001", lambda x: x * jnp.asarray(1.0001, DT), mk(x_shape))


if __name__ == "__main__":
    main()
