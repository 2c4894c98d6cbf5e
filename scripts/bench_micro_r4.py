#!/usr/bin/env python
"""Round-4 serving microbenches at the RTFS-4 B=128 hot shapes.

Targets from the HLO profile (scripts/profile_hlo.py, B=128 serving):
  - nearest-interp dot_generals in InjectionMultiSum  (~8% device time)
  - the 1x1 residual_conv 64->256 at full (251,129)   (~11%)
  - the k=4 DW convs (down0 / local_embedding)        (~12%)

Each candidate is timed fenced with distinct inputs (tunnel memoization).
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

from rtfs_net_tpu.ops.conv import interpolate_nearest, _nearest_matrix
from rtfs_net_tpu.utils.profiling import timed

B, C, T, F = 32, 64, 251, 129
Tc, Fc = 126, 65
DT = jnp.bfloat16
rng = np.random.default_rng(0)


def mk(shape):
    # generate on DEVICE: multi-GB host->tunnel transfers dominate walltime
    base = jax.jit(lambda k: jax.random.normal(k, shape, DT))(
        jax.random.PRNGKey(0))
    return lambda i: (base + jnp.asarray(float(i) * 1e-3, DT),)


def report(name, fn, make_args):
    stats = timed(fn, make_args, iters=6, warmup=2)
    print(f"{name:48s} {stats['min_ms']:8.2f} ms")
    return stats["min_ms"]


def interp_repeat(x, size):
    """Nearest interp via repeat+crop; valid when src=floor(dst*in/out)
    equals dst//k for k=ceil(out/in) (checked by caller)."""
    for d, (ins, outs) in enumerate(zip(x.shape[2:], size)):
        if ins == outs:
            continue
        k = -(-outs // ins)
        x = jnp.repeat(x, k, axis=2 + d)
        x = lax.slice_in_dim(x, 0, outs, axis=2 + d)
    return x


def main():
    print(jax.devices())

    # sanity: repeat pattern matches the matrix formula at the hot sizes
    for ins, outs in ((Tc, T), (Fc, F)):
        idx = np.floor(np.arange(outs) * (ins / outs)).astype(np.int64)
        k = -(-outs // ins)
        assert (idx == np.arange(outs) // k).all(), (ins, outs)

    # --- 1. nearest interp (126,65) -> (251,129) on (B,64,Tc,Fc)
    report("interp matmul (current)",
           lambda x: interpolate_nearest(x, (T, F)), mk((B, C, Tc, Fc)))
    report("interp repeat+crop",
           lambda x: interp_repeat(x, (T, F)), mk((B, C, Tc, Fc)))
    # variant: gate path = sigmoid then interp (current order: interp after conv+sigmoid)
    report("interp matmul + sigmoid-pre",
           lambda x: interpolate_nearest(jax.nn.sigmoid(x), (T, F)),
           mk((B, C, Tc, Fc)))

    # --- 2. 1x1 conv 64->256 at (B,64,T,F) + residual add
    w = jnp.asarray(rng.standard_normal((256, C)).astype(np.float32), DT)
    res = jax.jit(lambda k: jax.random.normal(k, (B, 256, T, F), DT))(jax.random.PRNGKey(1))

    def conv_ncHW(x):
        return lax.conv_general_dilated(
            x, w[:, :, None, None], (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW")) + res

    def dot_direct(x):
        # contract C with dot_general, batch dims none: (B,C,T,F) x (O,C)
        y = lax.dot_general(w, x, (((1,), (1,)), ((), ())))  # (O,B,T,F)
        return jnp.transpose(y, (1, 0, 2, 3)) + res

    def einsum_path(x):
        return jnp.einsum("bctf,oc->botf", x, w) + res

    report("1x1 64->256 conv NCHW (current)", conv_ncHW, mk((B, C, T, F)))
    report("1x1 64->256 dot_general+transpose", dot_direct, mk((B, C, T, F)))
    report("1x1 64->256 einsum botf", einsum_path, mk((B, C, T, F)))

    # --- 3. k=4 DW conv stride 1 at (B,64,T,F), torch 'same' even-kernel pad
    dw = jnp.asarray(rng.standard_normal((C, 1, 4, 4)).astype(np.float32), DT)

    def dw_conv(x):
        return lax.conv_general_dilated(
            x, dw, (1, 1), ((2, 1), (2, 1)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=C)

    def dw_shift_add(x):
        xp = jnp.pad(x, ((0, 0), (0, 0), (2, 1), (2, 1)))
        out = jnp.zeros_like(x)
        for i in range(4):
            for j in range(4):
                tap = lax.slice(xp, (0, 0, i, j), (B, C, i + T, j + F))
                out = out + tap * dw[:, 0, i, j][None, :, None, None]
        return out

    report("DW 4x4 conv (current)", dw_conv, mk((B, C, T, F)))
    report("DW 4x4 shift-add", dw_shift_add, mk((B, C, T, F)))

    # parity checks (f32 to isolate numerics)
    x32 = jnp.asarray(rng.standard_normal((2, C, Tc, Fc)).astype(np.float32))
    a = interpolate_nearest(x32, (T, F))
    b = interp_repeat(x32, (T, F))
    print("interp parity:", float(jnp.abs(a - b).max()))


if __name__ == "__main__":
    main()
