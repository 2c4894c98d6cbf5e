#!/usr/bin/env python
"""Bench nearest-upsample formulations at the InjectionMultiSum hot shape.

The serving HLO profile shows ~42 ms/iter of 530 MB layout copies around
the upsample contractions (fuse0/concat0 dot_general) — XLA lays the
tensordot output out differently from what the elementwise combine wants.
This script measures alternatives on the real chip.

    python scripts/bench_interp.py [--coarse 63 33] [--fine 251 129]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--chan", type=int, default=64)
    p.add_argument("--coarse", type=int, nargs=2, default=(63, 33))
    p.add_argument("--fine", type=int, nargs=2, default=(251, 129))
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax import lax

    from rtfs_net_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from rtfs_net_tpu.ops.conv import _nearest_matrix, interpolate_nearest

    B, C = args.batch, args.chan
    Tc, Fc = args.coarse
    Tf, Ff = args.fine
    x = jax.random.normal(jax.random.PRNGKey(0), (B, C, Tc, Fc), jnp.bfloat16)
    idx_t = jnp.asarray(np.floor(np.arange(Tf) * (Tc / Tf)).astype(np.int32))
    idx_f = jnp.asarray(np.floor(np.arange(Ff) * (Fc / Ff)).astype(np.int32))
    Mt = jnp.asarray(_nearest_matrix(Tc, Tf), jnp.bfloat16)
    Mf = jnp.asarray(_nearest_matrix(Fc, Ff), jnp.bfloat16)

    variants = {
        "current": lambda x: interpolate_nearest(x, (Tf, Ff)),
        "take": lambda x: jnp.take(jnp.take(x, idx_t, axis=2), idx_f, axis=3),
        "einsum": lambda x: jnp.einsum("bcuv,ut,vf->bctf", x, Mt, Mf),
        "f_then_t": lambda x: jnp.tensordot(
            jnp.tensordot(x, Mf, axes=([3], [0])), Mt, axes=([2], [0])
        ).transpose(0, 1, 3, 2),
    }

    y0 = np.asarray(variants["current"](x), np.float32)
    N = args.iters
    for name, f in variants.items():
        d = float(np.max(np.abs(np.asarray(f(x), np.float32) - y0)))

        def run(x0, f=f):
            def body(y, _):
                o = f(y)
                return y + jnp.bfloat16(1e-3), jnp.sum(o.astype(jnp.float32))
            _, ss = lax.scan(body, x0, None, length=N)
            return jnp.sum(ss)

        jf = jax.jit(run)
        t0 = time.perf_counter()
        float(jf(x))
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            float(jf(x))
            ts.append(time.perf_counter() - t0)
        per = (min(ts) * 1e3 - 27) / N  # ~27 ms tunnel dispatch+fence
        print(f"{name:10s} diff={d:.3g} compile={compile_s:.0f}s "
              f"~{per:.2f} ms/interp", flush=True)


if __name__ == "__main__":
    main()
