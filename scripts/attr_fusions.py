#!/usr/bin/env python
"""Dump the compiled serving executable's HLO text (with op_name/source
metadata) to a file for fusion→component attribution — companion to
profile_hlo.py.

    python scripts/attr_fusions.py [--out /tmp/serving_hlo.txt]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/serving_hlo.txt")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--conf",
                    default=os.path.join(
                        os.path.dirname(os.path.abspath(__file__)), "..",
                        "rtfs_net_tpu", "configs", "lrs2_RTFSNet_4_layer.yaml"))
    args = ap.parse_args()

    from rtfs_net_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import numpy as np
    import jax
    import jax.numpy as jnp
    import yaml

    from rtfs_net_tpu.models import AVNet, for_inference

    with open(args.conf) as f:
        conf = yaml.safe_load(f)
    model = AVNet(**conf["audionet"])
    rng = np.random.default_rng(0)
    B, L, TV = args.batch, 32000, 50
    mix = jnp.asarray(rng.standard_normal((B, L)).astype(np.float32))
    mouth = jnp.asarray(rng.standard_normal((B, 512, TV)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), mix[:1], mouth[:1])

    smodel = for_inference(model)
    fwd = jax.jit(lambda v, m, mo: smodel.apply(
        v, m.astype(jnp.bfloat16), mo.astype(jnp.bfloat16)))
    txt = fwd.lower(variables, mix, mouth).compile().as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} bytes to {args.out}")


if __name__ == "__main__":
    main()
