#!/usr/bin/env python
"""Gradient-coverage check (reference: ``find_unused_params.py`` — one
fwd/bwd on random tensors, print params that receive no gradient).

In JAX every param gets a grad array; "unused" means identically-zero
cotangents, which is what this reports.
"""
import argparse

import numpy as np
import yaml


def main(args):
    import jax
    import jax.numpy as jnp

    from rtfs_net_tpu.losses import PITLossWrapper, pairwise_neg_snr
    from rtfs_net_tpu.models import build_model

    with open(args.conf_dir) as f:
        conf = yaml.safe_load(f)
    model = build_model("AVNet", **conf["audionet"])

    rng = np.random.default_rng(0)
    mix = jnp.asarray(rng.standard_normal((1, 32000)).astype(np.float32))
    mouth_emb = jnp.asarray(
        rng.standard_normal(
            (1, conf["audionet"]["pretrained_vout_chan"], 50)).astype(np.float32)
    )
    targets = mix[:, None, :]

    variables = jax.jit(model.init)(jax.random.PRNGKey(0), mix, mouth_emb)
    params = variables["params"]
    extra = {k: v for k, v in variables.items() if k != "params"}
    pit = PITLossWrapper(pairwise_neg_snr)

    def loss_fn(p):
        est = model.apply({"params": p, **extra}, mix, mouth_emb)
        return pit(est, targets)

    grads = jax.jit(jax.grad(loss_fn))(params)

    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    unused = [
        jax.tree_util.keystr(path)
        for path, g in flat
        if float(jnp.max(jnp.abs(g))) == 0.0
    ]
    if unused:
        print(f"{len(unused)} params with zero gradient:")
        for name in unused:
            print("  ", name)
    else:
        print("all parameters receive gradient")
    return unused


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--conf-dir",
                        default="rtfs_net_tpu/configs/lrs2_RTFSNet_4_layer.yaml")
    main(parser.parse_args())
