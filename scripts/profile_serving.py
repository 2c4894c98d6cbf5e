#!/usr/bin/env python
"""Stage-level ablation of RTFS-4 at the SERVING configuration (B=128,
bf16) on the real TPU: times each top-level stage with the real param
tree at its true in-graph shape, so "what do we attack next" reads
straight off the table. (The round-2 profile_stages.py ran B=8 f32 —
pre unfold-fusion.)

Memory discipline: stage inputs are synthesized at the right SHAPE (random
values — timing on TPU is not data-dependent) and freed between stages;
keeping the real B=128 intermediates live (2.1 GB each in bf16) OOMs the
16 GB chip.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from rtfs_net_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import numpy as np
import jax
import jax.numpy as jnp
import yaml

from rtfs_net_tpu.models import AVNet
from rtfs_net_tpu.utils.profiling import timed

B, L, TV = 128, 32000, 50
DT = jnp.bfloat16


def bench(name, fn, arg_shapes, variables, iters=6):
    rng = np.random.default_rng(0)
    args = [jnp.asarray(rng.standard_normal(s).astype(np.float32)).astype(DT)
            for s in arg_shapes]
    jfn = jax.jit(fn)  # variables passed as an ARG, not a jit constant
    jax.block_until_ready(jfn(variables, *args))  # compile
    stats = timed(jfn,
                  make_args=lambda i: (variables,
                                       args[0] + jnp.asarray(i * 1e-6, DT),
                                       *args[1:]),
                  iters=iters)
    del args
    dt = stats["min_ms"]
    print(f"{name:48s} {dt:8.2f} ms  ({dt/B*1e3:6.1f} us/utt)", flush=True)
    return dt


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "..", "rtfs_net_tpu", "configs",
                           "lrs2_RTFSNet_4_layer.yaml")) as f:
        conf = yaml.safe_load(f)
    model = AVNet(**conf["audionet"])
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, L), jnp.float32), jnp.zeros((1, 512, TV), jnp.float32))
    print(f"device={jax.devices()[0]}  B={B} dtype={DT.__name__}", flush=True)

    # true in-graph shapes (computed without materializing anything big)
    emb_s = (B, 256, 251, 129)
    audio_s = emb_s
    video_s = (B, 512, TV)
    sep_s = (B, 1, 256, 251, 129)

    t = {}
    t["full"] = bench("FULL forward", lambda v, m, mo: model.apply(v, m, mo),
                      [(B, L), (B, 512, TV)], variables)
    t["encoder"] = bench("STFTEncoder", lambda v, m: model.apply(
        v, m, method=lambda md, x: md.encoder(x, False)), [(B, L)], variables)
    t["audio_bn"] = bench("audio bottleneck", lambda v, e: model.apply(
        v, e, method=lambda md, x: md.audio_bottleneck(x, False)), [emb_s], variables)
    t["video_bn"] = bench("video bottleneck", lambda v, vi: model.apply(
        v, vi, method=lambda md, x: md.video_bottleneck(x, False)), [video_s], variables)
    t["refine"] = bench("RefinementModule (4 repeats + video + fusion)",
                        lambda v, a, vi: model.apply(v, a, vi,
                        method=lambda md, a, vi: md.refinement_module(a, vi, False)),
                        [audio_s, video_s], variables)
    t["audio_blk"] = bench("  one audio TDANetBlock", lambda v, a: model.apply(
        v, a, method=lambda md, a:
        md.refinement_module.audio_net.get_block(0)(a, False)), [audio_s], variables)
    t["video_net"] = bench("  video TDANet (1 repeat)", lambda v, vi: model.apply(
        v, vi, method=lambda md, vi:
        md.refinement_module.video_net.get_block(0)(vi, False)), [video_s], variables)
    t["fusion"] = bench("  crossmodal fusion block", lambda v, a, vi: model.apply(
        v, a, vi, method=lambda md, a, vi:
        md.refinement_module.crossmodal_fusion.get_fusion_block(0)(a, vi, False)[0]),
        [audio_s, video_s], variables)
    t["maskgen"] = bench("mask generator", lambda v, r, e: model.apply(
        v, r, e, method=lambda md, r, e: md.mask_generator(r, e, False)),
        [audio_s, emb_s], variables)
    t["decoder"] = bench("STFTDecoder", lambda v, s: model.apply(
        v, s, method=lambda md, s: md.decoder(s, (B, L), False)), [sep_s], variables)

    accounted = (t["encoder"] + t["audio_bn"] + t["video_bn"] + t["refine"]
                 + t["maskgen"] + t["decoder"])
    print(f"\nfull {t['full']:.2f} ms; stage sum {accounted:.2f} ms "
          f"(residual {t['full'] - accounted:+.2f} = inter-stage fusion)")
    print(f"refinement = {t['refine']/t['full']*100:.0f}% of full; "
          f"4x audio block = {4*t['audio_blk']:.2f} ms, "
          f"video+fusion = {t['video_net']+t['fusion']:.2f} ms")


if __name__ == "__main__":
    main()
