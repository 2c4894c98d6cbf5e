#!/usr/bin/env python
"""Capture a device trace of the serving forward and print the top HLO ops.

Uses jax.profiler to write an xplane trace, then xprof's converters to
extract per-op self times — the ground-truth breakdown that component
ablation (scripts/profile_serving.py) can only approximate through
per-stage tunnel overhead.

    python scripts/profile_hlo.py [--batch 128] [--top 40]
"""
import argparse
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def capture(trace_dir: str, batch: int, conf_path: str, train: bool = False):
    import numpy as np
    import jax
    import jax.numpy as jnp
    import yaml

    from rtfs_net_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from rtfs_net_tpu.models import AVNet, for_inference

    with open(conf_path) as f:
        conf = yaml.safe_load(f)
    model = AVNet(**conf["audionet"])
    rng = np.random.default_rng(0)
    L, TV = 32000, 50
    DT = jnp.bfloat16
    mix1 = jnp.asarray(rng.standard_normal((1, L)).astype(np.float32))
    mouth1 = jnp.asarray(rng.standard_normal((1, 512, TV)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), mix1, mouth1)

    mix = jnp.asarray(rng.standard_normal((batch, L)).astype(np.float32))
    mouth = jnp.asarray(rng.standard_normal((batch, 512, TV)).astype(np.float32))

    if train:
        from rtfs_net_tpu.losses import PITLossWrapper, pairwise_neg_snr, pairwise_neg_sisdr
        from rtfs_net_tpu.system import System, make_optimizer

        system = System(
            model, make_optimizer(**conf["optim"]),
            {"train": PITLossWrapper(pairwise_neg_snr),
             "val": PITLossWrapper(pairwise_neg_sisdr)},
            compute_dtype=jnp.bfloat16,
        )
        state = system.init_state(jax.random.PRNGKey(0), mix[:1], mouth[:1])
        step = jax.jit(system.train_step)
        key = jax.random.PRNGKey(1)
        state, _ = step(state, (mix, mix[:, None, :], mouth), key)  # compile
        jax.block_until_ready(state.params)
        _dump_hlo(step, (state, (mix, mix[:, None, :], mouth), key), trace_dir)
        with jax.profiler.trace(trace_dir):
            for i in range(3):
                state, metrics = step(
                    state, (mix + np.float32(i) * 1e-6, mix[:, None, :], mouth), key)
            jax.block_until_ready(metrics["loss"])
        return

    smodel = for_inference(model)
    fwd = jax.jit(lambda v, m, mo: smodel.apply(v, m.astype(DT), mo.astype(DT)))
    jax.block_until_ready(fwd(variables, mix, mouth))  # compile outside trace
    _dump_hlo(fwd, (variables, mix, mouth), trace_dir)

    with jax.profiler.trace(trace_dir):
        for i in range(3):
            y = fwd(variables, mix + np.float32(i) * 1e-6, mouth)
        jax.block_until_ready(y)


def _dump_hlo(jitted, args, trace_dir):
    """Write the optimized HLO text of the exact executable being profiled
    (jit cache hit — no recompile) so report() can join trace op names to
    op_name metadata and aggregate device time per model component."""
    try:
        txt = jitted.lower(*args).compile().as_text()
        with open(os.path.join(trace_dir, "hlo.txt"), "w") as f:
            f.write(txt)
    except Exception as e:
        print(f"(hlo dump skipped: {e})")


def report(trace_dir: str, top: int, depth: int = 4):
    xs = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    assert xs, f"no xplane under {trace_dir}"
    xs.sort(key=os.path.getmtime)
    from xprof.convert import raw_to_tool_data as rtd

    params = {"tqx": "out:json;"}
    data, _ = rtd.xspace_to_tool_data([xs[-1]], "hlo_stats", params)
    if isinstance(data, bytes):
        data = data.decode()
    obj = json.loads(data)
    rows = obj["table"]["rows"] if "table" in obj else obj["rows"]
    cols = [c["label"] for c in (obj["table"]["cols"] if "table" in obj else obj["cols"])]
    idx = {c: i for i, c in enumerate(cols)}

    def val(r, name):
        return r["c"][idx[name]]["v"]

    recs = []
    for r in rows:
        recs.append({
            "cat": val(r, "HLO op category") if "HLO op category" in idx else "",
            "name": (val(r, "HLO op name") if "HLO op name" in idx else ""),
            "self_us": float(val(r, "Total self time (us)")) if "Total self time (us)" in idx else 0.0,
            "occ": int(val(r, "#Occurrences")) if "#Occurrences" in idx else 0,
        })
    recs.sort(key=lambda x: -x["self_us"])
    tot = sum(x["self_us"] for x in recs)
    print(f"\ntotal device self time: {tot/1e3:.2f} ms (3 iters) — per-iter {tot/3e3:.2f} ms")
    print(f"{'us(self)':>10} {'%':>5} {'occ':>5}  {'category':<22} name")
    for x in recs[:top]:
        print(f"{x['self_us']:10.0f} {100*x['self_us']/tot:5.1f} {x['occ']:5d}  {x['cat']:<22} {x['name'][:60]}")

    bycat = {}
    for x in recs:
        bycat[x["cat"]] = bycat.get(x["cat"], 0.0) + x["self_us"]
    print("\nby category:")
    for c, us in sorted(bycat.items(), key=lambda kv: -kv[1]):
        print(f"{us:10.0f} {100*us/tot:5.1f}  {c}")

    _report_by_component(trace_dir, recs, tot, depth=depth)


def _report_by_component(trace_dir, recs, tot, depth=4, top=30):
    """Join trace op names against the profiled executable's own HLO dump
    (hlo.txt written by capture()) and aggregate self time by the op_name
    metadata's model-component path."""
    import re

    path = os.path.join(trace_dir, "hlo.txt")
    if not os.path.exists(path):
        return
    name_to_comp = {}
    pat = re.compile(r"%([\w.\-]+) = .*?op_name=\"([^\"]+)\"")
    with open(path) as f:
        for line in f:
            m = pat.search(line)
            if m:
                name_to_comp[m.group(1)] = m.group(2)

    def component(op_name):
        # "jit(fn)/AVNet/refinement_module/checkpoint/blocks/globalatt2/..."
        parts = [p for p in op_name.split("/")
                 if not (p.startswith("jit(") or p.startswith("while") or
                         p in ("body", "checkpoint", "remat", "blocks"))]
        return "/".join(parts[:depth]) or op_name

    bycomp, misses = {}, 0.0
    for x in recs:
        op = name_to_comp.get(x["name"].strip())
        if op is None:
            misses += x["self_us"]
            continue
        c = component(op)
        bycomp[c] = bycomp.get(c, 0.0) + x["self_us"]
    print(f"\nby component (depth {depth}; {100*misses/max(tot,1):.1f}% unattributed):")
    for c, us in sorted(bycomp.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{us:10.0f} {100*us/tot:5.1f}  {c}")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--conf", default="rtfs_net_tpu/configs/lrs2_RTFSNet_4_layer.yaml")
    p.add_argument("--trace-dir", default="/tmp/rtfs_trace")
    p.add_argument("--report-only", action="store_true")
    p.add_argument("--train", action="store_true",
                   help="profile the jitted train step instead of serving")
    p.add_argument("--depth", type=int, default=4,
                   help="component-path depth for the per-component table")
    args = p.parse_args(argv)
    if not args.report_only:
        os.makedirs(args.trace_dir, exist_ok=True)
        capture(args.trace_dir, args.batch, args.conf, train=args.train)
    report(args.trace_dir, args.top, depth=args.depth)


if __name__ == "__main__":
    main()
