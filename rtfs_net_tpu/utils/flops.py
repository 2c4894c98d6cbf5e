"""FLOPs/params accounting (replaces the reference's thop MACs reporting,
``base_av_model.py:61-118`` / ``models/utils/utils.py:80-86``) using XLA's
own compiled cost analysis."""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax


def count_params(params) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(params))


def flops_report(fn, *example_args, **example_kwargs) -> Dict[str, Any]:
    """Compile fn and return XLA's cost analysis (flops, bytes accessed).
    MACs ~= flops / 2 for conv/matmul-dominated graphs."""
    lowered = jax.jit(fn).lower(*example_args, **example_kwargs)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns a list per computation
        cost = cost[0] if cost else {}
    flops = float(cost.get("flops", float("nan")))
    return {
        "flops": flops,
        "gmacs": flops / 2e9,
        "bytes_accessed": float(cost.get("bytes accessed", float("nan"))),
        "raw": dict(cost),
    }


def model_macs_report(model, variables, *example_inputs,
                      names_and_fns: Optional[Dict] = None) -> str:
    """Readable params/MACs table for a model — per-top-level-module param
    counts + total MACs (the reference prints an equivalent thop table on
    every build, ``base_av_model.py:61-118``)."""
    lines = []
    params = variables.get("params", variables)
    total_params = count_params(params)
    rows = []
    for name, sub in sorted(params.items()):
        rows.append((name, count_params(sub)))
    width = max((len(n) for n, _ in rows), default=10)
    lines.append(f"{'module':<{width}}  params(K)")
    for name, n in rows:
        lines.append(f"{name:<{width}}  {n / 1e3:9.1f}")
    try:
        rep = flops_report(lambda v, *a: model.apply(v, *a), variables, *example_inputs)
        lines.append(f"MACs (example input): {rep['gmacs']:.2f} G")
    except Exception as e:  # cost analysis unsupported on some backends
        lines.append(f"MACs: unavailable ({e})")
    lines.append(f"Params total: {total_params / 1e6:.3f} M")
    return "\n".join(lines)
