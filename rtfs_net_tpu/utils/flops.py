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


# This repo deliberately lowers nearest-interpolation and adaptive pooling
# to dense 0/1 selection matmuls (MXU-friendly — ops/conv.py:243,272).
# They execute real MACs here, but the reference's thop accounting counts
# F.interpolate / adaptive_avg_pool as ZERO (no hooks), so they are
# excluded when reproducing the paper's numbers.
_SELECTION_MATMUL_FNS = frozenset(
    {"interpolate_nearest", "adaptive_avg_pool"})


def _innermost_user_frame(eqn):
    tb = eqn.source_info.traceback
    if tb is None:
        return None
    for fr in tb.frames:
        fn = fr.file_name
        if "/jax/" in fn or "/flax/" in fn:
            continue
        return fr
    return None


def conv_dot_macs(fn, *example_args, thop_equivalent: bool = False,
                  **example_kwargs) -> float:
    """Count convolution + matmul multiply-accumulates by walking the
    jaxpr. Scan bodies are multiplied by their trip count (XLA's own
    cost analysis counts a While body once, under-reporting scanned
    repeats).

    ``thop_equivalent=True`` reproduces the reference's thop accounting
    (``base_av_model.py:61-118``) by skipping the dense selection matmuls
    this repo uses for nearest-interp / adaptive pooling — thop has no
    hooks for those ops and counts them as zero. With this flag the four
    headline configs land within ~1% of the paper's 21.9/30.5/56.4/167.2
    GMACs (``tests/test_macs_paper.py``)."""
    import jax

    closed = jax.make_jaxpr(fn)(*example_args, **example_kwargs)

    def eqn_macs(eqn) -> float:
        prim = eqn.primitive.name
        if prim == "conv_general_dilated":
            out = eqn.outvars[0].aval.shape
            rhs = eqn.invars[1].aval.shape
            dn = eqn.params["dimension_numbers"]
            # rhs spec: (out_feature_dim, in_feature_dim, *spatial)
            cin_per_group = rhs[dn.rhs_spec[1]]
            k_spatial = 1
            for d in dn.rhs_spec[2:]:
                k_spatial *= rhs[d]
            out_elems = 1
            for s in out:
                out_elems *= s
            return float(out_elems) * cin_per_group * k_spatial
        if prim == "dot_general":
            if thop_equivalent:
                fr = _innermost_user_frame(eqn)
                if fr is not None and fr.function_name in _SELECTION_MATMUL_FNS:
                    return 0.0
            out = eqn.outvars[0].aval.shape
            lhs = eqn.invars[0].aval.shape
            (lhs_contract, _), _ = eqn.params["dimension_numbers"]
            k = 1
            for d in lhs_contract:
                k *= lhs[d]
            out_elems = 1
            for s in out:
                out_elems *= s
            return float(out_elems) * k
        total = 0.0
        if prim == "scan":
            inner = sum(eqn_macs(e) for e in eqn.params["jaxpr"].jaxpr.eqns)
            return inner * eqn.params["length"]
        if prim == "while":
            # trip count unknown statically; count the body once
            return sum(eqn_macs(e) for e in eqn.params["body_jaxpr"].jaxpr.eqns)
        if prim == "cond":
            return max(
                (sum(eqn_macs(e) for e in br.jaxpr.eqns)
                 for br in eqn.params["branches"]), default=0.0)
        for key in ("jaxpr", "call_jaxpr"):
            sub = eqn.params.get(key)
            if sub is not None:
                jx = sub.jaxpr if hasattr(sub, "jaxpr") else sub
                total += sum(eqn_macs(e) for e in jx.eqns)
        return total

    return sum(eqn_macs(e) for e in closed.jaxpr.eqns)


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
        # XLA cost analysis counts a scan body once; unroll shared repeats
        # so the MACs total covers every repeat
        m = (model.clone(scan_shared_repeats=False)
             if hasattr(model, "scan_shared_repeats") else model)
        rep = flops_report(lambda v, *a: m.apply(v, *a), variables, *example_inputs)
        lines.append(f"MACs (example input): {rep['gmacs']:.2f} G")
    except Exception as e:  # cost analysis unsupported on some backends
        lines.append(f"MACs: unavailable ({e})")
    lines.append(f"Params total: {total_params / 1e6:.3f} M")
    return "\n".join(lines)
