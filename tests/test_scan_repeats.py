"""Scan-lowered weight-shared repeats (SURVEY.md §7 build-plan bullet 2).

With ``shared=True`` the audio-only repeat tail runs as ONE ``nn.scan``
step instead of trace-time unrolling. Params are broadcast (not stacked),
so the variable tree is identical to the unrolled path and outputs must
match exactly; trace size (jaxpr equation count) must stop growing with
``repeats``.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rtfs_net_tpu.models import AVNet
from tests.test_system import TINY_AUDIONET

KEY = jax.random.PRNGKey(0)


def _conf(repeats, shared=True):
    conf = {**TINY_AUDIONET}
    conf["audio_params"] = {**conf["audio_params"], "repeats": repeats,
                            "shared": shared}
    return conf


def test_scan_matches_unrolled(rng):
    mix = jnp.asarray(rng.standard_normal((2, 2000)).astype(np.float32))
    mouth = jnp.asarray(rng.standard_normal(
        (2, TINY_AUDIONET["pretrained_vout_chan"], 4)).astype(np.float32))

    scanned = AVNet(**_conf(4), scan_shared_repeats=True)
    unrolled = AVNet(**_conf(4), scan_shared_repeats=False)
    variables = scanned.init(KEY, mix, mouth)

    # identical param tree: the scan broadcasts the same block params
    v2 = unrolled.init(KEY, mix, mouth)
    assert (jax.tree.structure(variables["params"])
            == jax.tree.structure(v2["params"]))

    out_scan = np.asarray(scanned.apply(variables, mix, mouth))
    out_unroll = np.asarray(unrolled.apply(variables, mix, mouth))
    np.testing.assert_allclose(out_scan, out_unroll, atol=1e-5)


def test_audio_only_first_repeat_peeled(rng):
    """fusion_repeats == 0: repeat 0 (no residual add) is peeled, the
    rest scans; parity with the unrolled loop."""
    conf = _conf(4)
    conf["video_params"] = {}
    conf["fusion_params"] = {}
    mix = jnp.asarray(rng.standard_normal((2, 2000)).astype(np.float32))
    scanned = AVNet(**conf, scan_shared_repeats=True)
    unrolled = AVNet(**conf, scan_shared_repeats=False)
    variables = scanned.init(KEY, mix, None)
    out_scan = np.asarray(scanned.apply(variables, mix, None))
    out_unroll = np.asarray(unrolled.apply(variables, mix, None))
    np.testing.assert_allclose(out_scan, out_unroll, atol=1e-5)


def test_trace_size_constant_in_repeats():
    """The jaxpr no longer grows with the repeat count (RTFS-12 traces as
    fast as RTFS-4)."""
    mix = jnp.zeros((1, 2000))
    mouth = jnp.zeros((1, TINY_AUDIONET["pretrained_vout_chan"], 4))

    def n_eqns(repeats):
        model = AVNet(**_conf(repeats))
        variables = model.init(KEY, mix, mouth)
        jaxpr = jax.make_jaxpr(lambda v, m, e: model.apply(v, m, e))(
            variables, mix, mouth)
        return len(jaxpr.jaxpr.eqns)

    small, big = n_eqns(3), n_eqns(12)
    assert big <= small + 5, (small, big)


def test_grads_flow_through_scan(rng):
    """Backprop through the scanned tail reaches every audio-block param."""
    conf = _conf(4)
    conf["video_params"] = {}
    conf["fusion_params"] = {}
    mix = jnp.asarray(rng.standard_normal((1, 2000)).astype(np.float32))
    model = AVNet(**conf)
    variables = model.init(KEY, mix, None)

    def loss(params):
        out = model.apply({"params": params}, mix, None)
        return jnp.sum(out ** 2)

    grads = jax.grad(loss)(variables["params"])
    gsum = [float(np.abs(np.asarray(g)).sum())
            for g in jax.tree.leaves(grads)]
    assert all(np.isfinite(gsum))
    n_zero = sum(g == 0.0 for g in gsum)
    assert n_zero == 0, f"{n_zero}/{len(gsum)} zero-grad leaves"
