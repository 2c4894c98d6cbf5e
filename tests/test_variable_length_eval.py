"""Variable-length evaluation semantics: bucketed padding must not change
the separated output on the unpadded span (the one engineered divergence
from the reference's dynamic-shape eval, SURVEY.md §7)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rtfs_net_tpu.models import AVNet
from tests.test_system import TINY_AUDIONET


def test_padded_inference_matches_exact_length(rng):
    model = AVNet(**TINY_AUDIONET)
    L = 3000
    bucket = 2000
    pad_L = -(-L // bucket) * bucket
    mix = rng.standard_normal((1, L)).astype(np.float32)
    mouth = rng.standard_normal((1, 16, 5)).astype(np.float32)
    v = model.init(jax.random.PRNGKey(0), jnp.asarray(mix), jnp.asarray(mouth))

    out_exact = np.asarray(model.apply(v, jnp.asarray(mix), jnp.asarray(mouth)))
    mix_pad = np.pad(mix, ((0, 0), (0, pad_L - L)))
    out_pad = np.asarray(model.apply(v, jnp.asarray(mix_pad), jnp.asarray(mouth)))

    # zero-padding shifts the gLN global statistics, so agreement is high
    # but not exact — measured ~18 dB at 33% padding on this tiny model.
    # test.py defaults to fine-grained buckets (<= 12.5% padding typical)
    # and supports --bucket-size 1 for exact-length eval.
    a, b = out_exact[0, 0], out_pad[0, 0, :L]
    snr = 10 * np.log10(np.sum(a ** 2) / (np.sum((a - b) ** 2) + 1e-12))
    assert snr > 12, snr


def test_bucketed_metric_drift_bounded(rng):
    """VERDICT item 9: quantify the gLN stat shift from zero padding as a
    METRIC delta on a TRAINED model (a random-init separator's near-zero
    SI-SNR output amplifies any perturbation; trained outputs are what
    eval actually scores). Zero-padding was also measured against
    wrap/reflect padding and wins (wrap 0.10-0.44 dB, reflect 0.20-0.41 dB
    vs zero 0.02-0.22 dB on random init) — real-energy padding is
    attendable content, silence is not. Bound: < 0.1 dB at <=11% padding
    (the 4000-sample default bucket on 2 s+ utterances)."""
    from rtfs_net_tpu.losses import PITLossWrapper, pairwise_neg_snr, pairwise_neg_sisdr
    from rtfs_net_tpu.system import System, make_optimizer

    conf = {**TINY_AUDIONET, "video_params": {}, "fusion_params": {},
            "video_bn_params": {}}
    model = AVNet(**conf)
    system = System(model, make_optimizer("adamw", lr=2e-3, weight_decay=0.1),
                    {"train": PITLossWrapper(pairwise_neg_snr),
                     "val": PITLossWrapper(pairwise_neg_sisdr)})

    B, L_train = 4, 4000
    src_t = jnp.asarray(rng.standard_normal((B, L_train)).astype(np.float32))
    noise_t = jnp.asarray(rng.standard_normal((B, L_train)).astype(np.float32))
    batch = (src_t + 0.5 * noise_t, src_t[:, None], None)
    state = system.init_state(jax.random.PRNGKey(0), batch[0][:1])
    step = jax.jit(system.train_step)
    key = jax.random.PRNGKey(1)
    for _ in range(60):
        key, sub = jax.random.split(key)
        state, m = step(state, batch, sub)
    v = {"params": state.params}

    def sisnr(est, ref):
        est = est - est.mean()
        ref = ref - ref.mean()
        proj = (est @ ref) / (ref @ ref) * ref
        return 10 * np.log10((proj @ proj) / ((est - proj) @ (est - proj) + 1e-12))

    deltas = []
    for L in (3600, 7400, 15200):  # 400/600/800-sample pads at bucket 4000
        bucket = 4000
        pad_L = -(-L // bucket) * bucket
        src = rng.standard_normal((L,)).astype(np.float32)
        noise = rng.standard_normal((L,)).astype(np.float32)
        mix = (src + 0.5 * noise)[None]
        out_exact = np.asarray(model.apply(v, jnp.asarray(mix), None))[0, 0]
        mix_pad = np.pad(mix, ((0, 0), (0, pad_L - L)))
        out_pad = np.asarray(model.apply(v, jnp.asarray(mix_pad), None))[0, 0, :L]
        deltas.append(abs(sisnr(out_exact, src) - sisnr(out_pad, src)))
    assert max(deltas) < 0.1, deltas


def test_bucket_reuse_compiles_once(rng):
    """Same padded shape -> same compiled executable (no recompile storm
    across a variable-length test set)."""
    model = AVNet(**TINY_AUDIONET)
    mouth = jnp.asarray(rng.standard_normal((1, 16, 5)).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2000)), mouth)
    fwd = jax.jit(lambda vv, m, mo: model.apply(vv, m, mo))
    bucket = 2000
    lengths = [1500, 1700, 1999, 2300, 3999]
    n_shapes = set()
    for L in lengths:
        pad_L = -(-L // bucket) * bucket
        n_shapes.add(pad_L)
        mix = jnp.asarray(rng.standard_normal((1, pad_L)).astype(np.float32))
        out = fwd(v, mix, mouth)
        assert out.shape[-1] == pad_L
    assert len(n_shapes) == 2  # 5 lengths -> 2 compiled shapes
    # jax cache stats: ~one entry per shape. `_cache_size` is an internal
    # API whose count can pick up one environmental extra entry when the
    # full suite runs (observed flake); the property under test is "no
    # per-length recompile storm", i.e. entries ~ shapes, not lengths.
    assert fwd._cache_size() <= len(n_shapes) + 1
    assert fwd._cache_size() < len(lengths)
