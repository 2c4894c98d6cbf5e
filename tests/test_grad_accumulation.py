"""Microbatch gradient accumulation (System(accum_steps=A)).

With mean losses and no BN in the audio path, accumulating A microbatch
gradients and averaging is mathematically the full-batch gradient, so an
accumulated step must match the direct step numerically (same params
after update). That equivalence is what lets any global batch train
within HBM (reference setup: 8x batch-4 — lrs2_RTFSNet_4_layer.yaml:108).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rtfs_net_tpu.models import AVNet
from rtfs_net_tpu.losses import PITLossWrapper, pairwise_neg_snr, pairwise_neg_sisdr
from rtfs_net_tpu.system import System, make_optimizer
from tests.test_system import TINY_AUDIONET


# audio-only: no video-branch dropout/BatchNorm, so a direct step and an
# accumulated step are exactly comparable (gLN/LN4D are per-sample norms)
AUDIO_ONLY = {**TINY_AUDIONET, "video_params": {}, "fusion_params": {},
              "video_bn_params": {}}


def _make_system(accum_steps, optimizer="adamw"):
    model = AVNet(**AUDIO_ONLY)
    return System(
        model, make_optimizer(optimizer, lr=1e-3, weight_decay=0.1),
        {"train": PITLossWrapper(pairwise_neg_snr),
         "val": PITLossWrapper(pairwise_neg_sisdr)},
        accum_steps=accum_steps,
    )


def _batch(rng, B=8, L=2000):
    src = jnp.asarray(rng.standard_normal((B, L)).astype(np.float32))
    noise = jnp.asarray(rng.standard_normal((B, L)).astype(np.float32))
    return (src + 0.5 * noise, src[:, None], None)


@pytest.mark.parametrize("accum", [2, 4])
def test_accumulated_step_matches_direct(rng, accum):
    """SGD makes the update linear in the gradient, so mean-of-microbatch
    grads == full-batch grad shows up directly in the new params (AdamW's
    g/sqrt(g^2) first step would amplify fp32 summation-order noise)."""
    batch = _batch(rng)
    direct = _make_system(1, optimizer="sgd")
    accd = _make_system(accum, optimizer="sgd")
    state0 = direct.init_state(jax.random.PRNGKey(0), batch[0][:1])

    s_direct, m_direct = jax.jit(direct.train_step)(
        state0, batch, jax.random.PRNGKey(7))
    s_accum, m_accum = jax.jit(accd.train_step)(
        state0, batch, jax.random.PRNGKey(7))

    np.testing.assert_allclose(float(m_accum["loss"]), float(m_direct["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s_direct.params),
                    jax.tree.leaves(s_accum.params)):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, atol=1e-6 + 1e-4 * np.abs(a).max())


def test_accumulation_trains(rng):
    """A 16-utterance global batch (4x the direct-fit microbatch) trains
    and the loss improves."""
    system = _make_system(4)
    batch = _batch(rng, B=16)
    state = system.init_state(jax.random.PRNGKey(0), batch[0][:1])
    step = jax.jit(system.train_step)
    key = jax.random.PRNGKey(2)
    losses = []
    for _ in range(8):
        key, sub = jax.random.split(key)
        state, m = step(state, batch, sub)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_accumulation_with_trainable_video(rng):
    """accum_steps and train_video_model compose: the accumulated scan
    carries the {model, video} trainable dict and video params update."""
    import jax.numpy as jnp

    from rtfs_net_tpu.models.videomodels import AEVideoModel
    from tests.test_system import TINY_AUDIONET

    vmodel = AEVideoModel(in_channels=1, base_channels=4, num_layers=3)
    vvars = vmodel.init(jax.random.PRNGKey(1), jnp.zeros((1, 1, 2, 88, 88)))
    conf = {**TINY_AUDIONET, "pretrained_vout_chan": 16 * 11 * 11}
    system = System(
        AVNet(**conf), make_optimizer("adamw", lr=2e-3, weight_decay=0.1),
        {"train": PITLossWrapper(pairwise_neg_snr),
         "val": PITLossWrapper(pairwise_neg_sisdr)},
        video_model=vmodel, video_variables=vvars,
        train_video_model=True, accum_steps=2,
    )
    B, L, TV = 4, 2000, 2
    src = jnp.asarray(rng.standard_normal((B, L)).astype(np.float32))
    mix = src + 0.5 * jnp.asarray(rng.standard_normal((B, L)).astype(np.float32))
    mouths = jnp.asarray(rng.standard_normal((B, 1, TV, 88, 88)).astype(np.float32))
    batch = (mix, src[:, None], mouths)
    state = system.init_state(jax.random.PRNGKey(0), mix[:1], mouths[:1])
    v0 = [np.asarray(x) for x in jax.tree.leaves(state.video_params)]
    step = jax.jit(system.train_step)
    state, m = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(m["loss"]))
    v1 = [np.asarray(x) for x in jax.tree.leaves(state.video_params)]
    assert any(not np.array_equal(a, b) for a, b in zip(v0, v1))


def test_indivisible_batch_raises(rng):
    system = _make_system(3)
    batch = _batch(rng, B=8)
    state = system.init_state(jax.random.PRNGKey(0), batch[0][:1])
    with pytest.raises(ValueError, match="not divisible"):
        system.train_step(state, batch, jax.random.PRNGKey(1))
