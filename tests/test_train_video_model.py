"""Video backbone as a first-class citizen of TrainState.

The reference can unfreeze and train the video model
(``src/system/core.py:86-89`` gates no_grad on ``train_video_model``).
Here the backbone's variables ride in ``TrainState.video_params`` /
``video_stats``: ``train_video_model=True`` must actually update them,
``False`` must keep them bit-stable, and BN stats stay frozen either way
(reference ``frcnn_videomodel.py:78-83``).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rtfs_net_tpu.models import AVNet
from rtfs_net_tpu.models.videomodels import AEVideoModel
from rtfs_net_tpu.losses import PITLossWrapper, pairwise_neg_snr, pairwise_neg_sisdr
from rtfs_net_tpu.system import System, make_optimizer
from tests.test_system import TINY_AUDIONET

EMB_DIM = 16 * 11 * 11  # AE backbone: 88->11 spatial, C=16


def _make_system(train_video_model):
    vmodel = AEVideoModel(in_channels=1, base_channels=4, num_layers=3)
    vvars = vmodel.init(jax.random.PRNGKey(1), jnp.zeros((1, 1, 2, 88, 88)))
    conf = {**TINY_AUDIONET, "pretrained_vout_chan": EMB_DIM}
    model = AVNet(**conf)
    system = System(
        model, make_optimizer("adamw", lr=2e-3, weight_decay=0.1),
        {"train": PITLossWrapper(pairwise_neg_snr),
         "val": PITLossWrapper(pairwise_neg_sisdr)},
        video_model=vmodel,
        video_variables=vvars,
        train_video_model=train_video_model,
    )
    return system, vvars


def _batch(rng, B=2, L=2000, TV=4):
    src = jnp.asarray(rng.standard_normal((B, L)).astype(np.float32))
    noise = jnp.asarray(rng.standard_normal((B, L)).astype(np.float32))
    mix = src + 0.5 * noise
    mouths = jnp.asarray(rng.standard_normal((B, 1, TV, 88, 88)).astype(np.float32))
    return (mix, src[:, None], mouths)


@pytest.mark.parametrize("train_video", [True, False])
def test_video_params_update_iff_flag(rng, train_video):
    system, vvars = _make_system(train_video)
    batch = _batch(rng)
    state = system.init_state(jax.random.PRNGKey(0), batch[0], batch[2])

    # video variables landed in the state, not the jit closure
    assert state.video_params is not None
    v0 = jax.tree.map(np.asarray, state.video_params)

    step = jax.jit(system.train_step)
    key = jax.random.PRNGKey(2)
    for _ in range(3):
        key, sub = jax.random.split(key)
        state, m = step(state, batch, sub)
    assert np.isfinite(float(m["loss"]))

    leaves0 = jax.tree.leaves(v0)
    leaves1 = jax.tree.leaves(jax.tree.map(np.asarray, state.video_params))
    changed = [not np.array_equal(a, b) for a, b in zip(leaves0, leaves1)]
    if train_video:
        assert any(changed), "video params did not train"
    else:
        assert not any(changed), "frozen video params drifted"


def test_frozen_state_path_matches_legacy_closure(rng):
    """The state-carried frozen backbone and the legacy video_apply
    closure produce identical separations."""
    system, vvars = _make_system(False)
    batch = _batch(rng)
    state = system.init_state(jax.random.PRNGKey(0), batch[0], batch[2])
    out_state = np.asarray(system.separate(state, batch[0], batch[2]))

    vmodel = AEVideoModel(in_channels=1, base_channels=4, num_layers=3)
    legacy = System(
        system.model, system.optimizer, system.loss_func,
        video_apply=lambda m: vmodel.apply(vvars, m),
    )
    legacy_state = legacy.init_state(jax.random.PRNGKey(0), batch[0], batch[2])
    out_legacy = np.asarray(legacy.separate(legacy_state, batch[0], batch[2]))
    np.testing.assert_array_equal(out_state, out_legacy)


def test_video_training_improves_loss(rng):
    """With the separator tiny and the backbone trainable, loss still
    decreases (sanity that video grads are sane, not just nonzero)."""
    system, _ = _make_system(True)
    batch = _batch(rng)
    state = system.init_state(jax.random.PRNGKey(0), batch[0], batch[2])
    step = jax.jit(system.train_step)
    key = jax.random.PRNGKey(2)
    losses = []
    for _ in range(10):
        key, sub = jax.random.split(key)
        state, m = step(state, batch, sub)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
