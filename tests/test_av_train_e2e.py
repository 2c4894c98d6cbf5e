"""Audio-visual end-to-end in CI: raw mouth frames -> frozen AE video
backbone -> CAF fusion -> train step improves (the full AV path that the
TPU smoke exercises, here on the CPU mesh with the light AE backbone)."""
import numpy as np

import jax
import jax.numpy as jnp

from rtfs_net_tpu.models import AVNet
from rtfs_net_tpu.models.videomodels import AEVideoModel
from rtfs_net_tpu.losses import PITLossWrapper, pairwise_neg_snr, pairwise_neg_sisdr
from rtfs_net_tpu.system import System, make_optimizer
from tests.test_system import TINY_AUDIONET


def test_av_training_with_raw_mouths(rng):
    # AE backbone: 88->11 spatial, C=16 -> embedding dim 16*11*11 = 1936
    vmodel = AEVideoModel(in_channels=1, base_channels=4, num_layers=3)
    vvars = vmodel.init(jax.random.PRNGKey(1), jnp.zeros((1, 1, 2, 88, 88)))
    emb_dim = 16 * 11 * 11

    conf = {**TINY_AUDIONET}
    conf["pretrained_vout_chan"] = emb_dim
    model = AVNet(**conf)

    system = System(
        model, make_optimizer("adamw", lr=2e-3, weight_decay=0.1),
        {"train": PITLossWrapper(pairwise_neg_snr),
         "val": PITLossWrapper(pairwise_neg_sisdr)},
        video_apply=lambda m: vmodel.apply(vvars, m),
    )

    B, L, TV = 2, 2000, 4
    src = jnp.asarray(rng.standard_normal((B, L)).astype(np.float32))
    noise = jnp.asarray(rng.standard_normal((B, L)).astype(np.float32))
    mix = src + 0.5 * noise
    mouths = jnp.asarray(rng.standard_normal((B, 1, TV, 88, 88)).astype(np.float32))
    batch = (mix, src[:, None], mouths)

    state = system.init_state(jax.random.PRNGKey(0), mix, mouths)
    step = jax.jit(system.train_step)
    key = jax.random.PRNGKey(2)
    losses = []
    for _ in range(12):
        key, sub = jax.random.split(key)
        state, m = step(state, batch, sub)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses

    # the train state holds only the separator's params ("encoder" here is
    # AVNet's STFT encoder); the frozen video backbone's live outside it
    n_state = sum(x.size for x in jax.tree.leaves(state.params))
    n_video = sum(x.size for x in jax.tree.leaves(vvars["params"]))
    n_total_model = sum(
        x.size for x in jax.tree.leaves(
            model.init(jax.random.PRNGKey(3), mix, system.mouth_embedding(mouths))["params"])
    )
    assert n_state == n_total_model
    assert n_video > 0
    out = system.separate(state, mix, mouths)
    assert out.shape == (B, 1, L)
