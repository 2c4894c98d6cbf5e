"""Training system: loss decreases on a tiny overfit task; schedulers and
optimizer plumbing behave."""
import numpy as np
import pytest
import yaml

import jax
import jax.numpy as jnp

from rtfs_net_tpu.models import AVNet
from rtfs_net_tpu.losses import PITLossWrapper, pairwise_neg_snr, pairwise_neg_sisdr
from rtfs_net_tpu.system import (
    System, make_optimizer, get_lr, set_lr,
    ReduceLROnPlateau, StaircaseLR, EarlyStopping, online_mixing_collate,
)

TINY_AUDIONET = {
    "n_src": 1,
    "pretrained_vout_chan": 16,
    "video_bn_params": {"kernel_size": -1},
    "audio_bn_params": {"pre_norm_type": "gLN", "pre_act_type": "ReLU",
                        "out_chan": 16, "kernel_size": 1, "is2d": True},
    "enc_dec_params": {"encoder_type": "STFTEncoder", "decoder_type": "STFTDecoder",
                       "win": 64, "hop_length": 32, "out_chan": 16,
                       "kernel_size": 3, "stride": 1, "bias": False,
                       "act_type": None, "norm_type": None},
    "audio_params": {"audio_net": "TDANet", "hid_chan": 8, "kernel_size": 4,
                     "stride": 2, "norm_type": "gLN", "act_type": "PReLU",
                     "upsampling_depth": 2, "repeats": 2, "shared": True,
                     "is2d": True,
                     "layers": {
                         "layer_1": {"layer_type": "DualPathRNN", "hid_chan": 4,
                                     "dim": 4, "kernel_size": 8, "stride": 1,
                                     "rnn_type": "SRU", "num_layers": 2,
                                     "bidirectional": True},
                         "layer_2": {"layer_type": "MultiHeadSelfAttention2D",
                                     "dim": 3, "n_freqs": 16, "n_head": 2,
                                     "hid_chan": 2, "act_type": "PReLU",
                                     "norm_type": "LayerNormalization4D"},
                     }},
    "video_params": {"video_net": "TDANet", "hid_chan": 8, "kernel_size": 3,
                     "stride": 2, "norm_type": "BatchNorm1d", "act_type": "PReLU",
                     "upsampling_depth": 2, "repeats": 1, "shared": True,
                     "is2d": False,
                     "layers": {"layer_1": {"layer_type": "GlobalAttention",
                                            "ffn_name": "FeedForwardNetwork",
                                            "kernel_size": 3, "n_head": 2,
                                            "dropout": 0.1}}},
    "fusion_params": {"fusion_type": "ATTNFusion", "fusion_shared": True,
                      "kernel_size": 4, "is2d": True},
    "mask_generation_params": {"mask_generator_type": "MaskGenerator",
                               "mask_act": "ReLU", "RI_split": True,
                               "is2d": True},
}


@pytest.fixture(scope="module")
def tiny_setup():
    model = AVNet(**TINY_AUDIONET)
    system = System(
        model,
        make_optimizer("adamw", lr=1e-3, weight_decay=0.1),
        {"train": PITLossWrapper(pairwise_neg_snr),
         "val": PITLossWrapper(pairwise_neg_sisdr)},
    )
    rng = np.random.default_rng(0)
    B, L, Tv = 2, 2000, 5
    mix = jnp.asarray(rng.standard_normal((B, L)).astype(np.float32))
    tgt = mix[:, None, :]
    mouth = jnp.asarray(rng.standard_normal((B, 16, Tv)).astype(np.float32))
    state = system.init_state(jax.random.PRNGKey(0), mix, mouth)
    return system, state, (mix, tgt, mouth)


def test_train_step_overfits(tiny_setup):
    system, state, batch = tiny_setup
    step = jax.jit(system.train_step)
    losses = []
    rng = jax.random.PRNGKey(1)
    for i in range(30):
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, batch, sub)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] - 3.0, losses  # >3 dB SNR gain overfitting
    assert int(state.step) == 30
    assert np.isfinite(losses).all()


def test_val_step(tiny_setup):
    system, state, batch = tiny_setup
    out = jax.jit(system.val_step)(state, batch)
    assert np.isfinite(float(out["val_loss"]))


def test_frozen_video_gets_no_grad():
    """video branch runs under stop_gradient unless train_video_model."""
    calls = []

    def fake_video_apply(m):
        calls.append(1)
        return m * 2.0

    model = AVNet(**TINY_AUDIONET)
    system = System(
        model, make_optimizer("adam", lr=1e-3),
        {"train": PITLossWrapper(pairwise_neg_snr),
         "val": PITLossWrapper(pairwise_neg_sisdr)},
        video_apply=fake_video_apply,
    )
    rng = np.random.default_rng(0)
    mix = jnp.asarray(rng.standard_normal((1, 2000)).astype(np.float32))
    mouth = jnp.asarray(rng.standard_normal((1, 16, 5)).astype(np.float32))
    state = system.init_state(jax.random.PRNGKey(0), mix, mouth)
    state2, m = system.train_step(state, (mix, mix[:, None], mouth), jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))
    assert calls  # video path executed


def test_lr_plumbing():
    opt = make_optimizer("adamw", lr=1e-3, weight_decay=0.1)
    params = {"w": jnp.ones(3)}
    st = opt.init(params)
    assert abs(get_lr(st) - 1e-3) < 1e-9
    st = set_lr(st, 5e-4)
    assert abs(get_lr(st) - 5e-4) < 1e-9
    # update still works after mutation
    g = {"w": jnp.ones(3)}
    upd, st2 = opt.update(g, st, params)
    assert np.isfinite(np.asarray(upd["w"])).all()


def test_reduce_lr_on_plateau():
    s = ReduceLROnPlateau(factor=0.5, patience=2)
    lr = 1e-3
    lr = s.step(1.0, lr); lr = s.step(1.0, lr); lr = s.step(1.0, lr)
    assert lr == 1e-3  # bad epochs = patience, not yet > patience
    lr = s.step(1.0, lr)
    assert lr == 5e-4


def test_staircase_and_early_stopping():
    st = StaircaseLR(lr0=1e-3, divide_by=2.0, every=5)
    assert st.step(0, 1e-3) == 1e-3
    assert st.step(5, 1e-3) == 5e-4
    assert st.step(10, 5e-4) == 2.5e-4

    es = EarlyStopping(patience=2)
    assert not es.step(1.0)
    assert not es.step(1.1)
    assert es.step(1.2)


def test_online_mixing_collate(rng):
    targets = jnp.asarray(rng.standard_normal((4, 2, 100)).astype(np.float32))
    mix, new_targets = online_mixing_collate(jax.random.PRNGKey(0), targets)
    assert mix.shape == (4, 100)
    assert new_targets.shape == targets.shape
    np.testing.assert_allclose(np.asarray(new_targets.sum(1)), np.asarray(mix), atol=1e-5)
    # energy matching preserves per-slot energy
    np.testing.assert_allclose(
        np.asarray(jnp.sum(new_targets ** 2, -1)),
        np.asarray(jnp.sum(targets ** 2, -1)), rtol=1e-3,
    )


def test_online_mix_wired_into_train_step(rng):
    """``System(online_mix=True)`` remixes the audio-only batch INSIDE the
    jitted train step (reference core.py:96-98): the loss becomes
    independent of the dataloader's mixture (it is replaced by the
    energy-matched re-sum of permuted sources), while the flag off makes it
    depend on the mixture — and training still improves under the flag."""
    conf = {**TINY_AUDIONET, "video_params": {}, "fusion_params": {},
            "video_bn_params": {}}
    model = AVNet(**conf)
    losses = {"train": PITLossWrapper(pairwise_neg_snr),
              "val": PITLossWrapper(pairwise_neg_sisdr)}

    def mk(om):
        return System(model, make_optimizer("adamw", lr=1e-3, weight_decay=0.1),
                      losses, online_mix=om)

    B, L = 4, 2000
    src = jnp.asarray(rng.standard_normal((B, 1, L)).astype(np.float32))
    mix_a = jnp.asarray(rng.standard_normal((B, L)).astype(np.float32))
    mix_b = jnp.asarray(rng.standard_normal((B, L)).astype(np.float32))
    sys_on, sys_off = mk(True), mk(False)
    state = sys_on.init_state(jax.random.PRNGKey(0), mix_a, None)
    key = jax.random.PRNGKey(5)

    step_on = jax.jit(sys_on.train_step)
    step_off = jax.jit(sys_off.train_step)
    _, on_a = step_on(state, (mix_a, src, None), key)
    _, on_b = step_on(state, (mix_b, src, None), key)
    _, off_a = step_off(state, (mix_a, src, None), key)
    _, off_b = step_off(state, (mix_b, src, None), key)
    # flag ON: the batch the loss sees no longer contains the input mixture
    assert float(on_a["loss"]) == float(on_b["loss"])
    # flag OFF: it does
    assert float(off_a["loss"]) != float(off_b["loss"])

    # and the remixed objective still trains
    ls = []
    for i in range(20):
        key, sub = jax.random.split(key)
        state, m = step_on(state, (mix_a, src, None), sub)
        ls.append(float(m["loss"]))
    assert np.isfinite(ls).all()
    assert min(ls[-5:]) < ls[0]


def test_bf16_mixed_precision_training():
    """compute_dtype=bfloat16: params stay fp32, loss finite, training
    still improves."""
    model = AVNet(**TINY_AUDIONET)
    system = System(
        model, make_optimizer("adamw", lr=2e-3, weight_decay=0.1),
        {"train": PITLossWrapper(pairwise_neg_snr),
         "val": PITLossWrapper(pairwise_neg_sisdr)},
        compute_dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(7)
    mix = jnp.asarray(rng.standard_normal((2, 2000)).astype(np.float32))
    mouth = jnp.asarray(rng.standard_normal((2, 16, 5)).astype(np.float32))
    batch = (mix, mix[:, None], mouth)
    state = system.init_state(jax.random.PRNGKey(0), mix, mouth)
    assert all(x.dtype == jnp.float32 for x in jax.tree.leaves(state.params))
    step = jax.jit(system.train_step)
    key = jax.random.PRNGKey(1)
    losses = []
    for _ in range(15):
        key, sub = jax.random.split(key)
        state, m = step(state, batch, sub)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert all(x.dtype == jnp.float32 for x in jax.tree.leaves(state.params))
