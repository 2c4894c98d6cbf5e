"""End-to-end: synthetic data -> multi-device Trainer.fit -> top-k
checkpoints -> best-model export -> reload -> eval metrics. This is the
local_test.py path under CI (8 virtual CPU devices)."""
import glob
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rtfs_net_tpu.datas import DataLoader
from rtfs_net_tpu.losses import PITLossWrapper, pairwise_neg_snr, pairwise_neg_sisdr
from rtfs_net_tpu.models import AVNet, serialization
from rtfs_net_tpu.system import System, Trainer, make_optimizer
from tests.test_system import TINY_AUDIONET


class FakeDataset:
    def __init__(self, n, L=2000, vout=16, tv=5, seed=0):
        self.n, self.L, self.vout, self.tv = n, L, vout, tv
        self.rng = np.random.default_rng(seed)
        self.items = [
            (self.rng.standard_normal(L).astype(np.float32),
             self.rng.standard_normal(L).astype(np.float32),
             self.rng.standard_normal((vout, tv)).astype(np.float32),
             f"utt{i}")
            for i in range(n)
        ]

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return self.items[i]


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    exp_dir = str(tmp_path_factory.mktemp("exp"))
    assert len(jax.devices()) == 8
    model = AVNet(**TINY_AUDIONET)
    system = System(
        model, make_optimizer("adamw", lr=1e-3, weight_decay=0.1),
        {"train": PITLossWrapper(pairwise_neg_snr),
         "val": PITLossWrapper(pairwise_neg_sisdr)},
    )
    train_loader = DataLoader(FakeDataset(16), batch_size=8, shuffle=True)
    val_loader = DataLoader(FakeDataset(8, seed=1), batch_size=8)
    state = system.init_state(
        jax.random.PRNGKey(0), jnp.zeros((1, 2000)), jnp.zeros((1, 16, 5))
    )
    trainer = Trainer(system, exp_dir=exp_dir, epochs=2,
                      config={"optim": {"lr": 1e-3}}, sche_patience=10)
    state = trainer.fit(state, train_loader, val_loader)
    return exp_dir, trainer, system, state


def test_fit_produces_checkpoints_and_logs(trained):
    exp_dir, trainer, system, state = trained
    assert int(state.step) == 2 * 2  # 2 epochs x 2 batches
    ledger = json.load(open(os.path.join(exp_dir, "best_k_models.json")))
    assert len(ledger) == 2
    assert os.path.exists(os.path.join(exp_dir, "checkpoints", "last.json"))
    assert glob.glob(os.path.join(exp_dir, "tb", "**", "events.out.tfevents.*"),
                     recursive=True)


def test_export_reload_and_infer(trained):
    exp_dir, trainer, system, state = trained
    path = trainer.export_best(state, "AVNet", TINY_AUDIONET)
    model2, v2, header = serialization.load_model(path)
    assert header["model_name"] == "AVNet"
    mix = jnp.zeros((2, 2000))
    emb = jnp.zeros((2, 16, 5))
    out = model2.apply(v2, mix, emb)
    assert out.shape == (2, 1, 2000)


def test_resume_from_last(trained):
    exp_dir, trainer, system, state = trained
    fresh = system.init_state(
        jax.random.PRNGKey(42), jnp.zeros((1, 2000)), jnp.zeros((1, 16, 5))
    )
    resumed = trainer.resume(fresh)
    assert trainer.start_epoch == 2
    # resumed params equal the trained ones, not the fresh ones
    a_host = jax.device_get(resumed.params)
    b_host = jax.device_get(state.params)
    same = jax.tree.map(lambda a, b: bool(np.allclose(a, b)), a_host, b_host)
    assert all(jax.tree.leaves(same))


def test_training_improves_on_real_separation_task():
    """A/B: 30 steps on a fixed batch must improve SI-SDR vs init."""
    model = AVNet(**TINY_AUDIONET)
    system = System(
        model, make_optimizer("adamw", lr=2e-3, weight_decay=0.1),
        {"train": PITLossWrapper(pairwise_neg_snr),
         "val": PITLossWrapper(pairwise_neg_sisdr)},
    )
    rng = np.random.default_rng(3)
    B, L = 8, 2000
    src = jnp.asarray(rng.standard_normal((B, L)).astype(np.float32))
    noise = jnp.asarray(rng.standard_normal((B, L)).astype(np.float32))
    mix = src + 0.5 * noise
    mouth = jnp.asarray(rng.standard_normal((B, 16, 5)).astype(np.float32))
    batch = (mix, src[:, None], mouth)
    state = system.init_state(jax.random.PRNGKey(0), mix, mouth)
    val0 = float(system.val_step(state, batch)["val_loss"])
    step = jax.jit(system.train_step)
    key = jax.random.PRNGKey(1)
    for _ in range(30):
        key, sub = jax.random.split(key)
        state, _ = step(state, batch, sub)
    val1 = float(system.val_step(state, batch)["val_loss"])
    assert val1 < val0 - 1.0, (val0, val1)
