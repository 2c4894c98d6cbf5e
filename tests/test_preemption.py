"""Preemption-safe training: SIGTERM mid-epoch -> checkpoint + clean stop
-> resume restarts the interrupted epoch from the mid-epoch parameters.

The reference's recovery story is crash-resume from the last *epoch*
checkpoint (train.py:148 ``ckpt_path``); preemptible TPU pods get a
SIGTERM grace window, so the Trainer upgrades that contract: the handler
flags the loop, the current jitted step finishes, and a 'preempt'
checkpoint (outside the top-k ledger) becomes the resume target without
losing the partial epoch's optimization progress.
"""
import json
import os
import signal

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rtfs_net_tpu.datas import DataLoader
from rtfs_net_tpu.losses import PITLossWrapper, pairwise_neg_snr, pairwise_neg_sisdr
from rtfs_net_tpu.models import AVNet
from rtfs_net_tpu.system import System, Trainer, make_optimizer
from tests.test_e2e import FakeDataset
from tests.test_system import TINY_AUDIONET


class PreemptingLoader:
    """Delivers SIGTERM to this process while handing out the batch at
    (epoch, index) — the flag is set before the trainer steps it, so the
    step still runs and the loop stops at the following boundary."""

    def __init__(self, loader, at_epoch: int, at_batch: int):
        self.loader = loader
        self.at_epoch, self.at_batch = at_epoch, at_batch
        self.epoch = -1

    def set_epoch(self, epoch):
        self.epoch = epoch
        self.loader.set_epoch(epoch)

    def __iter__(self):
        for i, batch in enumerate(self.loader):
            if self.epoch == self.at_epoch and i == self.at_batch:
                os.kill(os.getpid(), signal.SIGTERM)
            yield batch


def _make(exp_dir):
    model = AVNet(**TINY_AUDIONET)
    system = System(
        model, make_optimizer("adamw", lr=1e-3, weight_decay=0.1),
        {"train": PITLossWrapper(pairwise_neg_snr),
         "val": PITLossWrapper(pairwise_neg_sisdr)},
    )
    state = system.init_state(
        jax.random.PRNGKey(0), jnp.zeros((1, 2000)), jnp.zeros((1, 16, 5)))
    trainer = Trainer(system, exp_dir=exp_dir, epochs=4,
                      config={"optim": {"lr": 1e-3}})
    return system, trainer, state


def test_sigterm_checkpoints_and_resumes(tmp_path):
    exp_dir = str(tmp_path / "exp")
    system, trainer, state = _make(exp_dir)
    train_loader = PreemptingLoader(
        DataLoader(FakeDataset(16), batch_size=8, shuffle=True),
        at_epoch=1, at_batch=0)
    val_loader = DataLoader(FakeDataset(8, seed=1), batch_size=8)

    final = trainer.fit(state, train_loader, val_loader)

    # epoch 0 ran fully (2 batches), epoch 1 stopped after its 1st step
    assert int(final.step) == 3
    assert os.path.isdir(os.path.join(exp_dir, "checkpoints", "preempt"))
    last = json.load(open(os.path.join(exp_dir, "checkpoints", "last.json")))
    assert last["name"] == "preempt" and last["preempted"]
    assert last["epoch"] == 0  # completed epochs
    # the preempt checkpoint never enters the top-k ledger
    ledger = json.load(open(os.path.join(exp_dir, "best_k_models.json")))
    assert "preempt" not in ledger
    # the original SIGTERM disposition was restored on exit
    assert signal.getsignal(signal.SIGTERM) == signal.SIG_DFL

    # resume: fresh trainer + fresh state -> restarts the interrupted epoch
    system2, trainer2, _ = _make(exp_dir)
    fresh = system2.init_state(
        jax.random.PRNGKey(7), jnp.zeros((1, 2000)), jnp.zeros((1, 16, 5)))
    resumed = trainer2.resume(fresh)
    assert trainer2.start_epoch == 1
    got = jax.device_get(resumed.params)
    want = jax.device_get(final.params)
    for g, w in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(want)):
        np.testing.assert_array_equal(g, w)

    # and training continues to completion from there
    plain_loader = DataLoader(FakeDataset(16), batch_size=8, shuffle=True)
    done = trainer2.fit(resumed, plain_loader, val_loader)
    assert int(done.step) == 3 + 3 * 2  # epochs 1..3, 2 batches each


def test_export_best_survives_preemption_before_first_epoch(tmp_path):
    """A preemption before ANY scored (epoch) checkpoint exists must not
    crash the train CLI's trailing ``export_best`` — it falls back to the
    'preempt' state; with no checkpoints at all it exports the in-memory
    state (reference train.py:151-160 always exports after fit)."""
    from rtfs_net_tpu.models.serialization import load_model

    exp_dir = str(tmp_path / "exp")
    system, trainer, state = _make(exp_dir)
    # SIGTERM while handing out the very first batch: the step runs, the
    # loop stops at the boundary -> only the 'preempt' ckpt exists
    train_loader = PreemptingLoader(
        DataLoader(FakeDataset(16), batch_size=8, shuffle=True),
        at_epoch=0, at_batch=0)
    val_loader = DataLoader(FakeDataset(8, seed=1), batch_size=8)
    final = trainer.fit(state, train_loader, val_loader)
    assert int(final.step) == 1
    # no scored checkpoint: the ledger is only written by epoch saves
    ledger_path = os.path.join(exp_dir, "best_k_models.json")
    assert not os.path.exists(ledger_path) or not json.load(open(ledger_path))

    path = trainer.export_best(final, "AVNet", TINY_AUDIONET)
    assert os.path.isfile(path)
    _, variables, _ = load_model(path)
    got = jax.tree_util.tree_leaves(jax.device_get(variables["params"]))
    want = jax.tree_util.tree_leaves(jax.device_get(final.params))
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)

    # no checkpoints at all (fit never ran): exports the in-memory state
    exp_dir2 = str(tmp_path / "exp2")
    _, trainer2, state2 = _make(exp_dir2)
    path2 = trainer2.export_best(state2, "AVNet", TINY_AUDIONET)
    assert os.path.isfile(path2)


def test_preempt_during_validation_checkpoints_immediately(tmp_path):
    """A signal landing in the validation sweep must checkpoint within ONE
    val step (training of the epoch is complete), not after the whole
    sweep + epoch save — a large val set could outlast the preemption
    grace window. Resume starts the NEXT epoch."""
    exp_dir = str(tmp_path / "exp")
    system, trainer, state = _make(exp_dir)

    class PreemptOnVal:
        def __init__(self, loader):
            self.loader = loader
            self.batches_served = 0

        def set_epoch(self, epoch):
            self.loader.set_epoch(epoch)

        def __iter__(self):
            os.kill(os.getpid(), signal.SIGTERM)
            for batch in self.loader:
                self.batches_served += 1
                yield batch

    train_loader = DataLoader(FakeDataset(16), batch_size=8, shuffle=True)
    val_loader = PreemptOnVal(DataLoader(FakeDataset(16, seed=1), batch_size=8))
    final = trainer.fit(state, train_loader, val_loader)

    # epoch 0 completed training (2 steps); the val sweep stopped after
    # its first batch and the preempt checkpoint records epoch 0 complete
    assert int(final.step) == 2
    assert val_loader.batches_served == 1
    last = json.load(open(os.path.join(exp_dir, "checkpoints", "last.json")))
    assert last["name"] == "preempt" and last["preempted"]
    assert last["epoch"] == 0  # completed epochs -> resume starts epoch 1

    system2, trainer2, _ = _make(exp_dir)
    fresh = system2.init_state(
        jax.random.PRNGKey(7), jnp.zeros((1, 2000)), jnp.zeros((1, 16, 5)))
    resumed = trainer2.resume(fresh)
    assert trainer2.start_epoch == 1
    got = jax.device_get(resumed.params)
    want = jax.device_get(final.params)
    for g, w in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(want)):
        np.testing.assert_array_equal(g, w)
