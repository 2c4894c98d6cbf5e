"""Trainer: the epoch orchestration the reference delegates to
pytorch-lightning (``pl.Trainer.fit``, train.py:135-148).

Single-controller JAX: one process drives all local devices through the
jit-compiled parallel step functions; host-side bookkeeping (schedulers,
early stop, checkpoints, TensorBoard scalars) runs between epochs exactly
like the reference's callbacks:

  * grad clip 5.0 (inside the step), AdamW from config
  * ReduceLROnPlateau(factor, patience) on val_loss when ``half_lr``
  * manual staircase when ``divide_lr_by`` is set
  * EarlyStopping(patience=15) when ``early_stop``
  * ModelCheckpoint(top_k=5 on val_loss) + last + resume
  * train_loss/val_loss/lr scalars with the epoch averages the reference
    logs via sync_dist (here losses come back already globally reduced)
"""
from __future__ import annotations

import json
import os
import signal
import time
from typing import Dict, Optional

import jax
import numpy as np

from .core import System, TrainState
from .checkpoint import CheckpointManager
from .optimizers import get_lr, set_lr
from .schedulers import ReduceLROnPlateau, StaircaseLR, EarlyStopping
from .tb_writer import TensorBoardLogger
from ..parallel import make_mesh, make_parallel_train_step, make_parallel_val_step, shard_batch


class Trainer:
    def __init__(
        self,
        system: System,
        exp_dir: str,
        epochs: int = 200,
        config: Optional[Dict] = None,
        half_lr: bool = True,
        sche_patience: int = 10,
        sche_factor: float = 0.5,
        divide_lr_by: Optional[float] = None,
        early_stop: bool = True,
        early_stop_patience: int = 15,
        save_top_k: int = 5,
        n_devices: Optional[int] = None,
        batch_size: Optional[int] = None,
        logger: Optional[TensorBoardLogger] = None,
        log_every: int = 50,
    ):
        self.system = system
        self.exp_dir = exp_dir
        self.epochs = epochs
        self.config = config or {}
        os.makedirs(exp_dir, exist_ok=True)

        if batch_size is None:
            batch_size = (self.config.get("training") or {}).get("batch_size")
        self.mesh = make_mesh(n_devices, batch_size=batch_size)
        self.train_step = make_parallel_train_step(system, self.mesh)
        self.val_step = make_parallel_val_step(system, self.mesh)

        self.ckpt = CheckpointManager(exp_dir, top_k=save_top_k, config=self.config)
        self.logger = logger or TensorBoardLogger(os.path.join(exp_dir, "tb"))
        self.log_every = log_every

        self.plateau = ReduceLROnPlateau(sche_factor, sche_patience) if half_lr else None
        lr0 = (self.config.get("optim") or {}).get("lr", 1e-3)
        self.staircase = (
            StaircaseLR(lr0, divide_lr_by, sche_patience) if divide_lr_by else None
        )
        self.early = EarlyStopping(early_stop_patience) if early_stop else None
        self.start_epoch = 0
        self._preempted = False

    # ------------------------------------------------------------------
    def _prep_batch(self, batch):
        """(mix, sources, [mouths], key, ...) -> device-sharded
        (mix, targets, mouths-or-None)."""
        mix, targets = batch[0], batch[1]
        mouths = None
        if len(batch) > 2 and isinstance(batch[2], np.ndarray):
            mouths = batch[2]
        return shard_batch((mix, targets, mouths), self.mesh)

    def resume(self, state: TrainState, checkpoint: Optional[str] = None) -> TrainState:
        """Resume from 'last' (or a named checkpoint dir)."""
        if checkpoint:
            state = self.ckpt.restore(state, os.path.basename(checkpoint))
            meta_path = os.path.join(self.ckpt.ckpt_dir,
                                     os.path.basename(checkpoint) + ".meta.json")
            if os.path.exists(meta_path):
                with open(meta_path) as f:
                    self.start_epoch = json.load(f).get("epoch", -1) + 1
            return state
        try:
            state, last = self.ckpt.restore_last(state)
            self.start_epoch = last.get("epoch", -1) + 1
            sched = last.get("schedulers", {})
            if self.plateau and "plateau" in sched:
                self.plateau.load_state_dict(sched["plateau"])
            if self.early and "early" in sched:
                self.early.load_state_dict(sched["early"])
            print(f"resumed from epoch {self.start_epoch}")
        except FileNotFoundError:
            pass
        return state

    # ------------------------------------------------------------------
    def _install_preempt_handlers(self):
        """SIGTERM/SIGUSR1 -> finish the current step, checkpoint, stop.

        TPU pod preemptions deliver SIGTERM with a grace window; the
        handler only sets a flag — the fit loop checkpoints at the next
        step boundary (the jitted step can't be interrupted mid-flight
        anyway). Returns the previous handlers for restoration.
        """
        previous = {}

        def _flag(signum, frame):
            self._preempted = True
            print(f"signal {signum}: checkpointing and stopping after the "
                  "current step", flush=True)

        for sig in (signal.SIGTERM, signal.SIGUSR1):
            try:
                previous[sig] = signal.signal(sig, _flag)
            except (ValueError, OSError):
                pass  # not the main thread / unsupported platform
        return previous

    def fit(self, state: TrainState, train_loader, val_loader,
            rng: Optional[jax.Array] = None) -> TrainState:
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        self.logger.log_hyperparams(self.config)
        global_step = int(state.step)
        self._preempted = False
        prev_handlers = self._install_preempt_handlers()
        try:
            return self._fit_loop(state, train_loader, val_loader, rng,
                                  global_step)
        finally:
            for sig, handler in prev_handlers.items():
                signal.signal(sig, handler)

    def _sched_state(self) -> Dict:
        sched_state = {}
        if self.plateau:
            sched_state["plateau"] = self.plateau.state_dict()
        if self.early:
            sched_state["early"] = self.early.state_dict()
        return sched_state

    def _fit_loop(self, state, train_loader, val_loader, rng, global_step):
        for epoch in range(self.start_epoch, self.epochs):
            epoch_t0 = time.time()
            train_loader.set_epoch(epoch)
            losses = []
            for batch in train_loader:
                rng, sub = jax.random.split(rng)
                state, metrics = self.train_step(state, self._prep_batch(batch), sub)
                global_step += 1
                if global_step % self.log_every == 0:
                    self.logger.add_scalar("train_loss_step",
                                           float(metrics["loss"]), global_step)
                losses.append(metrics["loss"])
                if self._preempted:
                    break
            if self._preempted:
                self.ckpt.save_preempt(state, epoch - 1,
                                       extra={"schedulers": self._sched_state()})
                print(f"preempted during epoch {epoch}: saved 'preempt' "
                      f"checkpoint; resume restarts epoch {epoch}", flush=True)
                break
            train_loss = float(np.mean([float(l) for l in losses])) if losses else float("nan")

            val_losses = []
            for batch in val_loader:
                out = self.val_step(state, self._prep_batch(batch))
                val_losses.append(float(out["val_loss"]))
                if self._preempted:
                    break
            if self._preempted:
                # training of this epoch IS complete — checkpoint now
                # (bounded by one val step) rather than after the whole
                # val sweep + epoch save, which could outlast the
                # preemption grace window on a large val set
                self.ckpt.save_preempt(state, epoch,
                                       extra={"schedulers": self._sched_state()})
                print(f"preempted during validation of epoch {epoch}: "
                      f"saved 'preempt' checkpoint; resume starts epoch "
                      f"{epoch + 1}", flush=True)
                break
            val_loss = float(np.mean(val_losses)) if val_losses else float("nan")

            lr = get_lr(state.opt_state)
            self.logger.add_scalar("train_loss", train_loss, epoch)
            self.logger.add_scalar("val_loss", val_loss, epoch)
            self.logger.add_scalar("train_sisnr", -train_loss, epoch)
            self.logger.add_scalar("val_sisnr", -val_loss, epoch)
            self.logger.add_scalar("learning_rate", lr, epoch)
            print(f"epoch {epoch}: train_loss={train_loss:.3f} "
                  f"val_loss={val_loss:.3f} lr={lr:.2e} "
                  f"({time.time() - epoch_t0:.1f}s)")

            # schedulers (reference: ReduceLROnPlateau on val_loss OR
            # manual staircase, core.py:203-211)
            new_lr = lr
            if self.staircase is not None:
                new_lr = self.staircase.step(epoch, new_lr)
            elif self.plateau is not None:
                new_lr = self.plateau.step(val_loss, new_lr)
            if new_lr != lr:
                state = state.replace(opt_state=set_lr(state.opt_state, new_lr))
                print(f"  lr -> {new_lr:.2e}")

            self.ckpt.save(state, epoch, val_loss,
                           extra={"schedulers": self._sched_state()})

            if self.early is not None and self.early.step(val_loss):
                print(f"early stopping at epoch {epoch}")
                break
            if self._preempted:
                # arrived during validation: the epoch checkpoint above
                # already captured the completed epoch — just stop.
                print(f"preempted after epoch {epoch}: stopping", flush=True)
                break

        self.logger.finalize()
        return state

    # ------------------------------------------------------------------
    def export_best(self, state_template: TrainState, model_name: str,
                    model_args: Dict) -> str:
        """Reload the best checkpoint and export best_model.ckpt
        (reference train.py:151-160).

        Degrades gracefully when no scored checkpoint exists (e.g. a
        preemption signal arrived before the first epoch completed):
        falls back to the 'last' checkpoint (preempt/crash state), and
        failing that exports the in-memory state — a partial artifact
        beats crashing after the preemption save already succeeded.

        ``state_template`` must be the LIVE post-fit state (as train.py
        passes), not an abstract/fresh-init template: the final fallback
        exports it verbatim, so a fresh-init template would silently
        ship untrained weights as best_model.ckpt.
        """
        from ..models import serialization

        try:
            best = self.ckpt.restore(state_template)
        except FileNotFoundError:
            try:
                best, _ = self.ckpt.restore_last(state_template)
                print("export_best: no scored checkpoint; "
                      "exporting the 'last' (preempt/crash) state", flush=True)
            except FileNotFoundError:
                best = state_template
                print("export_best: no checkpoints on disk; "
                      "exporting the in-memory state", flush=True)
        variables = {"params": best.params}
        if best.batch_stats:
            variables["batch_stats"] = best.batch_stats
        path = os.path.join(self.exp_dir, "best_model.ckpt")
        serialization.save_model(path, model_name, model_args, variables)
        return path
