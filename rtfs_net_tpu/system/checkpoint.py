"""Checkpointing (reference semantics: Lightning
``ModelCheckpoint(monitor=val_loss, save_top_k=5, save_last=True)`` +
``best_k_models.json`` score ledger + full training-config embed —
``train.py:118-126,151-153``, ``core.py:178-181``).

Orbax persists the TrainState pytree; host-side bookkeeping (top-k
pruning, score ledger, scheduler/early-stop state, config) lives in JSON
next to the checkpoint dirs.
"""
from __future__ import annotations

import json
import os
import shutil
from typing import Dict, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, exp_dir: str, top_k: int = 5, monitor: str = "val_loss",
                 config: Optional[Dict] = None):
        self.exp_dir = os.path.abspath(exp_dir)
        self.ckpt_dir = os.path.join(self.exp_dir, "checkpoints")
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self.top_k = top_k
        self.monitor = monitor
        self.config = config or {}
        self.best_k: Dict[str, float] = {}
        self._ckptr = ocp.StandardCheckpointer()
        self._ledger_path = os.path.join(self.exp_dir, "best_k_models.json")
        if os.path.exists(self._ledger_path):
            with open(self._ledger_path) as f:
                self.best_k = json.load(f)

    # ------------------------------------------------------------------
    def _path(self, name: str) -> str:
        return os.path.join(self.ckpt_dir, name)

    def save(self, state, epoch: int, score: float, extra: Optional[Dict] = None):
        """Save an epoch checkpoint; keep top-k by monitor + 'last'."""
        name = f"epoch{epoch}"
        path = self._path(name)
        if os.path.exists(path):
            shutil.rmtree(path)
        self._ckptr.save(path, state)
        self._ckptr.wait_until_finished()
        meta = {"epoch": epoch, self.monitor: score,
                "training_config": self.config, **(extra or {})}
        with open(path + ".meta.json", "w") as f:
            json.dump(meta, f, indent=2, default=str)

        self.best_k[name] = float(score)
        # prune beyond top_k (min is best: val_loss)
        while len(self.best_k) > self.top_k:
            worst = max(self.best_k, key=self.best_k.get)
            self.best_k.pop(worst)
            if worst != name:
                shutil.rmtree(self._path(worst), ignore_errors=True)
                try:
                    os.remove(self._path(worst) + ".meta.json")
                except OSError:
                    pass
            if worst == name:
                break
        with open(self._ledger_path, "w") as f:
            json.dump(self.best_k, f, indent=2)

        # 'last' marker
        with open(self._path("last.json"), "w") as f:
            json.dump({"name": name, "epoch": epoch, **(extra or {})}, f, default=str)

    # ------------------------------------------------------------------
    def save_preempt(self, state, completed_epoch: int,
                     extra: Optional[Dict] = None):
        """Preemption save: mid-epoch state, outside the top-k ledger.

        Points ``last.json`` at it with ``epoch=completed_epoch`` so
        :meth:`restore_last` resumes by restarting the interrupted epoch
        from the saved (mid-epoch) parameters — the same
        epoch-granularity contract as crash-resume, but without losing
        the partial epoch's optimization progress.
        """
        path = self._path("preempt")
        if os.path.exists(path):
            shutil.rmtree(path)
        self._ckptr.save(path, state)
        self._ckptr.wait_until_finished()
        meta = {"epoch": completed_epoch, "preempted": True,
                "training_config": self.config, **(extra or {})}
        with open(path + ".meta.json", "w") as f:
            json.dump(meta, f, indent=2, default=str)
        with open(self._path("last.json"), "w") as f:
            json.dump({"name": "preempt", "epoch": completed_epoch,
                       "preempted": True, **(extra or {})}, f, default=str)

    # ------------------------------------------------------------------
    def best_name(self) -> Optional[str]:
        if not self.best_k:
            return None
        return min(self.best_k, key=self.best_k.get)

    def restore(self, state_template, name: Optional[str] = None):
        """Restore a TrainState (by name, or the best one)."""
        name = name or self.best_name()
        if name is None:
            raise FileNotFoundError("no checkpoints saved")
        return self._ckptr.restore(self._path(name), state_template)

    def restore_last(self, state_template):
        last_path = self._path("last.json")
        if not os.path.exists(last_path):
            raise FileNotFoundError("no 'last' checkpoint")
        with open(last_path) as f:
            last = json.load(f)
        return self.restore(state_template, last["name"]), last
