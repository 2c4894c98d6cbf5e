"""Permutation-invariant training wrapper
(reference: ``src/losses/pit_wrapper.py``).

The factorial path evaluates all n_src! permutations with a one-hot einsum
over the pairwise loss matrix — fully on-device, no host roundtrip. All
active configs have n_src<=2, so the Hungarian fallback (scipy, host) is
only used for n_src>3 outside jit (reference ``pit_wrapper.py:108-116``).
"""
from __future__ import annotations

from itertools import permutations
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np


class PITLossWrapper:
    """Callable: (ests, targets) -> mean best-permutation loss.

    pit_from:
      * ``pw_mtx``  — loss_func returns the (B, est, tgt) pairwise matrix
      * ``pw_pt``   — loss_func maps (B,T),(B,T) -> (B,); matrix built here
      * ``perm_avg``— loss_func maps (B,n,T),(B,n,T) -> (B,); evaluated per
        permutation
    """

    def __init__(self, loss_func: Callable, pit_from: str = "pw_mtx",
                 perm_reduce: Optional[Callable] = None):
        if pit_from not in ("pw_mtx", "pw_pt", "perm_avg"):
            raise ValueError(
                f"Unsupported loss function type {pit_from}: expected one of "
                "[pw_mtx, pw_pt, perm_avg]"
            )
        self.loss_func = loss_func
        self.pit_from = pit_from
        self.perm_reduce = perm_reduce

    def __call__(self, ests, targets, return_ests: bool = False, **kwargs):
        n_src = targets.shape[1]
        if self.pit_from == "pw_mtx":
            pw_loss = self.loss_func(ests, targets, **kwargs)
        elif self.pit_from == "pw_pt":
            pw_loss = self.get_pw_losses(self.loss_func, ests, targets, **kwargs)
        else:  # perm_avg
            min_loss, batch_indices = self.best_perm_from_perm_avg_loss(
                self.loss_func, ests, targets, **kwargs
            )
            mean_loss = jnp.mean(min_loss)
            if not return_ests:
                return mean_loss
            return mean_loss, self.reorder_source(ests, batch_indices)

        assert pw_loss.ndim == 3, "pairwise loss must be (batch, est, tgt)"
        min_loss, batch_indices = self.find_best_perm(pw_loss)
        mean_loss = jnp.mean(min_loss)
        if not return_ests:
            return mean_loss
        return mean_loss, self.reorder_source(ests, batch_indices)

    @staticmethod
    def get_pw_losses(loss_func, ests, targets, **kwargs):
        B, n_src, _ = targets.shape
        rows = []
        for i in range(n_src):
            cols = [loss_func(ests[:, i], targets[:, j], **kwargs) for j in range(n_src)]
            rows.append(jnp.stack(cols, axis=-1))
        return jnp.stack(rows, axis=1)  # (B, est, tgt)

    @staticmethod
    def best_perm_from_perm_avg_loss(loss_func, ests, targets, **kwargs):
        n_src = targets.shape[1]
        perms = jnp.asarray(list(permutations(range(n_src))), jnp.int32)
        loss_set = jnp.stack(
            [loss_func(ests[:, np.asarray(p)], targets, **kwargs) for p in perms],
            axis=1,
        )
        min_loss = jnp.min(loss_set, axis=1)
        idx = jnp.argmin(loss_set, axis=1)
        return min_loss, perms[idx]

    def find_best_perm(self, pair_wise_losses):
        n_src = pair_wise_losses.shape[-1]
        if self.perm_reduce is not None or n_src <= 3:
            return self.find_best_perm_factorial(pair_wise_losses)
        return self.find_best_perm_hungarian(pair_wise_losses)

    def find_best_perm_factorial(self, pair_wise_losses):
        n_src = pair_wise_losses.shape[-1]
        pwl = jnp.swapaxes(pair_wise_losses, -1, -2)  # (B, tgt, est)
        perms = np.asarray(list(permutations(range(n_src))))
        one_hot = np.zeros((len(perms), n_src, n_src), np.float32)
        for p, perm in enumerate(perms):
            one_hot[p, np.arange(n_src), perm] = 1.0
        if self.perm_reduce is None:
            loss_set = jnp.einsum("bij,pij->bp", pwl, jnp.asarray(one_hot)) / n_src
        else:
            pwl_set = jnp.stack(
                [pwl[:, np.arange(n_src), perm] for perm in perms], axis=1
            )  # (B, n_src!, n_src)
            loss_set = self.perm_reduce(pwl_set)
        min_loss = jnp.min(loss_set, axis=1)
        idx = jnp.argmin(loss_set, axis=1)
        return min_loss, jnp.asarray(perms)[idx]

    def find_best_perm_hungarian(self, pair_wise_losses):
        from scipy import optimize  # host fallback, n_src>3 only

        pwl = np.asarray(jnp.swapaxes(pair_wise_losses, -1, -2))
        batch_indices = np.stack(
            [optimize.linear_sum_assignment(m)[1] for m in pwl]
        )
        min_loss = jnp.mean(
            jnp.take_along_axis(jnp.asarray(pwl), jnp.asarray(batch_indices)[..., None], axis=2),
            axis=(-1, -2),
        )
        return min_loss, jnp.asarray(batch_indices)

    @staticmethod
    def reorder_source(source, batch_indices):
        return jnp.take_along_axis(
            source, batch_indices[..., None].astype(jnp.int32), axis=1
        )
