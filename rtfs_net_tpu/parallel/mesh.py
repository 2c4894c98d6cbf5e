"""Mesh + sharding helpers for data-parallel training.

The train/val steps from ``rtfs_net_tpu.system.core`` are pure functions, so
data parallelism is one ``jax.jit`` with NamedShardings: state replicated,
batch split on the ``data`` axis. XLA lowers the implied gradient reduction
to a psum over ICI (reference equivalence: DDP gradient all-reduce +
``sync_dist=True`` loss logging, ``train.py:135-146``, ``core.py:121``).

BatchNorm sync note: the reference trains with ``sync_batchnorm=True``.
Under jit-with-shardings the batch-stat means are computed over the GLOBAL
batch automatically (the reduction over the sharded batch axis is a
cross-device reduction), so sync-BN falls out for free — stronger than
per-rank BN + EMA sync.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data",
              batch_size: Optional[int] = None) -> Mesh:
    """1-D mesh over the local devices. When ``batch_size`` is given the
    mesh is clamped to the largest device count that divides it (a batch
    of 2 on an 8-chip host runs on 2 chips rather than failing)."""
    devices = jax.devices()
    n = n_devices or len(devices)
    n = min(n, len(devices))
    if batch_size is not None:
        while batch_size % n:
            n -= 1
    return Mesh(np.asarray(devices[:n]), (axis,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a host batch tuple with axis 0 sharded over the mesh."""
    sh = batch_sharded(mesh, axis)
    return jax.tree.map(
        lambda x: jax.device_put(x, sh) if x is not None else None, batch,
        is_leaf=lambda x: x is None,
    )


def make_parallel_train_step(system, mesh: Mesh, axis: str = "data", donate: bool = True):
    """jit the System train step over the mesh: state replicated, batch
    sharded. Loss comes back replicated (XLA all-reduces it)."""
    rep = replicated(mesh)
    shd = batch_sharded(mesh, axis)

    def batch_shardings(batch):
        return jax.tree.map(
            lambda x: shd if x is not None else None, batch,
            is_leaf=lambda x: x is None,
        )

    def compiled_for(batch):
        return jax.jit(
            system.train_step,
            in_shardings=(rep, batch_shardings(batch), rep),
            out_shardings=(rep, rep),
            donate_argnums=(0,) if donate else (),
        )

    cache = {}

    def step(state, batch, rng):
        key = jax.tree.map(lambda x: (x.shape, str(x.dtype)) if x is not None else None,
                           batch, is_leaf=lambda x: x is None)
        key = str(key)
        if key not in cache:
            cache[key] = compiled_for(batch)
        return cache[key](state, batch, rng)

    return step


def make_parallel_val_step(system, mesh: Mesh, axis: str = "data"):
    rep = replicated(mesh)
    shd = batch_sharded(mesh, axis)

    def batch_shardings(batch):
        return jax.tree.map(
            lambda x: shd if x is not None else None, batch,
            is_leaf=lambda x: x is None,
        )

    cache = {}

    def step(state, batch):
        key = str(jax.tree.map(lambda x: (x.shape, str(x.dtype)) if x is not None else None,
                               batch, is_leaf=lambda x: x is None))
        if key not in cache:
            cache[key] = jax.jit(
                system.val_step,
                in_shardings=(rep, batch_shardings(batch)),
                out_shardings=rep,
            )
        return cache[key](state, batch)

    return step
