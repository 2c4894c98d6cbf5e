"""Multi-host / multi-slice initialization (reference equivalence: the
``--nodes`` arg + Lightning's NCCL multi-node launch, train.py:145,167).

Single-controller JAX: every host calls ``initialize()`` with the same
coordinator; afterwards ``jax.devices()`` spans the pod and the data-
parallel mesh from ``parallel.mesh`` rides ICI within a slice and DCN
across slices automatically (device order groups slice-local chips)."""
from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None):
    """Wire up jax.distributed from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID). No-op
    for single-process runs."""
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1")),
        process_id=process_id if process_id is not None else int(
            os.environ.get("JAX_PROCESS_ID", "0")),
    )
    return True


def process_info():
    """(process_index, process_count, local_device_count) — used by the
    data loader's host sharding and rank-zero logging guards."""
    return jax.process_index(), jax.process_count(), jax.local_device_count()


def wait_for_devices(min_devices: int = 1, timeout_s: float = 300.0):
    """TPU-native analogue of the reference's free-GPU busy-wait
    (train.py:62-68 / torch_utils.get_free_gpu_indices): block until the
    runtime exposes at least ``min_devices`` accelerators."""
    import time

    t0 = time.time()
    while True:
        try:
            devs = jax.devices()
            if len(devs) >= min_devices:
                return devs
        except RuntimeError:
            pass
        if time.time() - t0 > timeout_s:
            raise TimeoutError(
                f"fewer than {min_devices} devices after {timeout_s}s")
        time.sleep(5.0)
