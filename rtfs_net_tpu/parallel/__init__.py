"""Distribution layer (reference: Lightning DDP/NCCL — SURVEY.md §2.8).

TPU-native equivalent: single-controller JAX with a 1-D ``data`` mesh axis.
Params/opt-state are replicated, the batch is sharded on axis 0, and XLA
inserts the gradient all-reduce over ICI when the jitted train step
produces replicated outputs from sharded inputs — no hand-written
collectives needed for pure data parallelism (the only parallelism the
reference implements; TP/PP/EP are N/A-by-design for this model family,
and sequence-length scaling is algorithmic inside the blocks).
"""
from .mesh import (
    make_mesh,
    replicated,
    batch_sharded,
    shard_batch,
    make_parallel_train_step,
    make_parallel_val_step,
)

__all__ = [
    "make_mesh",
    "replicated",
    "batch_sharded",
    "shard_batch",
    "make_parallel_train_step",
    "make_parallel_val_step",
]
