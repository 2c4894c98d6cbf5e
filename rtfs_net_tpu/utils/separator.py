"""Standalone inference helper (reference: ``src/utils/separator.py`` —
``separate()`` with output energy rescaled to the input's)."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def separate(apply_fn, wav, *args, **kwargs):
    """Run a separation forward and rescale output energy to the input's
    (reference ``separator.py:55``: out *= |wav|.sum() / |out|.sum()).

    apply_fn: callable (wav, *args) -> (B, n_src, L); wav: numpy or jax.
    """
    was_numpy = isinstance(wav, np.ndarray)
    x = jnp.asarray(wav)
    out = apply_fn(x, *args, **kwargs)
    out = out * (jnp.abs(x).sum() / (jnp.abs(out).sum() + 1e-8))
    return np.asarray(out) if was_numpy else out
