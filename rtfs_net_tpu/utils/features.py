"""Feature chunking utilities (reference: ``src/models/utils/utils.py`` —
50%-overlap split/merge for long-sequence chunked inference, plus the
band-split helper and pad_x_to_y)."""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def pad_x_to_y(x, y, axis: int = -1):
    """Zero-pad x to y's length along the last axis
    (reference ``torch_utils.py:13-18``)."""
    if axis != -1:
        raise NotImplementedError
    diff = y.shape[axis] - x.shape[axis]
    pad = [(0, 0)] * (x.ndim - 1) + [(0, diff)]
    return jnp.pad(x, pad)


def pad_segment(x, block_size: int) -> Tuple[jnp.ndarray, int]:
    """(B, N, T): pad so T splits into 50%-overlapped blocks."""
    B, N, T = x.shape
    stride = block_size // 2
    rest = block_size - (stride + T % block_size) % block_size
    if rest > 0:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, rest)))
    x = jnp.pad(x, ((0, 0), (0, 0), (stride, stride)))
    return x, rest


def split_feature(x, block_size: int) -> Tuple[jnp.ndarray, int]:
    """(B, N, T) -> (B, N, block_size, n_chunks) with 50% overlap."""
    x, rest = pad_segment(x, block_size)
    B, N, T = x.shape
    stride = block_size // 2
    b1 = x[:, :, :-stride].reshape(B, N, -1, block_size)
    b2 = x[:, :, stride:].reshape(B, N, -1, block_size)
    block = jnp.concatenate([b1, b2], axis=3).reshape(B, N, -1, block_size)
    return jnp.swapaxes(block, 2, 3), rest


def merge_feature(x, rest: int) -> jnp.ndarray:
    """(B, N, block_size, n_chunks) -> (B, N, T) overlap-add inverse."""
    B, N, block_size, _ = x.shape
    stride = block_size // 2
    x = jnp.swapaxes(x, 2, 3).reshape(B, N, -1, block_size * 2)
    x1 = x[:, :, :, :block_size].reshape(B, N, -1)[:, :, stride:]
    x2 = x[:, :, :, block_size:].reshape(B, N, -1)[:, :, :-stride]
    out = x1 + x2
    if rest > 0:
        out = out[:, :, :-rest]
    return out


def get_bandwidths(win: int, sr: int = 16000):
    """Band-split helper (reference ``utils.py:58-80``; unused by active
    configs, kept for API parity)."""
    enc_dim = win // 2 + 1
    bw = lambda hz: int(np.floor(hz / (sr / 2.0) * enc_dim))
    band_width = [bw(100)] * 5 + [bw(250)] * 6 + [bw(500)] * 4 + [bw(1000)] * 4
    if sr > 160000:
        band_width += [bw(2000)]
    assert enc_dim > np.sum(band_width)
    band_width.append(enc_dim - int(np.sum(band_width)))
    return band_width
