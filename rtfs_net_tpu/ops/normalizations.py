"""Normalization layers with torch-matching numerics.

Channel-first layouts throughout: 1D tensors are (B, C, T), 2D tensors are
(B, C, T, F) — matching the reference so that YAML configs and (later)
converted checkpoints behave identically. Reference semantics live in
``src/models/layers/normalizations.py`` (gLN = GroupNorm(1, C) eps 1e-5;
LayerNormalization4D normalizes dims (1,3) when the freq param dim > 1,
else dim (1), with biased variance).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

EPS = 1e-5


def _moments(x, axes):
    """Single-pass biased moments: E[x], E[x²]−E[x]².

    The ``mean((x−mean)²)`` form makes the variance reduce *depend* on the
    mean reduce, forcing XLA into two sequential full passes over the
    tensor plus a materialized f32 ``x−mean`` intermediate (profiled at
    ~12 ms per full-resolution gLN on the serving forward). Independent
    sibling reduces fuse into ONE tupled convert+reduce pass. f32
    accumulation over bf16 activations keeps the cancellation error far
    below the 1e-5 norm eps; reference-source parity tests pin the
    numerics (torch GroupNorm/var use the same E[x²]−μ² form internally).
    """
    mean = jnp.mean(x, axis=axes, keepdims=True)
    sq = jnp.mean(jnp.square(x), axis=axes, keepdims=True)
    var = jnp.maximum(sq - jnp.square(mean), 0.0)
    return mean, var


class GlobalLayerNorm(nn.Module):
    """gLN: per-sample normalization over channel + all spatial dims with a
    per-channel affine — the semantics of ``nn.GroupNorm(1, C)``."""

    num_channels: int
    eps: float = EPS

    @nn.compact
    def __call__(self, x):
        gamma = self.param("scale", nn.initializers.ones, (self.num_channels,), jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, (self.num_channels,), jnp.float32)
        axes = tuple(range(1, x.ndim))
        xf = x.astype(jnp.float32)
        mean, var = _moments(xf, axes)
        shape = [1] * x.ndim
        shape[1] = self.num_channels
        # fold affine into the normalization: one FMA per element
        scale = jax.lax.rsqrt(var + self.eps) * gamma.reshape(shape)
        shift = beta.reshape(shape) - mean * scale
        return (xf * scale + shift).astype(x.dtype)


class LayerNormalization4D(nn.Module):
    """LN over (C,) or (C, F) of a (B, C, T, F) tensor.

    ``param_freq`` mirrors the reference ctor arg ``input_dimension[1]``:
    when > 1 the affine is (1, C, 1, F) and normalization runs over dims
    (1, 3); when == 1 the affine is (1, C, 1, 1) and normalization runs over
    dim (1) only (``normalizations.py:20-37``).
    """

    num_channels: int
    param_freq: int = 1
    eps: float = EPS

    @nn.compact
    def __call__(self, x):
        pshape = (1, self.num_channels, 1, self.param_freq)
        gamma = self.param("scale", lambda k: jnp.ones(pshape, jnp.float32))
        beta = self.param("bias", lambda k: jnp.zeros(pshape, jnp.float32))
        axes = (1, 3) if self.param_freq > 1 else (1,)
        xf = x.astype(jnp.float32)
        mean, var = _moments(xf, axes)
        scale = jax.lax.rsqrt(var + self.eps) * gamma
        shift = beta - mean * scale
        return (xf * scale + shift).astype(x.dtype)


class BatchNorm(nn.Module):
    """Channel-first batch norm over dim 1 (torch ``nn.BatchNorm1d/2d/3d``).

    torch defaults: eps 1e-5, momentum 0.1 (EMA keep-rate 0.9). Running
    stats live in the ``batch_stats`` collection. ``use_running_average``
    selects eval semantics; set it True permanently for the frozen video
    trunk (reference keeps those BN layers in eval mode during training,
    ``frcnn_videomodel.py:78-83``). ``axis_name`` enables cross-device
    stat sync (the reference trains with ``sync_batchnorm=True``).
    """

    num_features: int
    eps: float = EPS
    momentum: float = 0.1
    use_running_average: bool | None = None
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, use_running_average: bool | None = None):
        use_ra = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        C = self.num_features
        gamma = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((C,), jnp.float32))

        xf = x.astype(jnp.float32)
        reduce_axes = (0,) + tuple(range(2, x.ndim))
        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            mean = jnp.mean(xf, axis=reduce_axes)
            var = jnp.mean(jnp.square(xf), axis=reduce_axes) - jnp.square(mean)
            if self.axis_name is not None:
                # cross-device sync (reference: Trainer(sync_batchnorm=True))
                mean = jax.lax.pmean(mean, self.axis_name)
                var = jax.lax.pmean(
                    jnp.mean(jnp.square(xf), axis=reduce_axes), self.axis_name
                ) - jnp.square(mean)
            if not self.is_initializing():
                n = x.size // C
                if self.axis_name is not None:
                    n = n * jax.lax.psum(1, self.axis_name)
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased

        shape = (1, C) + (1,) * (x.ndim - 2)
        y = (xf - mean.reshape(shape)) / jnp.sqrt(var.reshape(shape) + self.eps)
        y = y * gamma.reshape(shape) + beta.reshape(shape)
        return y.astype(x.dtype)


class LayerNorm(nn.Module):
    """torch ``nn.LayerNorm(normalized_shape)`` over the trailing dims."""

    normalized_shape: Any
    eps: float = EPS

    @nn.compact
    def __call__(self, x):
        shape = self.normalized_shape
        if isinstance(shape, int):
            shape = (shape,)
        shape = tuple(shape)
        gamma = self.param("scale", nn.initializers.ones, shape, jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, shape, jnp.float32)
        axes = tuple(range(x.ndim - len(shape), x.ndim))
        xf = x.astype(jnp.float32)
        mean, var = _moments(xf, axes)
        y = (xf - mean) / jnp.sqrt(var + self.eps)
        return (y * gamma + beta).astype(x.dtype)


class Identity(nn.Module):
    @nn.compact
    def __call__(self, x):
        return x


# channel-first BN aliases — dimensionality is inferred from input rank
class BatchNorm1d(BatchNorm):
    pass


class BatchNorm2d(BatchNorm):
    pass


class BatchNorm3d(BatchNorm):
    pass


gLN = GlobalLayerNorm
LN4d = LayerNormalization4D

_REGISTRY = {
    "gln": GlobalLayerNorm,
    "globallayernorm": GlobalLayerNorm,
    "layernormalization4d": LayerNormalization4D,
    "ln4d": LayerNormalization4D,
    "batchnorm1d": BatchNorm1d,
    "batchnorm2d": BatchNorm2d,
    "batchnorm3d": BatchNorm3d,
    "layernorm": LayerNorm,
    "groupnorm1": GlobalLayerNorm,
    "identity": Identity,
}


def get(identifier):
    """Resolve a normalization identifier (reference:
    ``normalizations.py:44-58`` — checks ``torch.nn`` attrs then globals)."""
    if identifier is None:
        return Identity
    if callable(identifier):
        return identifier
    if isinstance(identifier, str):
        cls = _REGISTRY.get(identifier.lower())
        if cls is None:
            raise ValueError(f"Could not interpret normalization identifier: {identifier}")
        return cls
    raise ValueError(f"Could not interpret normalization identifier: {identifier}")
