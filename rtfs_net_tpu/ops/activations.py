"""Activation registry.

Mirrors the reference's string->module activation lookup
(``src/models/layers/activations.py:4-18``): any name resolving to a torch
``nn.*`` activation there resolves to an equivalent flax module here. All
activations are elementwise VPU ops that XLA fuses into neighbouring convs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


class Identity(nn.Module):
    @nn.compact
    def __call__(self, x):
        return x


class ReLU(nn.Module):
    @nn.compact
    def __call__(self, x):
        return jax.nn.relu(x)


class Sigmoid(nn.Module):
    @nn.compact
    def __call__(self, x):
        return jax.nn.sigmoid(x)


class Tanh(nn.Module):
    @nn.compact
    def __call__(self, x):
        return jnp.tanh(x)


class GELU(nn.Module):
    @nn.compact
    def __call__(self, x):
        # torch nn.GELU default approximate='none' (exact erf)
        return jax.nn.gelu(x, approximate=False)


class SiLU(nn.Module):
    @nn.compact
    def __call__(self, x):
        return jax.nn.silu(x)


class LeakyReLU(nn.Module):
    negative_slope: float = 0.01

    @nn.compact
    def __call__(self, x):
        return jax.nn.leaky_relu(x, self.negative_slope)


class ELU(nn.Module):
    @nn.compact
    def __call__(self, x):
        return jax.nn.elu(x)


class Softplus(nn.Module):
    @nn.compact
    def __call__(self, x):
        return jax.nn.softplus(x)


class PReLU(nn.Module):
    """Parametric ReLU with a single learned slope (torch ``nn.PReLU()``
    default: ``num_parameters=1``, ``init=0.25``)."""

    num_parameters: int = 1
    init: float = 0.25

    @nn.compact
    def __call__(self, x):
        alpha = self.param(
            "alpha",
            lambda _key: jnp.full((self.num_parameters,), self.init, jnp.float32),
        )
        if self.num_parameters == 1:
            a = alpha[0].astype(x.dtype)
        else:
            # torch broadcasts per-channel along dim 1 of (B, C, ...)
            shape = [1] * x.ndim
            shape[1] = self.num_parameters
            a = alpha.reshape(shape).astype(x.dtype)
        return jnp.where(x >= 0, x, a * x)


_REGISTRY = {
    "identity": Identity,
    "relu": ReLU,
    "prelu": PReLU,
    "sigmoid": Sigmoid,
    "tanh": Tanh,
    "gelu": GELU,
    "silu": SiLU,
    "leakyrelu": LeakyReLU,
    "elu": ELU,
    "softplus": Softplus,
}


def get(identifier):
    """Resolve an activation identifier to a flax module class.

    ``None`` -> Identity; callables pass through; strings are looked up
    case-insensitively (reference resolves against ``torch.nn`` attrs,
    ``activations.py:10-14``).
    """
    if identifier is None:
        return Identity
    if callable(identifier):
        return identifier
    if isinstance(identifier, str):
        cls = _REGISTRY.get(identifier.lower())
        if cls is None:
            raise ValueError(f"Could not interpret activation identifier: {identifier}")
        return cls
    raise ValueError(f"Could not interpret activation identifier: {identifier}")
