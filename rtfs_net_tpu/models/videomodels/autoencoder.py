"""Lip autoencoder (reference:
``src/models/videomodels/autoencoder/autoencoder.py``): strided conv
encoder/decoder with InstanceNorm+LeakyReLU, pretrained with MSE on 88x88
mouth frames (see ``train_autoencoder.py`` CLI)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...ops.conv import Conv, ConvTranspose


class InstanceNorm2d(nn.Module):
    """torch ``nn.InstanceNorm2d(C, affine=True)``: per-sample per-channel
    spatial normalization (biased var, eps 1e-5)."""

    num_features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        gamma = self.param("scale", nn.initializers.ones, (self.num_features,))
        beta = self.param("bias", nn.initializers.zeros, (self.num_features,))
        mean = jnp.mean(x, axis=(2, 3), keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=(2, 3), keepdims=True)
        y = (x - mean) / jnp.sqrt(var + self.eps)
        return y * gamma.reshape(1, -1, 1, 1) + beta.reshape(1, -1, 1, 1)


class EncoderBlock(nn.Module):
    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int
    leaky_slope: float = 0.3

    @nn.compact
    def __call__(self, x):
        y = Conv(self.in_channels, self.out_channels, self.kernel_size,
                 ndim=2, stride=self.stride, name="conv")(x)
        y = InstanceNorm2d(self.out_channels, name="norm")(y)
        return jax.nn.leaky_relu(y, self.leaky_slope)


class DecoderBlock(nn.Module):
    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int
    leaky_slope: float = 0.3

    @nn.compact
    def __call__(self, x):
        y = ConvTranspose(self.in_channels, self.out_channels,
                          self.kernel_size, ndim=2, stride=self.stride,
                          name="conv")(x)
        y = InstanceNorm2d(self.out_channels, name="norm")(y)
        return jax.nn.leaky_relu(y, self.leaky_slope)


class EncoderAE(nn.Module):
    in_channels: int = 3
    base_channels: int = 8
    num_layers: int = 3

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            cout = self.base_channels * (2 ** i)
            cin = self.in_channels if i == 0 else cout // 2
            x = EncoderBlock(cin, cout, 2, 2, name=f"layer{i}")(x)
        return x


class DecoderAE(nn.Module):
    in_channels: int = 3
    base_channels: int = 8
    num_layers: int = 3

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            cin = self.base_channels * (2 ** (self.num_layers - i - 1))
            cout = self.in_channels if i == self.num_layers - 1 else cin // 2
            x = DecoderBlock(cin, cout, 2, 2, name=f"layer{i}")(x)
        return x


class AE(nn.Module):
    """Full autoencoder for pretraining; loss = MSE(recon, input)."""

    in_channels: int = 1
    base_channels: int = 8
    num_layers: int = 3

    @nn.compact
    def __call__(self, x):
        z = EncoderAE(self.in_channels, self.base_channels, self.num_layers,
                      name="encoder")(x)
        return DecoderAE(self.in_channels, self.base_channels, self.num_layers,
                         name="decoder")(z)
