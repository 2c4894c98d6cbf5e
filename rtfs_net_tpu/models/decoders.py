"""Audio decoders (reference: ``src/models/TDAVNet/decoder.py``)."""
from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from ..ops.conv import ConvTranspose
from ..ops import stft as stft_ops


def pad_to_input_length(x, length: int):
    out = x.shape[-1]
    if out < length:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, length - out)]
        return jnp.pad(x, pad)
    return x


class ConvolutionalDecoder(nn.Module):
    """ConvTranspose1d back to waveform (reference ``decoder.py:25-69``)."""

    in_chan: int
    n_src: int
    kernel_size: int
    stride: int
    bias: bool = False

    @nn.compact
    def __call__(self, x, input_shape, train: bool = False):
        batch_size, length = input_shape[0], input_shape[-1]
        x = x.reshape(batch_size * self.n_src, self.in_chan, -1)
        pad = (self.kernel_size - 1) // 2
        y = ConvTranspose(
            in_chan=self.in_chan, out_chan=1, kernel_size=self.kernel_size,
            ndim=1, stride=self.stride, padding=pad, output_padding=pad - 1,
            use_bias=self.bias, xavier_init=True, name="decoder",
        )(x)
        y = pad_to_input_length(y, length)
        return y.reshape(batch_size, self.n_src, -1)[..., :length]


class STFTDecoder(nn.Module):
    """ConvTranspose2d -> 2 chans -> complex -> iSTFT(length=L)
    (reference ``decoder.py:72-132``)."""

    win: int
    hop_length: int
    in_chan: int
    n_src: int
    kernel_size: int = -1
    stride: int = 1
    bias: bool = False
    # Consume (B, C, F, T) input (internal "ft" layout; see AVNet.tf_order):
    # the iSTFT wants bins-major anyway, so this REMOVES two transposes.
    spatial_swapped: bool = False

    @nn.compact
    def __call__(self, x, input_shape, train: bool = False):
        batch_size, length = input_shape[0], input_shape[-1]
        x = x.reshape(batch_size * self.n_src, self.in_chan, *x.shape[-2:])
        if self.kernel_size > 0:
            y = ConvTranspose(
                in_chan=self.in_chan, out_chan=2, kernel_size=self.kernel_size,
                ndim=2, stride=self.stride, padding=(self.kernel_size - 1) // 2,
                use_bias=self.bias, xavier_init=True,
                spatial_swapped=self.spatial_swapped, name="decoder",
            )(x)
        else:
            y = x
        if self.spatial_swapped:
            re, im = y[:, 0], y[:, 1]  # already (B*n_src, F, T)
        else:
            re = jnp.swapaxes(y[:, 0], 1, 2)  # (B*n_src, F, T)
            im = jnp.swapaxes(y[:, 1], 1, 2)
        wav = stft_ops.istft(re, im, self.win, self.hop_length, length)
        return wav.reshape(batch_size, self.n_src, length).astype(x.dtype)


_REGISTRY = {"ConvolutionalDecoder": ConvolutionalDecoder, "STFTDecoder": STFTDecoder}


def get(identifier):
    if identifier is None:
        raise ValueError("decoder_type is required")
    if callable(identifier):
        return identifier
    cls = _REGISTRY.get(identifier)
    if cls is None:
        raise ValueError(f"Could not interpret decoder identifier: {identifier}")
    return cls
