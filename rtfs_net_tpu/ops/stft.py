"""STFT / iSTFT with torch.stft/istft semantics, formulated for the MXU.

Instead of gather-based framing + an FFT (the reference rides cuFFT via
``torch.stft``/``torch.istft``, ``encoder.py:164-170`` / ``decoder.py:122-128``),
both transforms lower to a single strided convolution against a fixed
windowed-DFT basis:

  * STFT  = Conv1d(1 -> 2F, kernel n_fft, stride hop) with basis rows
    ``w[n]·cos(2πfn/N)`` and ``-w[n]·sin(2πfn/N)`` — one MXU contraction,
    no gather, no host FFT.
  * iSTFT = one frame matmul (spectra × inverse-rDFT-times-window basis)
    followed by a reshape-based overlap-add (when hop divides n_fft the OLA
    is n_fft/hop shifted reshapes-and-adds — no scatter, no dilated conv),
    then division by the window-envelope ``Σ_t w²[m - t·hop]``
    (torch.istft's normalization).

Semantics matched exactly: ``center=True`` reflect padding of n_fft//2,
onesided spectra, periodic Hann, ``length=`` cropping. For n_fft=256 the
basis is a 256×258 matrix — far below MXU saturation, so the op is
bandwidth-bound and essentially free next to the separator body.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np
from jax import lax


def hann_window(n_fft: int) -> np.ndarray:
    """Periodic Hann (torch.hann_window default)."""
    return 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft))


@functools.lru_cache(maxsize=8)
def _analysis_basis(n_fft: int) -> np.ndarray:
    """(2F, 1, n_fft) windowed DFT conv kernel; rows 0..F-1 real, F..2F-1 imag."""
    F = n_fft // 2 + 1
    n = np.arange(n_fft)[None, :]
    f = np.arange(F)[:, None]
    ang = 2.0 * np.pi * f * n / n_fft
    w = hann_window(n_fft)[None, :]
    basis = np.concatenate([np.cos(ang) * w, -np.sin(ang) * w], axis=0)
    return basis[:, None, :].astype(np.float32)


@functools.lru_cache(maxsize=8)
def _synthesis_basis(n_fft: int) -> np.ndarray:
    """(2F, 1, n_fft) kernel for ConvTranspose: inverse rDFT × window.

    irfft over onesided bins with hermitian weighting:
      x[n] = (1/N)·[X_0 + 2·Σ_{f=1..N/2-1}(Re cos − Im sin) + X_{N/2}·cosπn]
    then multiplied by the synthesis window for overlap-add.
    """
    F = n_fft // 2 + 1
    n = np.arange(n_fft)[None, :]
    f = np.arange(F)[:, None]
    ang = 2.0 * np.pi * f * n / n_fft
    weights = np.full((F, 1), 2.0)
    weights[0] = 1.0
    if n_fft % 2 == 0:
        weights[-1] = 1.0
    re = np.cos(ang) * weights / n_fft
    im = -np.sin(ang) * weights / n_fft
    w = hann_window(n_fft)[None, :]
    basis = np.concatenate([re * w, im * w], axis=0)
    return basis[:, None, :].astype(np.float32)


def _conv_dn(ndim_spec: str):
    return (ndim_spec, "OIH", ndim_spec)


def stft(x: jnp.ndarray, n_fft: int, hop_length: int, center: bool = True):
    """torch.stft equivalent. x: (B, L) -> (real, imag) each (B, F, T),
    T = 1 + L//hop when centered."""
    assert x.ndim == 2
    if center:
        x = jnp.pad(x, ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
    basis = jnp.asarray(_analysis_basis(n_fft))
    dn = lax.conv_dimension_numbers(
        (x.shape[0], 1, x.shape[1]), basis.shape, _conv_dn("NCH")
    )
    spec = lax.conv_general_dilated(
        x[:, None, :].astype(jnp.float32),
        basis,
        window_strides=(hop_length,),
        padding=((0, 0),),
        dimension_numbers=dn,
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )  # (B, 2F, T)
    F = n_fft // 2 + 1
    return spec[:, :F], spec[:, F:]


def _overlap_add(frames: jnp.ndarray, hop: int) -> jnp.ndarray:
    """OLA of (B, T, N) frames at the given hop -> (B, (T-1)*hop + N).

    When hop divides N (every config here: 256/128), the OLA decomposes into
    N/hop shifted reshape-and-adds — pure layout ops + adds, no scatter.
    """
    B, T, N = frames.shape
    out_len = (T - 1) * hop + N
    if N % hop == 0:
        m = N // hop
        y = jnp.zeros((B, out_len), frames.dtype)
        chunks = frames.reshape(B, T, m, hop)
        for j in range(m):
            y = y.at[:, j * hop : (j + T) * hop].add(
                chunks[:, :, j, :].reshape(B, T * hop)
            )
        return y
    # general fallback: scatter-add per frame via dynamic updates
    y = jnp.zeros((B, out_len), frames.dtype)
    idx = (jnp.arange(T)[:, None] * hop + jnp.arange(N)[None, :]).reshape(-1)
    return y.at[:, idx].add(frames.reshape(B, -1))


def istft(
    real: jnp.ndarray,
    imag: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    length: int,
    center: bool = True,
    eps: float = 1e-11,
):
    """torch.istft equivalent. real/imag: (B, F, T) -> (B, length)."""
    B, F, T = real.shape
    spec = jnp.concatenate([real, imag], axis=1).astype(jnp.float32)  # (B, 2F, T)
    basis = jnp.asarray(_synthesis_basis(n_fft)[:, 0, :])  # (2F, n_fft)
    # inverse rDFT + window, one MXU matmul: (B, T, 2F) @ (2F, N) -> frames
    frames = jnp.einsum(
        "bct,cn->btn", spec, basis, precision=lax.Precision.HIGHEST
    )  # (B, T, n_fft)

    y = _overlap_add(frames, hop_length)  # (B, (T-1)*hop + n_fft)

    # window-square envelope: OLA of a constant w² frame track
    w2 = jnp.asarray(hann_window(n_fft) ** 2, jnp.float32)
    env = _overlap_add(jnp.broadcast_to(w2, (1, T, n_fft)), hop_length)[0]

    y = y / jnp.maximum(env, eps)[None, :]
    if center:
        y = y[:, n_fft // 2 :]
    out_len = y.shape[1]
    if out_len >= length:
        y = y[:, :length]
    else:
        y = jnp.pad(y, ((0, 0), (0, length - out_len)))
    return y


def stft_frames(length: int, n_fft: int, hop_length: int, center: bool = True) -> int:
    if center:
        return 1 + length // hop_length
    return 1 + (length - n_fft) // hop_length
