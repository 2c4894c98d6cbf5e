"""STFT/iSTFT parity vs torch.stft/istft (torch CPU as the golden)."""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from rtfs_net_tpu.ops import stft as stft_ops


@pytest.mark.parametrize("L", [32000, 16000, 12345])
@pytest.mark.parametrize("n_fft,hop", [(256, 128), (512, 256)])
def test_stft_matches_torch(rng, L, n_fft, hop):
    x = rng.standard_normal((3, L)).astype(np.float32)
    spec = torch.stft(
        torch.from_numpy(x),
        n_fft=n_fft,
        hop_length=hop,
        window=torch.hann_window(n_fft),
        return_complex=True,
    )
    re, im = stft_ops.stft(jnp.asarray(x), n_fft, hop)
    assert re.shape == spec.real.shape
    scale = np.abs(spec.numpy()).max()
    np.testing.assert_allclose(np.asarray(re), spec.real.numpy(), atol=2e-4 * scale)
    np.testing.assert_allclose(np.asarray(im), spec.imag.numpy(), atol=2e-4 * scale)


@pytest.mark.parametrize("L", [32000, 12345])
def test_istft_roundtrip_matches_torch(rng, L):
    n_fft, hop = 256, 128
    x = rng.standard_normal((2, L)).astype(np.float32)
    spec = torch.stft(
        torch.from_numpy(x),
        n_fft=n_fft,
        hop_length=hop,
        window=torch.hann_window(n_fft),
        return_complex=True,
    )
    golden = torch.istft(
        spec, n_fft=n_fft, hop_length=hop, window=torch.hann_window(n_fft), length=L
    ).numpy()
    y = stft_ops.istft(
        jnp.asarray(spec.real.numpy()), jnp.asarray(spec.imag.numpy()), n_fft, hop, L
    )
    np.testing.assert_allclose(np.asarray(y), golden, atol=5e-5)
    # and a true round trip reconstructs the signal
    np.testing.assert_allclose(np.asarray(y), x, atol=5e-5)


def test_istft_on_modified_spectrum(rng):
    """iSTFT must match torch even for spectra that aren't exact STFTs
    (the decoder feeds masked spectra, decoder.py:122-128)."""
    n_fft, hop, L = 256, 128, 32000
    T = 1 + L // hop
    re = rng.standard_normal((2, n_fft // 2 + 1, T)).astype(np.float32)
    im = rng.standard_normal((2, n_fft // 2 + 1, T)).astype(np.float32)
    golden = torch.istft(
        torch.complex(torch.from_numpy(re), torch.from_numpy(im)),
        n_fft=n_fft,
        hop_length=hop,
        window=torch.hann_window(n_fft),
        length=L,
    ).numpy()
    y = stft_ops.istft(jnp.asarray(re), jnp.asarray(im), n_fft, hop, L)
    np.testing.assert_allclose(np.asarray(y), golden, atol=1e-4 * np.abs(golden).max())
