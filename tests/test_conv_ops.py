"""Conv/ConvTranspose/pool/interp parity vs torch CPU goldens."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from rtfs_net_tpu.ops import conv as conv_ops


def _run_conv(x, w, b, **kw):
    m = conv_ops.Conv(
        in_chan=w.shape[1] * kw.get("groups", 1),
        out_chan=w.shape[0],
        kernel_size=w.shape[2:] if len(w.shape) > 3 else w.shape[2],
        ndim=len(w.shape) - 2,
        use_bias=b is not None,
        **kw,
    )
    params = {"params": {"weight": jnp.asarray(w)}}
    if b is not None:
        params["params"]["bias"] = jnp.asarray(b)
    return np.asarray(m.apply(params, jnp.asarray(x)))


@pytest.mark.parametrize("k,stride,pad,dil,groups", [
    (3, 1, "same", 1, 1),
    (4, 1, "same", 1, 1),       # even kernel: asymmetric torch 'same'
    (5, 1, "same", 2, 1),
    (4, 2, 1, 1, 1),            # ConvNormAct stride>1 path: pad = d*(k-1)//2
    (5, 2, 2, 1, 8),            # grouped strided downsampler
    (8, 1, 0, 1, 1),
])
def test_conv1d_parity(rng, k, stride, pad, dil, groups):
    B, Cin, Cout, T = 2, 8, 16, 37
    x = rng.standard_normal((B, Cin, T)).astype(np.float32)
    w = rng.standard_normal((Cout, Cin // groups, k)).astype(np.float32) * 0.1
    b = rng.standard_normal((Cout,)).astype(np.float32)
    golden = F.conv1d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
        stride=stride, padding=pad, dilation=dil, groups=groups,
    ).numpy()
    got = _run_conv(x, w, b, stride=stride, padding=pad, dilation=dil, groups=groups)
    np.testing.assert_allclose(got, golden, atol=1e-4)


@pytest.mark.parametrize("k,stride,pad,groups", [
    ((3, 3), (1, 1), "same", 1),
    ((4, 4), (2, 2), (1, 1), 1),
    ((4, 4), (2, 2), (1, 1), 16),
    ((1, 1), (1, 1), 0, 1),
])
def test_conv2d_parity(rng, k, stride, pad, groups):
    B, Cin, Cout, T, Fr = 2, 16, 16, 13, 11
    x = rng.standard_normal((B, Cin, T, Fr)).astype(np.float32)
    w = rng.standard_normal((Cout, Cin // groups, *k)).astype(np.float32) * 0.1
    golden = F.conv2d(
        torch.from_numpy(x), torch.from_numpy(w), None,
        stride=stride, padding=pad, groups=groups,
    ).numpy()
    got = _run_conv(x, w, None, stride=stride, padding=pad, groups=groups)
    np.testing.assert_allclose(got, golden, atol=1e-4)


@pytest.mark.parametrize("k,stride,pad,opad,groups", [
    (8, 1, 0, 0, 1),            # DualPathRNN overlap-add linear
    (21, 10, 10, 9, 1),         # ConvolutionalDecoder shape math
    (3, 1, 1, 0, 1),            # STFTDecoder
    (4, 2, 1, 0, 4),            # grouped
])
def test_conv_transpose1d_parity(rng, k, stride, pad, opad, groups):
    B, Cin, Cout, T = 2, 8, 8, 25
    x = rng.standard_normal((B, Cin, T)).astype(np.float32)
    w = rng.standard_normal((Cin, Cout // groups, k)).astype(np.float32) * 0.1
    b = rng.standard_normal((Cout,)).astype(np.float32)
    golden = F.conv_transpose1d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
        stride=stride, padding=pad, output_padding=opad, groups=groups,
    ).numpy()
    m = conv_ops.ConvTranspose(
        in_chan=Cin, out_chan=Cout, kernel_size=k, ndim=1, stride=stride,
        padding=pad, output_padding=opad, groups=groups,
    )
    got = m.apply({"params": {"weight": jnp.asarray(w), "bias": jnp.asarray(b)}}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), golden, atol=1e-4)


def test_conv_transpose2d_parity(rng):
    B, Cin, Cout, T, Fr = 2, 8, 2, 13, 11
    k, stride, pad = 3, 1, 1
    x = rng.standard_normal((B, Cin, T, Fr)).astype(np.float32)
    w = rng.standard_normal((Cin, Cout, k, k)).astype(np.float32) * 0.1
    golden = F.conv_transpose2d(
        torch.from_numpy(x), torch.from_numpy(w), None, stride=stride, padding=pad
    ).numpy()
    m = conv_ops.ConvTranspose(
        in_chan=Cin, out_chan=Cout, kernel_size=k, ndim=2, stride=stride,
        padding=pad, use_bias=False,
    )
    got = m.apply({"params": {"weight": jnp.asarray(w)}}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), golden, atol=1e-4)


@pytest.mark.parametrize("in_size,out_size", [(125, 64), (251, 126), (50, 13), (64, 64)])
def test_adaptive_avg_pool1d(rng, in_size, out_size):
    x = rng.standard_normal((2, 4, in_size)).astype(np.float32)
    golden = F.adaptive_avg_pool1d(torch.from_numpy(x), out_size).numpy()
    got = conv_ops.adaptive_avg_pool(jnp.asarray(x), (out_size,))
    np.testing.assert_allclose(np.asarray(got), golden, atol=1e-5)


def test_adaptive_avg_pool2d(rng):
    x = rng.standard_normal((2, 4, 251, 129)).astype(np.float32)
    golden = F.adaptive_avg_pool2d(torch.from_numpy(x), (126, 65)).numpy()
    got = conv_ops.adaptive_avg_pool(jnp.asarray(x), (126, 65))
    np.testing.assert_allclose(np.asarray(got), golden, atol=1e-5)


@pytest.mark.parametrize("in_size,out_size",
                         [(64, 125), (13, 50), (65, 129), (126, 251),
                          # "2n+1" upsamples (selection matmul — see the
                          # round-5 negative result in interpolate_nearest)
                          (125, 251), (64, 129), (50, 251), (32, 251),
                          # strided-slice downsamples + matmul downsample
                          (251, 125), (129, 64), (251, 126),
                          (100, 257), (7, 30), (1, 9)])
def test_interpolate_nearest_1d(rng, in_size, out_size):
    x = rng.standard_normal((2, 4, in_size)).astype(np.float32)
    golden = F.interpolate(torch.from_numpy(x), size=out_size, mode="nearest").numpy()
    got = conv_ops.interpolate_nearest(jnp.asarray(x), (out_size,))
    np.testing.assert_allclose(np.asarray(got), golden)


def test_interpolate_nearest_2d(rng):
    x = rng.standard_normal((2, 4, 63, 33)).astype(np.float32)
    golden = F.interpolate(torch.from_numpy(x), size=(126, 65), mode="nearest").numpy()
    got = conv_ops.interpolate_nearest(jnp.asarray(x), (126, 65))
    np.testing.assert_allclose(np.asarray(got), golden)


def test_unfold_1d_matches_torch(rng):
    B, C, T, k, s = 3, 6, 29, 8, 1
    x = rng.standard_normal((B, C, T)).astype(np.float32)
    golden = F.unfold(
        torch.from_numpy(x).unsqueeze(-1), kernel_size=(k, 1), stride=(s, 1)
    ).numpy()
    got = conv_ops.unfold_1d(jnp.asarray(x), k, s)
    np.testing.assert_allclose(np.asarray(got), golden)


def test_linear_parity(rng):
    x = rng.standard_normal((5, 7)).astype(np.float32)
    w = rng.standard_normal((3, 7)).astype(np.float32)
    b = rng.standard_normal((3,)).astype(np.float32)
    golden = (torch.from_numpy(x) @ torch.from_numpy(w).T + torch.from_numpy(b)).numpy()
    m = conv_ops.Linear(7, 3)
    got = m.apply({"params": {"weight": jnp.asarray(w), "bias": jnp.asarray(b)}}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), golden, atol=1e-5)
