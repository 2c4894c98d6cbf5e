"""ConvolutionalEncoder/Decoder parity vs inline torch replicas of the
CTCNet time-domain front/back ends (encoder.py:58-119, decoder.py:25-69)."""
import math

import numpy as np
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from rtfs_net_tpu.models.encoders import ConvolutionalEncoder
from rtfs_net_tpu.models.decoders import ConvolutionalDecoder


def test_convolutional_encoder_matches_torch(rng):
    out_chan, k, stride, layers, depth = 16, 21, 10, 2, 3
    L = 3210  # arbitrary length exercises the LCM padding
    x = rng.standard_normal((2, L)).astype(np.float32)

    # torch replica: `layers` dilated branches (kernel k*d, dilation d,
    # stride, "same"-ish padding rule of ConvNormAct for stride>1), summed
    torch.manual_seed(0)
    branches = []
    for i in range(layers):
        d = i + 1
        conv = tnn.Conv1d(1, out_chan, k * d, stride,
                          padding=d * (k * d - 1) // 2, dilation=d, bias=False)
        gln = tnn.GroupNorm(1, out_chan, eps=1e-5)
        with torch.no_grad():
            gln.weight.uniform_(0.5, 1.5)
            gln.bias.uniform_(-0.2, 0.2)
        branches.append((conv, gln))

    lcm_1 = abs(out_chan // 2 * 2 ** depth) // math.gcd(k // 2, 2 ** depth)
    lcm_2 = abs(k // 2 * 2 ** depth) // math.gcd(k // 2, 2 ** depth)

    def pad(t, lcm):
        rest = t.shape[-1] % lcm
        return tnn.functional.pad(t, (0, lcm - rest)) if rest else t

    xt = pad(pad(torch.from_numpy(x).unsqueeze(1), lcm_1), lcm_2)
    golden = sum(torch.relu(g(c(xt))) for c, g in branches).detach().numpy()

    m = ConvolutionalEncoder(in_chan=1, out_chan=out_chan, kernel_size=k,
                             stride=stride, act_type="ReLU", norm_type="gLN",
                             bias=False, layers=layers, upsampling_depth=depth)
    params = {}
    for i, (c, g) in enumerate(branches):
        params[f"branch{i}"] = {
            "conv": {"weight": jnp.asarray(c.weight.detach().numpy())},
            "norm": {"scale": jnp.asarray(g.weight.detach().numpy()),
                     "bias": jnp.asarray(g.bias.detach().numpy())},
        }
    got = m.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), golden, atol=2e-4)


def test_convolutional_decoder_matches_torch(rng):
    in_chan, n_src, k, stride, L = 16, 2, 21, 10, 2000
    T = (L + 9) // stride  # embedding frames
    x = rng.standard_normal((2, n_src, in_chan, T)).astype(np.float32)

    torch.manual_seed(1)
    deconv = tnn.ConvTranspose1d(in_chan, 1, k, stride, padding=(k - 1) // 2,
                                 output_padding=(k - 1) // 2 - 1, bias=False)
    y = deconv(torch.from_numpy(x).view(2 * n_src, in_chan, T))
    y = tnn.functional.pad(y, (0, max(0, L - y.shape[-1])))
    golden = y.view(2, n_src, -1)[..., :L].detach().numpy()

    m = ConvolutionalDecoder(in_chan=in_chan, n_src=n_src, kernel_size=k,
                             stride=stride, bias=False)
    got = m.apply({"params": {"decoder": {
        "weight": jnp.asarray(deconv.weight.detach().numpy())}}},
        jnp.asarray(x), (2, n_src, L))
    np.testing.assert_allclose(np.asarray(got), golden, atol=1e-4)
