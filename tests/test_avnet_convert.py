"""Full-model checkpoint conversion: build a torch replica of a small
RTFS-style AVNet following the reference's module naming exactly, convert
its state dict, and require end-to-end output parity with the flax model.

(DualPathRNN uses LSTM here — the sru CUDA package isn't available on CPU;
the SRU column-shuffle path is covered by a layout unit test below.)
"""
import math

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

from rtfs_net_tpu.models import AVNet
from rtfs_net_tpu.utils.avnet_convert import convert_avnet, _sru_cols_to_ours

KEY = jax.random.PRNGKey(0)

C_ENC, C_BN, C_HID, C_DP = 16, 16, 8, 4
WIN, HOP = 64, 32
N_FREQS_DOWN = 9  # F=33 -> k4 s2 p1 -> 16? compute below per L


# ---------------------------------------------------------------- torch side
class TConvNormAct(tnn.Module):
    """Replica of reference ConvNormAct (conv_layers.py:65-139)."""

    def __init__(self, cin, cout, k, stride=1, groups=1, pre_norm=None,
                 pre_act=None, norm=None, act=None, bias=True, is2d=False):
        super().__init__()
        conv_cls = tnn.Conv2d if is2d else tnn.Conv1d
        pad = (k - 1) // 2 if stride > 1 else "same"
        mods = []
        mods.append(_norm(pre_norm, cin))
        mods.append(tnn.PReLU() if pre_act == "prelu" else
                    (tnn.ReLU() if pre_act == "relu" else tnn.Identity()))
        mods.append(conv_cls(cin, cout, k, stride, padding=pad, groups=groups,
                             bias=bias) if k > 0 else tnn.Identity())
        mods.append(_norm(norm, cout if k > 0 else cin))
        mods.append(tnn.PReLU() if act == "prelu" else
                    (tnn.ReLU() if act == "relu" else
                     (tnn.Sigmoid() if act == "sigmoid" else tnn.Identity())))
        self.full_layer = tnn.Sequential(*mods)

    def forward(self, x):
        return self.full_layer(x)


class _GLN(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.norm = tnn.GroupNorm(1, c, eps=1e-5)

    def forward(self, x):
        return self.norm(x)


class _LN4D(tnn.Module):
    def __init__(self, c, f=1):
        super().__init__()
        self.gamma = tnn.Parameter(torch.ones(1, c, 1, f))
        self.beta = tnn.Parameter(torch.zeros(1, c, 1, f))
        self.dim = (1, 3) if f > 1 else (1,)

    def forward(self, x):
        mu = x.mean(dim=self.dim, keepdim=True)
        std = torch.sqrt(x.var(dim=self.dim, unbiased=False, keepdim=True) + 1e-5)
        return ((x - mu) / std) * self.gamma + self.beta


def _norm(kind, c, f=1):
    if kind == "gLN":
        return _GLN(c)
    if kind == "LN4D":
        return _LN4D(c, f)
    if kind == "BN2d":
        return tnn.BatchNorm2d(c)
    if kind == "BN1d":
        return tnn.BatchNorm1d(c)
    return tnn.Identity()


class TConvActNorm(tnn.Module):
    def __init__(self, cin, cout, k, n_freqs=1, is2d=True):
        super().__init__()
        conv_cls = tnn.Conv2d if is2d else tnn.Conv1d
        self.conv = conv_cls(cin, cout, k, padding="same")
        self.act = tnn.PReLU()
        self.norm = _LN4D(cout, n_freqs)

    def forward(self, x):
        return self.norm(self.act(self.conv(x)))


class TInjection(tnn.Module):
    def __init__(self, c, k, is2d=True):
        super().__init__()
        self.local_embedding = TConvNormAct(c, c, k, groups=c, norm="gLN",
                                            bias=False, is2d=is2d)
        self.global_embedding = TConvNormAct(c, c, k, groups=c, norm="gLN",
                                             bias=False, is2d=is2d)
        self.global_gate = TConvNormAct(c, c, k, groups=c, norm="gLN",
                                        act="sigmoid", bias=False, is2d=is2d)

    def forward(self, loc, glob):
        new_shape = loc.shape[-(len(loc.shape) // 2):]
        old_shape = glob.shape[-(len(loc.shape) // 2):]
        le = self.local_embedding(loc)
        if int(np.prod(new_shape)) > int(np.prod(old_shape)):
            ge = tF.interpolate(self.global_embedding(glob), size=new_shape, mode="nearest")
            gg = tF.interpolate(self.global_gate(glob), size=new_shape, mode="nearest")
        else:
            gi = tF.interpolate(glob, size=new_shape, mode="nearest")
            ge = self.global_embedding(gi)
            gg = self.global_gate(gi)
        return le * gg + ge


class TDualPathLSTM(tnn.Module):
    def __init__(self, c, h, dim, k=4, s=1, layers=2):
        super().__init__()
        self.dim, self.k, self.s = dim, k, s
        self.norm = _LN4D(c, 1)
        self.unfold = tnn.Unfold((k, 1), stride=(s, 1))
        self.rnn = tnn.LSTM(c * k, h, num_layers=layers, bidirectional=True)
        self.linear = tnn.ConvTranspose1d(h * 2, c, k, stride=s)

    def forward(self, x):
        if self.dim == 4:
            x = x.transpose(-2, -1).contiguous()
        B, C, oT, oF = x.shape
        nT = math.ceil((oT - self.k) / self.s) * self.s + self.k
        nF = math.ceil((oF - self.k) / self.s) * self.s + self.k
        x = tF.pad(x, (0, nF - oF, 0, nT - oT))
        res = x
        y = self.norm(x)
        y = y.permute(0, 3, 1, 2).contiguous().view(B * nF, C, nT, 1)
        y = self.unfold(y).permute(2, 0, 1)
        y = self.rnn(y)[0].permute(1, 2, 0)
        y = self.linear(y).view(B, nF, C, nT).permute(0, 2, 3, 1).contiguous()
        y = (y + res)[..., :oT, :oF]
        if self.dim == 4:
            y = y.transpose(-2, -1).contiguous()
        return y


class TMHSA2D(tnn.Module):
    def __init__(self, c, n_freqs, n_head=2, e=2):
        super().__init__()
        self.n_head, self.e = n_head, e
        self.Queries = tnn.ModuleList([TConvActNorm(c, e, 1, n_freqs) for _ in range(n_head)])
        self.Keys = tnn.ModuleList([TConvActNorm(c, e, 1, n_freqs) for _ in range(n_head)])
        self.Values = tnn.ModuleList([TConvActNorm(c, c // n_head, 1, n_freqs) for _ in range(n_head)])
        self.attn_concat_proj = TConvActNorm(c, c, 1, n_freqs)

    def forward(self, x):
        B, C, T, F = x.shape
        res = x
        Q = torch.cat([q(x) for q in self.Queries], dim=0)
        K = torch.cat([k(x) for k in self.Keys], dim=0)
        V = torch.cat([v(x) for v in self.Values], dim=0)
        Q = Q.transpose(1, 2).flatten(start_dim=2)
        K = K.transpose(1, 2).flatten(start_dim=2)
        V = V.transpose(1, 2)
        old_shape = V.shape
        V = V.flatten(start_dim=2)
        attn = torch.softmax(Q @ K.transpose(1, 2) / Q.shape[-1] ** 0.5, dim=2)
        V = (attn @ V).reshape(old_shape).transpose(1, 2)
        emb = V.shape[1]
        y = V.view(self.n_head, B, emb, T, F).transpose(0, 1).contiguous()
        y = y.view(B, self.n_head * emb, T, F)
        return self.attn_concat_proj(y) + res


class TTDABlock(tnn.Module):
    def __init__(self, cin, hid, k=4, s=2, depth=2, n_freqs_down=8):
        super().__init__()
        self.depth = depth
        self.gateway = TConvNormAct(cin, cin, 1, groups=cin, act="prelu", is2d=True)
        self.projection = TConvNormAct(cin, hid, 1, norm="gLN", act="prelu", is2d=True)
        self.downsample_layers = tnn.ModuleList(
            [TConvNormAct(hid, hid, k, stride=1 if i == 0 else s, groups=hid,
                          norm="gLN", is2d=True) for i in range(depth)])
        self.globalatt = tnn.Sequential(
            TDualPathLSTM(hid, C_DP, dim=4),
            TDualPathLSTM(hid, C_DP, dim=3),
            TMHSA2D(hid, n_freqs_down),
        )
        self.fusion_layers = tnn.ModuleList([TInjection(hid, k) for _ in range(depth)])
        self.concat_layers = tnn.ModuleList([TInjection(hid, k) for _ in range(depth - 1)])
        self.residual_conv = TConvNormAct(hid, cin, 1, is2d=True)

    def forward(self, x):
        res = self.gateway(x)
        y = self.projection(res)
        downs = [self.downsample_layers[0](y)]
        for i in range(1, self.depth):
            downs.append(self.downsample_layers[i](downs[-1]))
        shape = downs[-1].shape
        glob = sum(tF.adaptive_avg_pool2d(d, shape[-2:]) for d in downs)
        glob = self.globalatt(glob)
        fused = [self.fusion_layers[i](downs[i], glob) for i in range(self.depth)]
        expanded = self.concat_layers[-1](fused[-2], fused[-1]) + downs[-2]
        for i in range(self.depth - 3, -1, -1):
            expanded = self.concat_layers[i](fused[i], expanded) + downs[i]
        return self.residual_conv(expanded) + res


class TTDANet(tnn.Module):
    def __init__(self, **kw):
        super().__init__()
        self.blocks = TTDABlock(**kw)
        self.repeats = 2

    def forward(self, x):
        res = x
        for i in range(self.repeats):
            x = self.blocks((x + res) if i > 0 else x)
        return x


class TAVNetAudioOnlyRTFS(tnn.Module):
    """Reference-named tiny AVNet: STFT enc/dec, audio-only refinement."""

    def __init__(self, L):
        super().__init__()
        F = WIN // 2 + 1
        T = 1 + L // HOP
        n_freqs_down = (F + 2 * 1 - 4) // 2 + 1
        self.encoder = tnn.Module()
        self.encoder.conv = TConvNormAct(2, C_ENC, 3, bias=False, is2d=True)
        self.audio_bottleneck = TConvNormAct(C_ENC, C_BN, 1, pre_norm="gLN",
                                             pre_act="relu", is2d=True)
        self.refinement_module = tnn.Module()
        self.refinement_module.audio_net = TTDANet(cin=C_BN, hid=C_HID,
                                                   n_freqs_down=n_freqs_down)
        self.mask_generator = tnn.Module()
        self.mask_generator.mask_generator = tnn.Sequential(
            tnn.PReLU(),
            TConvNormAct(C_BN, 1 * C_ENC, 1, act="relu", is2d=True),
        )
        self.decoder = tnn.Module()
        self.decoder.decoder = tnn.ConvTranspose2d(C_ENC, 2, 3, 1, padding=1,
                                                   bias=False)
        self.register_buffer("window", torch.hann_window(WIN), False)
        self.L = L

    def forward(self, mix):
        spec = torch.stft(mix, n_fft=WIN, hop_length=HOP, window=self.window,
                          return_complex=True)
        spec = torch.stack([spec.real, spec.imag], 1).transpose(2, 3).contiguous()
        emb = self.encoder.conv(spec)
        audio = self.audio_bottleneck(emb)
        refined = self.refinement_module.audio_net(audio)
        masks = self.mask_generator.mask_generator(refined)
        B = emb.shape[0]
        dims = emb.shape[-2:]
        m = masks.view(B, 1, 2, C_ENC // 2, *dims)
        e = emb.view(B, 2, C_ENC // 2, *dims)
        est_re = e[:, 0].unsqueeze(1) * m[:, :, 0] - e[:, 1].unsqueeze(1) * m[:, :, 1]
        est_im = e[:, 0].unsqueeze(1) * m[:, :, 1] + e[:, 1].unsqueeze(1) * m[:, :, 0]
        sep = torch.cat([est_re, est_im], 2)
        x = sep.view(B * 1, C_ENC, *sep.shape[-2:])
        dec = self.decoder.decoder(x)
        spec_c = torch.complex(dec[:, 0], dec[:, 1]).transpose(1, 2).contiguous()
        wav = torch.istft(spec_c, n_fft=WIN, hop_length=HOP,
                          window=self.window, length=self.L)
        return wav.view(B, 1, self.L)


TINY_CONF = {
    "n_src": 1,
    "enc_dec_params": {"encoder_type": "STFTEncoder", "decoder_type": "STFTDecoder",
                       "win": WIN, "hop_length": HOP, "out_chan": C_ENC,
                       "kernel_size": 3, "stride": 1, "bias": False,
                       "act_type": None, "norm_type": None},
    "audio_bn_params": {"pre_norm_type": "gLN", "pre_act_type": "ReLU",
                        "out_chan": C_BN, "kernel_size": 1, "is2d": True},
    "audio_params": {"audio_net": "TDANet", "hid_chan": C_HID, "kernel_size": 4,
                     "stride": 2, "norm_type": "gLN", "act_type": "PReLU",
                     "upsampling_depth": 2, "repeats": 2, "shared": True,
                     "is2d": True,
                     "layers": {
                         "layer_1": {"layer_type": "DualPathRNN", "hid_chan": C_DP,
                                     "dim": 4, "kernel_size": 4, "stride": 1,
                                     "rnn_type": "LSTM", "num_layers": 2,
                                     "bidirectional": True},
                         "layer_2": {"layer_type": "DualPathRNN", "hid_chan": C_DP,
                                     "dim": 3, "kernel_size": 4, "stride": 1,
                                     "rnn_type": "LSTM", "num_layers": 2,
                                     "bidirectional": True},
                         "layer_3": {"layer_type": "MultiHeadSelfAttention2D",
                                     "dim": 3, "n_freqs": 16, "n_head": 2,
                                     "hid_chan": 2, "act_type": "PReLU",
                                     "norm_type": "LayerNormalization4D"},
                     }},
    "video_params": {},
    "fusion_params": {},
    "mask_generation_params": {"mask_generator_type": "MaskGenerator",
                               "mask_act": "ReLU", "RI_split": True,
                               "is2d": True},
}


def test_avnet_checkpoint_conversion_end_to_end(rng):
    L = 2000
    torch.manual_seed(0)
    tm = TAVNetAudioOnlyRTFS(L).eval()
    mix = rng.standard_normal((2, L)).astype(np.float32)
    with torch.no_grad():
        golden = tm(torch.from_numpy(mix)).numpy()

    model = AVNet(**TINY_CONF)
    variables = model.init(KEY, jnp.asarray(mix), None)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    converted = convert_avnet(sd, variables, TINY_CONF)
    out = model.apply(converted, jnp.asarray(mix), None)
    assert out.shape == golden.shape
    scale = np.abs(golden).max()
    np.testing.assert_allclose(np.asarray(out), golden, atol=5e-4 * scale)


def test_sru_column_shuffle_layout():
    """[dir][k][h] columns -> [k][dir*h]: verify with an index tensor."""
    d_in, ndir, k, h = 3, 2, 4, 5
    cols = np.arange(ndir * k * h)
    wt = np.tile(cols, (d_in, 1)).astype(np.float32)
    ours = _sru_cols_to_ours(wt, k, ndir, h)
    want = cols.reshape(ndir, k, h).transpose(1, 0, 2).reshape(-1)
    np.testing.assert_array_equal(ours[0], want)
