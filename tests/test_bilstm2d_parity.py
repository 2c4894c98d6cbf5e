"""BiLSTM2D numerical parity vs an inline torch replica of the reference
(rnn_layers.py:165-301): conv-gated LSTM over frequency windows with
cross-slice state, bidirectional channel concat, grouped deconv projection."""
import math

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as tF

import jax.numpy as jnp

from rtfs_net_tpu.models.layers import BiLSTM2D


class TConvLSTMCell(tnn.Module):
    def __init__(self, cin, hid, k, ndir):
        super().__init__()
        self.ndir = ndir
        def ih():
            return tnn.Sequential(
                tnn.Conv1d(cin, cin, k, padding="same", groups=cin),
                tnn.Conv1d(cin, 4 * hid, 1),
            )
        self.linear_ih = ih()
        self.linear_hh = tnn.Conv1d(hid, 4 * hid, 1)
        if ndir > 1:
            self.linear_ih_b = ih()
            self.linear_hh_b = tnn.Conv1d(hid, 4 * hid, 1)

    def forward(self, inp, hidden_t, cell_t):
        bs = inp.shape[0]
        if self.ndir > 1:
            inf, inb = inp.chunk(2, 1)
            hf, hb = hidden_t.chunk(2, 1)
            gf = self.linear_ih(inf) + self.linear_hh(hf)[:bs]
            gb = self.linear_ih_b(inb) + self.linear_hh_b(hb)[:bs]
            gates = torch.cat((gf, gb), dim=1)
        else:
            gates = self.linear_ih(inp) + self.linear_hh(hidden_t)[:bs]
        i, f, g, o = gates.chunk(4, 1)
        c = torch.sigmoid(f) * cell_t[:bs] + torch.sigmoid(i) * torch.tanh(g)
        h = torch.sigmoid(o) * torch.tanh(c)
        return h, c


class TBiLSTM2D(tnn.Module):
    def __init__(self, cin, hid, dim=3, k=3, window=4, stride=1):
        super().__init__()
        self.dim, self.window, self.stride, self.cin, self.hid = dim, window, stride, cin, hid
        self.ndir = 2
        self.norm = tnn.GroupNorm(1, cin, eps=1e-5)
        self.cell = TConvLSTMCell(cin * window, hid, k, self.ndir)
        self.unfold = tnn.Unfold((window, 1), stride=(stride, 1))
        self.deconv = tnn.ConvTranspose2d(hid * 2, hid * 2, (window, 1),
                                          groups=hid * 2, stride=(stride, 1))
        self.prelu = tnn.PReLU()
        self.pnorm = tnn.GroupNorm(1, hid * 2, eps=1e-5)
        self.pout = tnn.Conv2d(hid * 2, cin, 1, padding="same")

    def forward(self, x):
        bs = x.shape[0]
        res = x
        x = self.norm(x)
        x = torch.cat((x, x.flip(self.dim - 1)), dim=1)
        if self.dim == 3:
            x = x.transpose(-1, -2).contiguous()
        ow, oh = x.shape[-2:]
        w_, s_ = self.window, self.stride
        nw = math.ceil((ow - w_) / s_) * s_ + w_
        nh = math.ceil((oh - w_) / s_) * s_ + w_
        x = tF.pad(x, (0, nh - oh, 0, nw - ow))
        iters = math.ceil(nh / w_)
        hid = torch.zeros((1, self.hid * 2, 1))
        cell = torch.zeros((1, self.hid * 2, 1))
        outs = []
        for i in range(iters):
            sl = x[..., i * w_:(i + 1) * w_]
            w, h = sl.shape[-2:]
            sl = sl.permute(0, 3, 1, 2).contiguous().view(bs * h, self.cin * 2, w, 1)
            sl = self.unfold(sl)
            hid, cell = self.cell(sl, hid, cell)
            outs.append(hid.view(bs, h, self.hid * 2, -1).permute(0, 2, 3, 1).contiguous())
        y = torch.cat(outs, dim=-1)
        y = self.pout(self.pnorm(self.prelu(self.deconv(y))))[..., :ow, :oh]
        if self.dim == 3:
            y = y.transpose(-1, -2).contiguous()
        return y + res


def _can(prefix_dw, prefix_pw, mod):
    """Map a torch Sequential(dwconv, pwconv) onto two ConvActNorm trees."""
    return {
        prefix_dw: {"conv": {"weight": jnp.asarray(mod[0].weight.detach().numpy()),
                             "bias": jnp.asarray(mod[0].bias.detach().numpy())}},
        prefix_pw: {"conv": {"weight": jnp.asarray(mod[1].weight.detach().numpy()),
                             "bias": jnp.asarray(mod[1].bias.detach().numpy())}},
    }


def test_bilstm2d_matches_torch(rng):
    B, C, T, F, hid, window, k = 1, 4, 10, 9, 4, 4, 3
    x = rng.standard_normal((B, C, T, F)).astype(np.float32)
    torch.manual_seed(0)
    tm = TBiLSTM2D(C, hid, dim=3, k=k, window=window)
    with torch.no_grad():
        for p in (tm.norm.weight, tm.pnorm.weight):
            p.uniform_(0.5, 1.5)
        for p in (tm.norm.bias, tm.pnorm.bias):
            p.uniform_(-0.2, 0.2)
    golden = tm(torch.from_numpy(x)).detach().numpy()

    m = BiLSTM2D(in_chan=C, hid_chan=hid, dim=3, kernel_size=k, window=window,
                 stride=1, act_type="PReLU", norm_type="gLN", bidirectional=True)
    cell = {}
    cell.update(_can("linear_ih_dw", "linear_ih_pw", tm.cell.linear_ih))
    cell.update(_can("linear_ih_b_dw", "linear_ih_b_pw", tm.cell.linear_ih_b))
    cell["linear_hh"] = {"conv": {"weight": jnp.asarray(tm.cell.linear_hh.weight.detach().numpy()),
                                  "bias": jnp.asarray(tm.cell.linear_hh.bias.detach().numpy())}}
    cell["linear_hh_b"] = {"conv": {"weight": jnp.asarray(tm.cell.linear_hh_b.weight.detach().numpy()),
                                    "bias": jnp.asarray(tm.cell.linear_hh_b.bias.detach().numpy())}}
    params = {
        "norm": {"scale": jnp.asarray(tm.norm.weight.detach().numpy()),
                 "bias": jnp.asarray(tm.norm.bias.detach().numpy())},
        "lstm_cell": cell,
        "proj_deconv": {"weight": jnp.asarray(tm.deconv.weight.detach().numpy()),
                        "bias": jnp.asarray(tm.deconv.bias.detach().numpy())},
        "proj_act": {"alpha": jnp.asarray(tm.prelu.weight.detach().numpy())},
        "proj_norm": {"scale": jnp.asarray(tm.pnorm.weight.detach().numpy()),
                      "bias": jnp.asarray(tm.pnorm.bias.detach().numpy())},
        "proj_out": {"conv": {"weight": jnp.asarray(tm.pout.weight.detach().numpy()),
                              "bias": jnp.asarray(tm.pout.bias.detach().numpy())}},
    }
    got = m.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), golden, atol=5e-5)
