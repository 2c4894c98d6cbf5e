"""ATTNFusionCell (CAF block) numerical parity vs an inline torch replica
of the reference (fusion.py:194-274): 4D audio keys/values gated by the 3D
video stream's resize gate and softmax attention weights."""
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

from rtfs_net_tpu.models.layers import ATTNFusionCell


class TCAF(tnn.Module):
    def __init__(self, ca, cb, k):
        super().__init__()
        self.ca, self.k = ca, k
        # key/value: DW 1x1 conv + BatchNorm2d (+ReLU for key), bias=False
        self.key_conv = tnn.Conv2d(ca, ca, 1, groups=ca, bias=False)
        self.key_bn = tnn.BatchNorm2d(ca)
        self.val_conv = tnn.Conv2d(ca, ca, 1, groups=ca, bias=False)
        self.val_bn = tnn.BatchNorm2d(ca)
        # attention/resize on the 3D video stream: 1D convs + gLN
        self.att_conv = tnn.Conv1d(cb, k * ca, 1, groups=ca)
        self.att_gln = tnn.GroupNorm(1, k * ca, eps=1e-5)
        self.rs_conv = tnn.Conv1d(cb, ca, 1, groups=ca)
        self.rs_gln = tnn.GroupNorm(1, ca, eps=1e-5)

    def forward(self, a, b):
        bs, _, T, _ = a.shape
        bt = tF.interpolate(self.rs_gln(self.rs_conv(b)), size=T,
                            mode="nearest").unsqueeze(-1)
        k1 = torch.relu(self.key_bn(self.key_conv(a))) * bt
        v = self.val_bn(self.val_conv(a))
        att = self.att_gln(self.att_conv(b))
        att = att.reshape(bs, self.ca, self.k, -1).mean(2).view(bs, self.ca, -1)
        att = tF.interpolate(torch.softmax(att, -1), size=T,
                             mode="nearest").unsqueeze(-1)
        return k1 + att * v


def test_caf_cell_matches_torch(rng):
    ca, cb, k = 8, 16, 4
    audio = rng.standard_normal((2, ca, 21, 17)).astype(np.float32)
    video = rng.standard_normal((2, cb, 9)).astype(np.float32)

    torch.manual_seed(0)
    tm = TCAF(ca, cb, k).eval()
    with torch.no_grad():
        for bn in (tm.key_bn, tm.val_bn):
            bn.running_mean.uniform_(-0.2, 0.2)
            bn.running_var.uniform_(0.5, 1.5)
            bn.weight.uniform_(0.5, 1.5)
            bn.bias.uniform_(-0.2, 0.2)
        for g in (tm.att_gln, tm.rs_gln):
            g.weight.uniform_(0.5, 1.5)
            g.bias.uniform_(-0.2, 0.2)
    with torch.no_grad():
        golden = tm(torch.from_numpy(audio), torch.from_numpy(video)).numpy()

    m = ATTNFusionCell(in_chan_a=ca, in_chan_b=cb, kernel_size=k, is2d=True)

    def can(conv, norm, bn=False):
        p = {"conv": {"weight": jnp.asarray(conv.weight.detach().numpy())}}
        if conv.bias is not None:
            p["conv"]["bias"] = jnp.asarray(conv.bias.detach().numpy())
        p["norm"] = {"scale": jnp.asarray(norm.weight.detach().numpy()),
                     "bias": jnp.asarray(norm.bias.detach().numpy())}
        return p

    params = {
        "key_embed": can(tm.key_conv, tm.key_bn),
        "value_embed": can(tm.val_conv, tm.val_bn),
        "attention_embed": can(tm.att_conv, tm.att_gln),
        "resize": can(tm.rs_conv, tm.rs_gln),
    }
    stats = {
        "key_embed": {"norm": {"mean": jnp.asarray(tm.key_bn.running_mean.numpy()),
                               "var": jnp.asarray(tm.key_bn.running_var.numpy())}},
        "value_embed": {"norm": {"mean": jnp.asarray(tm.val_bn.running_mean.numpy()),
                                 "var": jnp.asarray(tm.val_bn.running_var.numpy())}},
    }
    got = m.apply({"params": params, "batch_stats": stats},
                  jnp.asarray(audio), jnp.asarray(video))
    np.testing.assert_allclose(np.asarray(got), golden, atol=5e-5)
