"""Permutator (ViP) numerical parity vs an inline torch replica of the
reference (permutator.py:27-99): segmented height/width/channel mixing."""
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as tF

import jax.numpy as jnp

from rtfs_net_tpu.models.layers import Permutator


class TPermutator(tnn.Module):
    def __init__(self, in_chan, patch, dim, depth, h, w, segments, expansion=4):
        super().__init__()
        self.p, self.c, self.h, self.w, self.s = patch, in_chan, h, w, segments
        self.embed = tnn.Linear(patch * patch * in_chan, dim)
        self.blocks = tnn.ModuleList()
        for _ in range(depth):
            self.blocks.append(tnn.ModuleDict({
                "norm_perm": tnn.LayerNorm(dim),
                "hmix": tnn.Linear(h * segments, h * segments),
                "wmix": tnn.Linear(w * segments, w * segments),
                "cmix": tnn.Linear(dim, dim),
                "proj": tnn.Linear(dim, dim),
                "norm_ff": tnn.LayerNorm(dim),
                "ff1": tnn.Linear(dim, dim * expansion),
                "ff2": tnn.Linear(dim * expansion, dim),
            }))
        self.norm_out = tnn.LayerNorm(dim)
        self.unembed = tnn.Linear(dim, patch * patch * in_chan)

    def forward(self, x):
        p, s = self.p, self.s
        ow, oh = x.shape[-2:]
        x = tF.pad(x, (0, (oh // p) * p + p - oh, 0, (ow // p) * p + p - ow))
        B, C, H, W = x.shape
        h, w = H // p, W // p
        y = (x.view(B, C, h, p, w, p).permute(0, 2, 4, 3, 5, 1)
             .reshape(B, h, w, p * p * C))
        y = self.embed(y)
        dim = y.shape[-1]
        c = dim // s
        for blk in self.blocks:
            res = y
            z = blk["norm_perm"](y)
            zh = (z.view(B, h, w, c, s).permute(0, 2, 3, 1, 4)
                  .reshape(B, w, c, h * s))
            zh = blk["hmix"](zh)
            zh = (zh.view(B, w, c, h, s).permute(0, 3, 1, 2, 4)
                  .reshape(B, h, w, c * s))
            zw = (z.view(B, h, w, c, s).permute(0, 1, 3, 2, 4)
                  .reshape(B, h, c, w * s))
            zw = blk["wmix"](zw)
            zw = (zw.view(B, h, c, w, s).permute(0, 1, 3, 2, 4)
                  .reshape(B, h, w, c * s))
            zc = blk["cmix"](z)
            y = blk["proj"](zh + zw + zc) + res
            res = y
            z = blk["norm_ff"](y)
            y = blk["ff2"](torch.nn.functional.gelu(blk["ff1"](z))) + res
        y = self.unembed(self.norm_out(y))
        out = (y.reshape(B, h, w, p, p, C).permute(0, 5, 1, 3, 2, 4)
               .reshape(B, C, h * p, w * p))
        return out[..., :ow, :oh]


def test_permutator_matches_torch(rng):
    C, T, F, p, dim, depth, s = 4, 10, 7, 4, 16, 2, 4
    x = rng.standard_normal((1, C, T, F)).astype(np.float32)
    h = ((T // p) * p + p) // p
    w = ((F // p) * p + p) // p

    torch.manual_seed(0)
    tm = TPermutator(C, p, dim, depth, h, w, s)
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tnn.LayerNorm):
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.2, 0.2)
    golden = tm(torch.from_numpy(x)).detach().numpy()

    m = Permutator(in_chan=C, image_size=(T, F), patch_size=p, dim=dim,
                   depth=depth, segments=s)

    def lin(mod):
        return {"weight": jnp.asarray(mod.weight.detach().numpy()),
                "bias": jnp.asarray(mod.bias.detach().numpy())}

    def ln(mod):
        return {"scale": jnp.asarray(mod.weight.detach().numpy()),
                "bias": jnp.asarray(mod.bias.detach().numpy())}

    params = {"embed": lin(tm.embed), "unembed": lin(tm.unembed),
              "norm_out": ln(tm.norm_out)}
    for d, blk in enumerate(tm.blocks):
        params[f"norm_perm{d}"] = ln(blk["norm_perm"])
        params[f"hmix{d}"] = lin(blk["hmix"])
        params[f"wmix{d}"] = lin(blk["wmix"])
        params[f"cmix{d}"] = lin(blk["cmix"])
        params[f"proj{d}"] = lin(blk["proj"])
        params[f"norm_ff{d}"] = ln(blk["norm_ff"])
        params[f"ff{d}"] = {"fc1": lin(blk["ff1"]), "fc2": lin(blk["ff2"])}
    got = m.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), golden, atol=5e-5)
