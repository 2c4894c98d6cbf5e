"""MLP (MLP-Mixer) numerical parity vs an inline torch replica of the
reference (mlp.py:24-68: patchify -> [token-mix, channel-mix] -> unpatchify
with the always-pad-to-next-multiple grid rule)."""
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as tF

import jax.numpy as jnp

from rtfs_net_tpu.models.layers import MLP


class TMixer(tnn.Module):
    def __init__(self, in_chan, patch, dim, depth, num_patches,
                 expansion=4, expansion_token=0.5):
        super().__init__()
        self.patch, self.in_chan = patch, in_chan
        self.embed = tnn.Linear(patch * patch * in_chan, dim)
        self.blocks = tnn.ModuleList()
        for _ in range(depth):
            blk = tnn.ModuleDict({
                "norm_tok": tnn.LayerNorm(dim),
                "tok1": tnn.Conv1d(num_patches, num_patches * expansion, 1),
                "tok2": tnn.Conv1d(num_patches * expansion, num_patches, 1),
                "norm_ch": tnn.LayerNorm(dim),
                "ch1": tnn.Linear(dim, int(dim * expansion_token)),
                "ch2": tnn.Linear(int(dim * expansion_token), dim),
            })
            self.blocks.append(blk)
        self.norm_out = tnn.LayerNorm(dim)
        self.unembed = tnn.Linear(dim, patch * patch * in_chan)

    def forward(self, x):
        p = self.patch
        ow, oh = x.shape[-2:]
        nw = (ow // p) * p + p - ow
        nh = (oh // p) * p + p - oh
        x = tF.pad(x, (0, nh, 0, nw))
        B, C, H, W = x.shape
        h, w = H // p, W // p
        # 'b c (h p1) (w p2) -> b (h w) (p1 p2 c)'
        y = (x.view(B, C, h, p, w, p).permute(0, 2, 4, 3, 5, 1)
             .reshape(B, h * w, p * p * C))
        y = self.embed(y)
        for blk in self.blocks:
            res = y
            z = blk["norm_tok"](y)
            z = blk["tok2"](torch.nn.functional.gelu(blk["tok1"](z)))
            y = z + res
            res = y
            z = blk["norm_ch"](y)
            z = blk["ch2"](torch.nn.functional.gelu(blk["ch1"](z)))
            y = z + res
        y = self.unembed(self.norm_out(y))
        out = (y.view(B, h, w, p, p, C).permute(0, 5, 1, 3, 2, 4)
               .reshape(B, C, h * p, w * p))
        return out[..., :ow, :oh]


def test_mlp_mixer_matches_torch(rng):
    C, T, F, p, dim, depth = 4, 10, 7, 4, 16, 2
    x = rng.standard_normal((1, C, T, F)).astype(np.float32)
    nw = (T // p) * p + p
    nh = (F // p) * p + p
    num_patches = (nw // p) * (nh // p)

    torch.manual_seed(0)
    tm = TMixer(C, p, dim, depth, num_patches)
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tnn.LayerNorm):
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.2, 0.2)
    golden = tm(torch.from_numpy(x)).detach().numpy()

    m = MLP(in_chan=C, image_size=(T, F), patch_size=p, dim=dim, depth=depth)

    def lin(mod):
        return {"weight": jnp.asarray(mod.weight.detach().numpy().squeeze(-1)
                                      if mod.weight.ndim == 3
                                      else mod.weight.detach().numpy()),
                "bias": jnp.asarray(mod.bias.detach().numpy())}

    def ln(mod):
        return {"scale": jnp.asarray(mod.weight.detach().numpy()),
                "bias": jnp.asarray(mod.bias.detach().numpy())}

    params = {"embed": lin(tm.embed), "unembed": lin(tm.unembed),
              "norm_out": ln(tm.norm_out)}
    for d, blk in enumerate(tm.blocks):
        params[f"norm_tok{d}"] = ln(blk["norm_tok"])
        params[f"tok{d}"] = {"fc1": lin(blk["tok1"]), "fc2": lin(blk["tok2"])}
        params[f"norm_ch{d}"] = ln(blk["norm_ch"])
        params[f"ch{d}"] = {"fc1": lin(blk["ch1"]), "fc2": lin(blk["ch2"])}
    got = m.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), golden, atol=5e-5)
