"""DPTNet separator (reference: ``src/models/separators/dpt.py``): gateway +
projection convs around a config-built dual-path transformer stack."""
from __future__ import annotations

from typing import Dict

import flax.linen as nn

from ..layers import ConvNormAct, build


class DPTNetBlock(nn.Module):
    in_chan: int
    hid_chan: int
    layers: Dict[str, dict] = None
    is2d: bool = False
    spatial_swapped: bool = False  # see TDANetBlock

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = ConvNormAct(
            in_chan=self.in_chan, out_chan=self.in_chan, kernel_size=1,
            groups=self.in_chan, act_type="PReLU", is2d=self.is2d,
            name="gateway",
        )(x, train)
        y = ConvNormAct(
            in_chan=self.in_chan, out_chan=self.hid_chan, kernel_size=1,
            is2d=self.is2d, name="projection",
        )(residual, train)
        for li, (lname, lconf) in enumerate((self.layers or {}).items()):
            extra = {}
            if self.spatial_swapped and self.is2d:
                import dataclasses as _dc
                cls = __import__("rtfs_net_tpu.models.layers", fromlist=["get"]).get(lconf["layer_type"])
                if "spatial_swapped" not in {f.name for f in _dc.fields(cls)}:
                    raise NotImplementedError(
                        f"layer {lconf['layer_type']} is not spatial_swapped-capable")
                extra["spatial_swapped"] = True
            mod = build(lconf["layer_type"], in_chan=self.hid_chan,
                        name=f"globalatt{li}", **extra,
                        **{k: v for k, v in lconf.items() if k != "layer_type"})
            y = mod(y, train)
        y = ConvNormAct(
            in_chan=self.hid_chan, out_chan=self.in_chan, kernel_size=1,
            is2d=self.is2d, name="residual_conv",
        )(y, train)
        return y + residual


class DPTNet(nn.Module):
    in_chan: int = -1
    hid_chan: int = -1
    layers: Dict[str, dict] = None
    repeats: int = 4
    shared: bool = False
    is2d: bool = False
    remat: bool = True  # rematerialize each block in backward (saves ~NxHBM)
    spatial_swapped: bool = False  # see TDANetBlock

    def setup(self):
        if self.in_chan > 0:
            kw = dict(in_chan=self.in_chan, hid_chan=self.hid_chan,
                      layers=self.layers, is2d=self.is2d,
                      spatial_swapped=self.spatial_swapped)
            cls = (nn.remat(DPTNetBlock, static_argnums=(2,))
                   if self.remat else DPTNetBlock)
            if self.shared:
                self.blocks = cls(**kw)
            else:
                self.blocks = [cls(**kw) for _ in range(self.repeats)]
        else:
            self.blocks = None

    def get_block(self, i: int):
        if self.blocks is None:
            return lambda x, train=False: x
        return self.blocks if self.shared else self.blocks[i]

    def __call__(self, x, train: bool = False):
        residual = x
        for i in range(self.repeats):
            x = self.get_block(i)((x + residual) if i > 0 else x, train)
        return x
