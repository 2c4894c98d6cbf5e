"""TDANet separator — the RTFS block container
(reference: ``src/models/separators/tdanet.py``).

A TDANetBlock is: gateway DW 1x1 -> projection 1x1 -> strided DW-conv
downsample pyramid -> adaptive-pool sum -> config-built global-attention
stack (for RTFS: DualPathRNN(freq) + DualPathRNN(time) + MHSA2D) ->
per-scale InjectionMultiSum reconstruction -> residual conv.

``shared=True`` (all active RTFS configs) reuses ONE block's params for
every repeat — in flax this is a single module instance called in a Python
loop; XLA unrolls the loop at trace time, sharing weights for free while
keeping each iteration fully fusable.
"""
from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn

from ..layers import ConvNormAct, InjectionMultiSum, build
from ...ops.conv import adaptive_avg_pool


class TDANetBlock(nn.Module):
    in_chan: int
    hid_chan: int
    kernel_size: int = 5
    stride: int = 2
    norm_type: Any = "gLN"
    act_type: Any = "PReLU"
    upsampling_depth: int = 4
    layers: Dict[str, dict] = None
    is2d: bool = False
    # (T,F) axes stored transposed (internal "ft" layout; see
    # AVNet.tf_order): conv kernels are transposed at apply time and the
    # dim-parametrized global-attention layers flip their configured dim.
    # Params stay canonical — checkpoints are layout-independent.
    spatial_swapped: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        depth = self.upsampling_depth
        residual = ConvNormAct(
            in_chan=self.in_chan, out_chan=self.in_chan, kernel_size=1,
            groups=self.in_chan, act_type=self.act_type, is2d=self.is2d,
            spatial_swapped=self.spatial_swapped, name="gateway",
        )(x, train)
        x_enc = ConvNormAct(
            in_chan=self.in_chan, out_chan=self.hid_chan, kernel_size=1,
            norm_type=self.norm_type, act_type=self.act_type, is2d=self.is2d,
            spatial_swapped=self.spatial_swapped, name="projection",
        )(residual, train)

        # bottom-up pyramid (stride 1 at level 0)
        downsampled = [
            ConvNormAct(
                in_chan=self.hid_chan, out_chan=self.hid_chan,
                kernel_size=self.kernel_size, stride=1, groups=self.hid_chan,
                norm_type=self.norm_type, is2d=self.is2d,
                spatial_swapped=self.spatial_swapped, name="down0",
            )(x_enc, train)
        ]
        for i in range(1, depth):
            downsampled.append(
                ConvNormAct(
                    in_chan=self.hid_chan, out_chan=self.hid_chan,
                    kernel_size=self.kernel_size, stride=self.stride,
                    groups=self.hid_chan, norm_type=self.norm_type,
                    is2d=self.is2d, spatial_swapped=self.spatial_swapped,
                    name=f"down{i}",
                )(downsampled[-1], train)
            )

        # pooled global features at the coarsest scale
        target = downsampled[-1].shape[2:]
        global_features = sum(adaptive_avg_pool(f, target) for f in downsampled)

        # config-built global attention stack
        layers = self.layers or {}
        for li, (lname, lconf) in enumerate(layers.items()):
            extra = {}
            if self.spatial_swapped and self.is2d:
                # build() drops kwargs the class doesn't declare — guard so
                # a non-flippable layer can't silently run unswapped (the
                # AVNet tf_order eligibility check should prevent this)
                import dataclasses as _dc
                cls = __import__("rtfs_net_tpu.models.layers", fromlist=["get"]).get(lconf["layer_type"])
                if "spatial_swapped" not in {f.name for f in _dc.fields(cls)}:
                    raise NotImplementedError(
                        f"layer {lconf['layer_type']} is not spatial_swapped-capable")
                extra["spatial_swapped"] = True
            mod = build(lconf["layer_type"], in_chan=self.hid_chan,
                        name=f"globalatt{li}", **extra,
                        **{k: v for k, v in lconf.items() if k != "layer_type"})
            global_features = mod(global_features, train)

        # TF-AR reconstruction: inject global into each scale...
        fused = [
            InjectionMultiSum(
                in_chan=self.hid_chan, kernel_size=self.kernel_size,
                norm_type=self.norm_type, is2d=self.is2d,
                spatial_swapped=self.spatial_swapped, name=f"fuse{i}",
            )(downsampled[i], global_features, train)
            for i in range(depth)
        ]
        # ...then fold scales back coarsest-to-finest
        expanded = InjectionMultiSum(
            in_chan=self.hid_chan, kernel_size=self.kernel_size,
            norm_type=self.norm_type, is2d=self.is2d,
            spatial_swapped=self.spatial_swapped, name=f"concat{depth - 2}",
        )(fused[-2], fused[-1], train) + downsampled[-2]
        for i in range(depth - 3, -1, -1):
            expanded = InjectionMultiSum(
                in_chan=self.hid_chan, kernel_size=self.kernel_size,
                norm_type=self.norm_type, is2d=self.is2d,
                spatial_swapped=self.spatial_swapped, name=f"concat{i}",
            )(fused[i], expanded, train) + downsampled[i]

        out = ConvNormAct(
            in_chan=self.hid_chan, out_chan=self.in_chan, kernel_size=1,
            is2d=self.is2d, spatial_swapped=self.spatial_swapped,
            name="residual_conv",
        )(expanded, train) + residual
        return out


class TDANet(nn.Module):
    """Repeat container (reference ``tdanet.py:136-211``): ``shared=True``
    reuses one block, else per-repeat blocks. ``get_block(i)`` returns a
    callable bound to repeat i so RefinementModule can interleave fusion."""

    in_chan: int = -1
    hid_chan: int = -1
    kernel_size: int = 5
    stride: int = 2
    norm_type: Any = "gLN"
    act_type: Any = "PReLU"
    upsampling_depth: int = 4
    layers: Dict[str, dict] = None
    repeats: int = 4
    shared: bool = False
    is2d: bool = False
    remat: bool = True  # rematerialize each block in backward (saves ~NxHBM)
    spatial_swapped: bool = False  # see TDANetBlock

    def setup(self):
        if self.in_chan > 0 and self.hid_chan > 0:
            kw = dict(
                in_chan=self.in_chan, hid_chan=self.hid_chan,
                kernel_size=self.kernel_size, stride=self.stride,
                norm_type=self.norm_type, act_type=self.act_type,
                upsampling_depth=self.upsampling_depth, layers=self.layers,
                is2d=self.is2d, spatial_swapped=self.spatial_swapped,
            )
            cls = (nn.remat(TDANetBlock, static_argnums=(2,))
                   if self.remat else TDANetBlock)
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
