"""Frozen lip-encoder video model (reference:
``src/models/videomodels/frcnn_videomodel.py``): Conv3D frontend (5x7x7,
stride 1x2x2, maxpool) -> per-frame 2D trunk (ResNet-18 or ShuffleNetV2)
-> (B, backend_out, T_v) embedding.

The backbone is pretrained (CTCNet lip-reading checkpoint) and **frozen**:
all params get stop_gradient and BN always runs in eval mode (reference
``frcnn_videomodel.py:78-83``, ``update_frcnn_parameter``). Use
``rtfs_net_tpu.utils.torch_convert`` to import the published ``.pth.tar``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...ops.conv import Conv, max_pool
from ...ops.normalizations import BatchNorm3d
from ...ops.activations import PReLU
from .resnet import ResNet
from .shufflenetv2 import ShuffleNetV2Trunk, STAGE_OUT_CHANNELS


class FRCNNVideoModel(nn.Module):
    backbone_type: str = "resnet"
    relu_type: str = "prelu"
    width_mult: float = 1.0

    @property
    def frontend_nout(self) -> int:
        return 64 if self.backbone_type == "resnet" else 24

    @property
    def backend_out(self) -> int:
        if self.backbone_type == "resnet":
            return 512
        return STAGE_OUT_CHANNELS[self.width_mult][-1]

    @nn.compact
    def __call__(self, x, train: bool = False, frozen: bool = True):
        # x: (B, 1, T, H, W)
        B, C, T, H, W = x.shape
        y = Conv(1, self.frontend_nout, (5, 7, 7), ndim=3, stride=(1, 2, 2),
                 padding=(2, 3, 3), use_bias=False, name="frontend_conv")(x)
        y = BatchNorm3d(self.frontend_nout, name="frontend_bn")(
            y, use_running_average=(frozen or not train)
        )
        if self.relu_type == "prelu":
            y = PReLU(num_parameters=self.frontend_nout, name="frontend_prelu")(y)
        else:
            y = jax.nn.relu(y)
        y = max_pool(y, (1, 3, 3), (1, 2, 2), (0, 1, 1))

        # 3D -> per-frame 2D: (B, C2, T, H', W') -> (B*T, C2, H', W')
        Tnew = y.shape[2]
        y = jnp.swapaxes(y, 1, 2).reshape(B * Tnew, self.frontend_nout,
                                          *y.shape[3:])
        if self.backbone_type == "resnet":
            z = ResNet(relu_type=self.relu_type, name="trunk")(y, train, frozen)
        else:
            z = ShuffleNetV2Trunk(width_mult=self.width_mult,
                                  name="trunk")(y, train, frozen)
        z = z.reshape(B, Tnew, -1)
        return jnp.swapaxes(z, 1, 2)  # (B, backend_out, T)


class AEVideoModel(nn.Module):
    """Frozen conv-autoencoder alternative backbone (reference:
    ``autoencoder_videomodel.py:9-80``)."""

    in_channels: int = 1
    base_channels: int = 4
    num_layers: int = 3
    is2d: bool = False

    @property
    def out_channels(self) -> int:
        return self.base_channels * (2 ** (self.num_layers - 1))

    @nn.compact
    def __call__(self, x, train: bool = False, frozen: bool = True):
        from .autoencoder import EncoderAE

        B, C, T, H, W = x.shape
        y = jnp.swapaxes(x, 1, 2).reshape(B * T, C, H, W)
        z = EncoderAE(self.in_channels, self.base_channels, self.num_layers,
                      name="encoder")(y)
        if self.is2d:
            z = z.reshape(B, T, self.out_channels, -1)
            z = z.transpose(0, 3, 1, 2)  # (B, H'*W', T, C)
        else:
            z = z.reshape(B, T, -1)
            z = jnp.swapaxes(z, 1, 2)  # (B, C*H'*W', T)
        return z
