"""Checkpoint converter: a torch replica of the CTCNet video backbone is
saved with reference key naming, converted, and must match end-to-end."""
import numpy as np
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from rtfs_net_tpu.models.videomodels import FRCNNVideoModel
from rtfs_net_tpu.utils.torch_convert import load_video_backbone
from tests.test_videomodels import TBasicBlock


class TTrunk(tnn.Module):
    def __init__(self):
        super().__init__()
        inplanes = 64
        for li, (planes, blocks, stride) in enumerate(
            zip((64, 128, 256, 512), (2, 2, 2, 2), (1, 2, 2, 2))
        ):
            seq = []
            for b in range(blocks):
                s = stride if b == 0 else 1
                ds = None
                if b == 0 and (s != 1 or inplanes != planes):
                    ds = tnn.Sequential(
                        tnn.Conv2d(inplanes, planes, 1, s, bias=False),
                        tnn.BatchNorm2d(planes),
                    )
                seq.append(TBasicBlock(inplanes, planes, s, ds))
                inplanes = planes
            self.add_module(f"layer{li + 1}", tnn.Sequential(*seq))

    def forward(self, x):
        for li in range(1, 5):
            x = getattr(self, f"layer{li}")(x)
        return x.mean(dim=(2, 3))


class TVideoModel(tnn.Module):
    def __init__(self):
        super().__init__()
        self.frontend3D = tnn.Sequential(
            tnn.Conv3d(1, 64, (5, 7, 7), (1, 2, 2), (2, 3, 3), bias=False),
            tnn.BatchNorm3d(64),
            tnn.PReLU(64),
            tnn.MaxPool3d((1, 3, 3), (1, 2, 2), (0, 1, 1)),
        )
        self.trunk = TTrunk()

    def forward(self, x):
        B, C, T, H, W = x.shape
        y = self.frontend3D(x)
        Tn = y.shape[2]
        y = y.transpose(1, 2).reshape(B * Tn, y.shape[1], *y.shape[3:])
        z = self.trunk(y)
        return z.view(B, Tn, -1).transpose(1, 2)


def test_video_backbone_conversion(rng, tmp_path):
    torch.manual_seed(0)
    tm = TVideoModel().eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, (tnn.BatchNorm2d, tnn.BatchNorm3d)):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)
    ckpt_path = str(tmp_path / "backbone.pth.tar")
    sd = tm.state_dict()
    sd["tcn.something"] = torch.zeros(3)  # reference skips tcn keys
    torch.save({"model_state_dict": sd}, ckpt_path)

    x = rng.standard_normal((1, 1, 6, 88, 88)).astype(np.float32)
    with torch.no_grad():
        golden = tm(torch.from_numpy(x)).numpy()

    model = FRCNNVideoModel(backbone_type="resnet", relu_type="prelu")
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = load_video_backbone(ckpt_path, variables)
    got = model.apply(variables, jnp.asarray(x))
    assert got.shape == golden.shape
    np.testing.assert_allclose(np.asarray(got), golden, atol=2e-3,
                               rtol=1e-3)
