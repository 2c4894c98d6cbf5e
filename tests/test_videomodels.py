"""Video model tests: ResNet trunk parity vs a standard torch ResNet-18
(headless) replica; shape coverage for the full frozen lip encoders."""
import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from rtfs_net_tpu.models import videomodels as vm


# ---- torch replica of a headless ResNet-18 trunk (standard torchvision
# basic-block structure, relu type fixed to prelu like the reference) -----
class TBasicBlock(tnn.Module):
    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.relu1 = tnn.PReLU(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.relu2 = tnn.PReLU(planes)
        self.downsample = downsample

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        y = self.bn1(self.conv1(x))
        y = self.relu1(y)
        y = self.bn2(self.conv2(y))
        return self.relu2(y + r)


def make_torch_trunk():
    layers = []
    inplanes = 64
    for planes, blocks, stride in zip((64, 128, 256, 512), (2, 2, 2, 2), (1, 2, 2, 2)):
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
        layers.append(tnn.Sequential(*seq))
    return tnn.Sequential(*layers)


def torch_trunk_params_to_flax(trunk):
    """Map the torch replica's state dict onto the flax ResNet param tree."""
    params, stats = {}, {}
    for li, seq in enumerate(trunk):
        for b, blk in enumerate(seq):
            name = f"layer{li + 1}_{b}"
            p = {
                "cbn1": {"conv": {"weight": jnp.asarray(blk.conv1.weight.detach().numpy())},
                         "bn": {"scale": jnp.asarray(blk.bn1.weight.detach().numpy()),
                                "bias": jnp.asarray(blk.bn1.bias.detach().numpy())}},
                "cbn2": {"conv": {"weight": jnp.asarray(blk.conv2.weight.detach().numpy())},
                         "bn": {"scale": jnp.asarray(blk.bn2.weight.detach().numpy()),
                                "bias": jnp.asarray(blk.bn2.bias.detach().numpy())}},
                "relu1": {"alpha": jnp.asarray(blk.relu1.weight.detach().numpy())},
                "relu2": {"alpha": jnp.asarray(blk.relu2.weight.detach().numpy())},
            }
            s = {
                "cbn1": {"bn": {"mean": jnp.asarray(blk.bn1.running_mean.numpy()),
                                "var": jnp.asarray(blk.bn1.running_var.numpy())}},
                "cbn2": {"bn": {"mean": jnp.asarray(blk.bn2.running_mean.numpy()),
                                "var": jnp.asarray(blk.bn2.running_var.numpy())}},
            }
            if blk.downsample is not None:
                p["downsample"] = {
                    "conv": {"weight": jnp.asarray(blk.downsample[0].weight.detach().numpy())},
                    "bn": {"scale": jnp.asarray(blk.downsample[1].weight.detach().numpy()),
                           "bias": jnp.asarray(blk.downsample[1].bias.detach().numpy())},
                }
                s["downsample"] = {"bn": {"mean": jnp.asarray(blk.downsample[1].running_mean.numpy()),
                                          "var": jnp.asarray(blk.downsample[1].running_var.numpy())}}
            params[name] = p
            stats[name] = s
    return params, stats


def test_resnet_trunk_matches_torch(rng):
    trunk = make_torch_trunk().eval()
    # randomize BN stats so eval-mode normalization is non-trivial
    with torch.no_grad():
        for m in trunk.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)
    x = rng.standard_normal((3, 64, 22, 22)).astype(np.float32)
    with torch.no_grad():
        golden = trunk(torch.from_numpy(x)).mean(dim=(2, 3)).numpy()

    model = vm.ResNet(relu_type="prelu")
    params, stats = torch_trunk_params_to_flax(trunk)
    got = model.apply({"params": params, "batch_stats": stats}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), golden, atol=2e-4)


def test_frcnn_videomodel_resnet_shapes(rng):
    x = rng.standard_normal((2, 1, 10, 88, 88)).astype(np.float32)
    model = vm.FRCNNVideoModel(backbone_type="resnet", relu_type="prelu")
    v = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = model.apply(v, jnp.asarray(x))
    assert out.shape == (2, 512, 10)
    n_params = sum(p.size for p in jax.tree.leaves(v["params"]))
    # reference reports ~11.2M params for the resnet backbone
    assert 10e6 < n_params < 13e6, n_params


@pytest.mark.parametrize("width_mult,out", [(1.0, 1024), (2.0, 2048)])
def test_frcnn_videomodel_shufflenet_shapes(rng, width_mult, out):
    x = rng.standard_normal((1, 1, 4, 88, 88)).astype(np.float32)
    model = vm.FRCNNVideoModel(backbone_type="shufflenet", width_mult=width_mult)
    v = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = model.apply(v, jnp.asarray(x))
    assert y.shape == (1, out, 4)


def test_ae_videomodel_and_autoencoder(rng):
    x = rng.standard_normal((2, 1, 6, 88, 88)).astype(np.float32)
    model = vm.AEVideoModel(in_channels=1, base_channels=4, num_layers=3)
    v = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = model.apply(v, jnp.asarray(x))
    # 88 -> 44 -> 22 -> 11 spatial, C=16 -> (B, 16*11*11, T)
    assert y.shape == (2, 16 * 11 * 11, 6)

    frames = rng.standard_normal((4, 1, 88, 88)).astype(np.float32)
    ae = vm.AE(in_channels=1, base_channels=8, num_layers=3)
    va = ae.init(jax.random.PRNGKey(0), jnp.asarray(frames))
    recon = ae.apply(va, jnp.asarray(frames))
    assert recon.shape == frames.shape


def test_videomodel_registry():
    assert vm.get("FRCNNVideoModel") is vm.FRCNNVideoModel
    assert vm.get("frcnnvideomodel") is vm.FRCNNVideoModel
    assert vm.get(None) is None
    with pytest.raises(ValueError):
        vm.get("nope")
