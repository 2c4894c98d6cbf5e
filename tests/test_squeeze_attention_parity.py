"""CBAM / ShuffleAttention / CoTAttention numerical parity vs inline torch
replicas of the reference (attention.py:283-446) — the last shape-only
layer trio."""
import numpy as np
import torch
import torch.nn as tnn

import jax.numpy as jnp

from rtfs_net_tpu.models.layers import CBAMBlock, ShuffleAttention, CoTAttention


def _lin(conv):
    p = {"weight": jnp.asarray(conv.weight.detach().numpy())}
    if conv.bias is not None:
        p["bias"] = jnp.asarray(conv.bias.detach().numpy())
    return p


def test_cbam_matches_torch(rng):
    C, red, k = 16, 4, 7
    x = rng.standard_normal((2, C, 9, 7)).astype(np.float32)
    torch.manual_seed(0)
    se1 = tnn.Conv2d(C, C // red, 1, bias=False)
    se2 = tnn.Conv2d(C // red, C, 1, bias=False)
    sa = tnn.Conv2d(2, 1, k, padding=k // 2)

    xt = torch.from_numpy(x)
    mx = tnn.functional.adaptive_max_pool2d(xt, 1)
    av = tnn.functional.adaptive_avg_pool2d(xt, 1)
    ca = torch.sigmoid(se2(torch.relu(se1(mx))) + se2(torch.relu(se1(av))))
    y = xt * ca
    m1 = y.max(dim=1, keepdim=True)[0]
    a1 = y.mean(dim=1, keepdim=True)
    sat = torch.sigmoid(sa(torch.cat([m1, a1], 1)))
    golden = (y * sat + xt).detach().numpy()

    m = CBAMBlock(in_chan=C, reduction=red, kernel_size=k)
    params = {"se1": _lin(se1), "se2": _lin(se2), "sa": _lin(sa)}
    got = m.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), golden, atol=5e-6)


def test_shuffle_attention_matches_torch(rng):
    C, G = 32, 4
    x = rng.standard_normal((2, C, 9, 7)).astype(np.float32)
    cpg = C // (2 * G)
    rng2 = np.random.default_rng(1)
    cweight = rng2.standard_normal((1, cpg, 1, 1)).astype(np.float32)
    cbias = rng2.standard_normal((1, cpg, 1, 1)).astype(np.float32)
    sweight = rng2.standard_normal((1, cpg, 1, 1)).astype(np.float32)
    sbias = rng2.standard_normal((1, cpg, 1, 1)).astype(np.float32)
    gnw = rng2.standard_normal(cpg).astype(np.float32)
    gnb = rng2.standard_normal(cpg).astype(np.float32)

    xt = torch.from_numpy(x)
    B, _, H, W = xt.shape
    y = xt.view(B * G, -1, H, W)
    x0, x1 = y.chunk(2, dim=1)
    xc = tnn.functional.adaptive_avg_pool2d(x0, 1)
    xc = torch.from_numpy(cweight) * xc + torch.from_numpy(cbias)
    xc = x0 * torch.sigmoid(xc)
    gn = tnn.GroupNorm(cpg, cpg, eps=1e-5)
    with torch.no_grad():
        gn.weight.copy_(torch.from_numpy(gnw))
        gn.bias.copy_(torch.from_numpy(gnb))
    xs = gn(x1)
    xs = torch.from_numpy(sweight) * xs + torch.from_numpy(sbias)
    xs = x1 * torch.sigmoid(xs)
    out = torch.cat([xc, xs], dim=1).view(B, -1, H, W)
    out = (out.reshape(B, 2, -1, H, W).permute(0, 2, 1, 3, 4)
           .reshape(B, -1, H, W))
    golden = out.detach().numpy()

    m = ShuffleAttention(in_chan=C, G=G)
    params = {"cweight": jnp.asarray(cweight), "cbias": jnp.asarray(cbias),
              "sweight": jnp.asarray(sweight), "sbias": jnp.asarray(sbias),
              "gn_scale": jnp.asarray(gnw), "gn_bias": jnp.asarray(gnb)}
    got = m.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), golden, atol=1e-5)


def test_cot_attention_matches_torch(rng):
    C, k = 16, 3
    x = rng.standard_normal((2, C, 9, 7)).astype(np.float32)
    torch.manual_seed(2)
    key_conv = tnn.Conv2d(C, C, k, padding=k // 2, groups=4, bias=False)
    key_bn = tnn.BatchNorm2d(C).eval()
    val_conv = tnn.Conv2d(C, C, 1, bias=False)
    val_bn = tnn.BatchNorm2d(C).eval()
    att1 = tnn.Conv2d(2 * C, 2 * C // 4, 1, bias=False)
    att_bn = tnn.BatchNorm2d(2 * C // 4).eval()
    att2 = tnn.Conv2d(2 * C // 4, k * k * C, 1)
    with torch.no_grad():
        for bn in (key_bn, val_bn, att_bn):
            bn.running_mean.uniform_(-0.2, 0.2)
            bn.running_var.uniform_(0.5, 1.5)
            bn.weight.uniform_(0.5, 1.5)
            bn.bias.uniform_(-0.2, 0.2)

    xt = torch.from_numpy(x)
    with torch.no_grad():
        bs, c, h, w = xt.shape
        k1 = torch.relu(key_bn(key_conv(xt)))
        v = val_bn(val_conv(xt)).view(bs, c, -1)
        y = torch.cat([k1, xt], dim=1)
        att = torch.relu(att_bn(att1(y)))
        att = att2(att).reshape(bs, c, k * k, h, w).mean(2).view(bs, c, -1)
        k2 = (torch.softmax(att, -1) * v).view(bs, c, h, w)
        golden = (k1 + k2).numpy()

    def bn_tree(bn):
        return ({"scale": jnp.asarray(bn.weight.detach().numpy()),
                 "bias": jnp.asarray(bn.bias.detach().numpy())},
                {"mean": jnp.asarray(bn.running_mean.numpy()),
                 "var": jnp.asarray(bn.running_var.numpy())})

    kp, ks = bn_tree(key_bn)
    vp, vs = bn_tree(val_bn)
    ap, as_ = bn_tree(att_bn)
    m = CoTAttention(in_chan=C, kernel_size=k)
    params = {"key_conv": _lin(key_conv), "key_bn": kp,
              "value_conv": _lin(val_conv), "value_bn": vp,
              "att1": _lin(att1), "att_bn": ap, "att2": _lin(att2)}
    stats = {"key_bn": ks, "value_bn": vs, "att_bn": as_}
    got = m.apply({"params": params, "batch_stats": stats}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), golden, atol=5e-5)
