"""Utils: chunking roundtrip vs inline torch replica, parser round-trip,
serialization, flops report."""
import numpy as np
import torch

import jax
import jax.numpy as jnp

from rtfs_net_tpu.utils import (
    split_feature, merge_feature, pad_x_to_y, get_bandwidths,
    prepare_parser_from_dict, parse_args_as_dict, separate,
    flops_report, count_params,
)


def _torch_split(x, block_size):
    B, N, T = x.shape
    stride = block_size // 2
    rest = block_size - (stride + T % block_size) % block_size
    if rest > 0:
        x = torch.cat([x, torch.zeros(B, N, rest)], 2)
    x = torch.cat([torch.zeros(B, N, stride), x, torch.zeros(B, N, stride)], 2)
    b1 = x[:, :, :-stride].contiguous().view(B, N, -1, block_size)
    b2 = x[:, :, stride:].contiguous().view(B, N, -1, block_size)
    block = torch.cat([b1, b2], 3).view(B, N, -1, block_size).transpose(2, 3)
    return block.contiguous(), rest


def test_split_merge_roundtrip(rng):
    x = rng.standard_normal((2, 4, 100)).astype(np.float32)
    block, rest = split_feature(jnp.asarray(x), 16)
    tb, trest = _torch_split(torch.from_numpy(x), 16)
    assert rest == trest
    np.testing.assert_allclose(np.asarray(block), tb.numpy())
    merged = merge_feature(block, rest)
    # overlap-add of 50% chunks doubles the signal? No: reconstruction is
    # exact because each sample appears in exactly two half-shifted chunks
    np.testing.assert_allclose(np.asarray(merged), 2 * x, atol=1e-5)


def test_pad_x_to_y():
    x = jnp.ones((2, 5))
    y = jnp.zeros((2, 9))
    assert pad_x_to_y(x, y).shape == (2, 9)


def test_get_bandwidths():
    bw = get_bandwidths(256, 16000)
    assert sum(bw) == 129


def test_parser_roundtrip():
    conf = {
        "training": {"epochs": 200, "half_lr": True, "divide_lr_by": None},
        "optim": {"lr": 0.001},
        "audionet": {"n_src": 1, "audio_params": {"repeats": 4}},
    }
    parser = prepare_parser_from_dict(conf)
    out = parse_args_as_dict(parser, args=["--epochs", "100", "--half_lr", "false"])
    assert out["training"]["epochs"] == 100
    assert out["training"]["half_lr"] is False
    assert out["training"]["divide_lr_by"] is None
    assert out["optim"]["lr"] == 0.001
    assert out["audionet"]["audio_params"] == {"repeats": 4}  # deep passthrough
    assert "main_args" in out


def test_separate_energy_rescale(rng):
    x = rng.standard_normal((1, 1000)).astype(np.float32)
    out = separate(lambda w: (w * 0.1)[:, None, :], x)
    assert isinstance(out, np.ndarray)
    np.testing.assert_allclose(np.abs(out).sum(), np.abs(x).sum(), rtol=1e-4)


def test_serialization_roundtrip(tmp_path):
    from rtfs_net_tpu.models import serialization as ser
    from rtfs_net_tpu.models import AVNet
    import yaml, os

    conf = yaml.safe_load(open(os.path.join(
        os.path.dirname(__file__), "..", "rtfs_net_tpu", "configs",
        "lrs2_RTFSNet_4_layer.yaml")))
    args = conf["audionet"]
    model = AVNet(**args)
    mix = jnp.zeros((1, 4000))
    mouth = jnp.zeros((1, 512, 8))
    v = jax.jit(model.init)(jax.random.PRNGKey(0), mix, mouth)

    path = str(tmp_path / "best_model.ckpt")
    ser.save_model(path, "AVNet", args, v)
    model2, v2, header = ser.load_model(path)
    assert header["model_name"] == "AVNet"
    assert "software_versions" in header["infos"]
    out1 = model.apply(v, mix, mouth)
    out2 = model2.apply(v2, mix, mouth)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))


def test_flops_report_runs():
    rep = flops_report(lambda a, b: a @ b, jnp.ones((64, 64)), jnp.ones((64, 64)))
    # CPU backend supports cost analysis; flops ~= 2*64^3
    assert rep["flops"] > 0
    assert count_params({"a": jnp.ones((3, 4))}) == 12
