"""Config-driven model assembly: every active config constructs and runs."""
import glob
import os

import numpy as np
import pytest
import yaml

import jax
import jax.numpy as jnp

from rtfs_net_tpu.models import AVNet, get as get_model

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "rtfs_net_tpu", "configs")


def _load(name):
    with open(os.path.join(CONFIG_DIR, name)) as f:
        return yaml.safe_load(f)


def _build_and_run(conf, L=16000, Tv=25):
    model = AVNet(**conf["audionet"])
    mix = jnp.zeros((1, L))
    mouth = jnp.zeros((1, conf["audionet"]["pretrained_vout_chan"], Tv))
    v = model.init(jax.random.PRNGKey(0), mix, mouth)
    out = model.apply(v, mix, mouth)
    return v, out


def test_rtfsnet_4_params_and_shape():
    conf = _load("lrs2_RTFSNet_4_layer.yaml")
    v, out = _build_and_run(conf)
    n_params = sum(x.size for x in jax.tree.leaves(v["params"]))
    # paper reports 0.7 M params for RTFS-Net (README.md:37 / docs table)
    assert 0.6e6 < n_params < 0.8e6, n_params
    assert out.shape == (1, 1, 16000)
    assert np.isfinite(np.asarray(out)).all()


def test_ctcnet_16_params_and_shape():
    conf = _load("lrs2_CTCNet_16_layer.yaml")
    v, out = _build_and_run(conf)
    n_params = sum(x.size for x in jax.tree.leaves(v["params"]))
    # paper reports 7.0 M params for CTCNet
    assert 6.5e6 < n_params < 7.5e6, n_params
    assert out.shape == (1, 1, 16000)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("name", sorted(
    os.path.basename(p) for p in glob.glob(os.path.join(CONFIG_DIR, "*.yaml"))
))
def test_all_configs_construct(name):
    """Every shipped config must at least build its model graph (abstract
    init — no FLOPs burned)."""
    conf = _load(name)
    model = AVNet(**conf["audionet"])
    mix = jnp.zeros((1, 8000))
    mouth = jnp.zeros((1, conf["audionet"]["pretrained_vout_chan"], 13))
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), mix, mouth))
    assert "params" in shapes


def test_rtfsnet_repeats_share_weights():
    """shared=True: param count must not grow with repeats."""
    conf4 = _load("lrs2_RTFSNet_4_layer.yaml")
    conf12 = _load("lrs2_RTFSNet_12_layer.yaml")
    def count(conf):
        model = AVNet(**conf["audionet"])
        mix = jnp.zeros((1, 8000))
        mouth = jnp.zeros((1, 512, 13))
        shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), mix, mouth))
        return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(shapes["params"]))
    assert count(conf4) == count(conf12)


def test_model_registry():
    assert get_model("avnet") is AVNet
    assert get_model("AVNet") is AVNet
    with pytest.raises(ValueError):
        get_model("nope")
