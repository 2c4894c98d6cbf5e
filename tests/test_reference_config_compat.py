"""Schema compatibility: the REFERENCE repo's own YAML configs (read from
the read-only checkout when present) must construct and run through this
framework unmodified — the contract that lets users switch stacks."""
import glob
import os

import pytest
import yaml

import jax
import jax.numpy as jnp

REF_CONFIG_DIR = "/root/reference/config"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_CONFIG_DIR),
    reason="reference checkout not present",
)


@pytest.mark.parametrize("path", sorted(glob.glob(os.path.join(REF_CONFIG_DIR, "*.yaml"))))
def test_reference_yaml_constructs(path):
    with open(path) as f:
        conf = yaml.safe_load(f)
    from rtfs_net_tpu.models import AVNet

    model = AVNet(**conf["audionet"])
    mix = jnp.zeros((1, 8000))
    mouth = jnp.zeros((1, conf["audionet"]["pretrained_vout_chan"], 13))
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), mix, mouth))
    assert "params" in shapes


def test_reference_rtfs4_forward_runs():
    with open(os.path.join(REF_CONFIG_DIR, "lrs2_RTFSNet_4_layer.yaml")) as f:
        conf = yaml.safe_load(f)
    from rtfs_net_tpu.models import AVNet

    model = AVNet(**conf["audionet"])
    mix = jnp.zeros((1, 8000))
    mouth = jnp.zeros((1, 512, 13))
    v = model.init(jax.random.PRNGKey(0), mix, mouth)
    out = model.apply(v, mix, mouth)
    assert out.shape == (1, 1, 8000)
