"""Legacy-config compatibility sweep.

The reference ships 38 legacy YAMLs (``/root/reference/config/legacy-configs``)
exercising the layer zoo (permutator, mlp, sru, grufusion, cmsm 2-chan,
cotatt, shuffleatt, GALR, ...). Every buildable one must construct through
the real config path (``AVNet(**conf["audionet"])`` — the reference's
train.py:79 contract) and run a tiny forward. The three configs naming
classes that no longer exist in the reference source (GridNet, SRUpp,
RI_MaskGenerator — SURVEY §2.4: "do not build them") are excluded by name.
"""
import glob
import os

import numpy as np
import pytest
import yaml

import jax
import jax.numpy as jnp

from rtfs_net_tpu.models import build_model

LEGACY_DIR = "/root/reference/config/legacy-configs"

# dead configs — these YAMLs cannot build/run against the reference source
# either (verified by constructing the reference model)
DEAD = {
    "lrs2_gridnet_large_1d.yml":      "GridNet (class removed from src/)",
    "lrs2_tdanet2d_mini.yml":         "RI_MaskGenerator (class removed)",
    "lrs2_tdavnet_mini_srupp.yml":    "SRUpp (class removed)",
    # audio_params lacks is2d so a 1-D separator meets the 2-D STFT
    # embedding; the reference crashes identically ("Expected 2D or 3D
    # input to conv1d, got [1, 256, 251, 129]")
    "lrs2_tdavnet_mini_gridnetdpt_time.yml": "stale config, 1-D net on 2-D embedding",
}

CONFIGS = (sorted(os.path.basename(p)
                  for p in glob.glob(os.path.join(LEGACY_DIR, "*.yml")))
           if os.path.isdir(LEGACY_DIR) else [])

pytestmark = pytest.mark.skipif(not CONFIGS, reason="reference not mounted")


def test_sweep_is_complete():
    """38 legacy configs: 34 buildable + 4 documented-dead."""
    assert len(CONFIGS) == 38, CONFIGS
    assert set(DEAD) <= set(CONFIGS)


@pytest.mark.parametrize("name", [c for c in CONFIGS if c not in DEAD])
def test_legacy_config_builds_and_forwards(name):
    with open(os.path.join(LEGACY_DIR, name)) as f:
        conf = yaml.safe_load(f)
    audionet = conf["audionet"]
    # build_model mirrors the reference AVNet's *args/**kwargs swallow of
    # dead config keys (several legacy YAMLs carry e.g. concat_first)
    model = build_model("AVNet", **audionet)

    # 2 s @16 kHz — the training segment every config is built for (several
    # legacy layers pin LN4D affines to the 2 s time-axis length, e.g.
    # MultiHeadSelfAttention2D dim=4 n_freqs=126 == T/2 at hop 128)
    L = 32000
    rng = np.random.default_rng(0)
    mix = jnp.asarray(rng.standard_normal((1, L)).astype(np.float32))
    mouth = None
    if audionet.get("video_params"):
        vout = int(audionet.get("pretrained_vout_chan", 512))
        if audionet.get("video_bn_params", {}).get("is2d"):
            # 2D video configs consume the AE 2D embedding
            # (B, H'·W', T_v, C_ae) — reference
            # autoencoder_videomodel.py:49-51 (C_ae=16 for the default AE)
            shape = (1, vout, 50, 16)
        else:
            shape = (1, vout, 50)  # 25 fps x 2 s
        mouth = jnp.asarray(
            rng.standard_normal(shape).astype(np.float32) * 0.1)

    variables = jax.jit(model.init)(jax.random.PRNGKey(0), mix, mouth)
    out = jax.jit(model.apply)(variables, mix, mouth)
    assert out.shape == (1, audionet["n_src"], L)
    assert bool(jnp.isfinite(out).all())
