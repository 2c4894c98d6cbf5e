"""CI for the two entry points that were manual-only in round 1
(STATUS.md): the grad-coverage checker and the AE-pretrainer CLI."""
import argparse
import json
import os
import sys

import numpy as np
import pytest
import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.test_system import TINY_AUDIONET


def test_find_unused_params_cli(tmp_path):
    """One fwd/bwd on a tiny config: every parameter must receive a
    nonzero gradient (reference find_unused_params.py:19-36)."""
    import find_unused_params

    conf = {"audionet": TINY_AUDIONET}
    conf_path = tmp_path / "conf.yaml"
    with open(conf_path, "w") as f:
        yaml.safe_dump(conf, f)
    unused = find_unused_params.main(
        argparse.Namespace(conf_dir=str(conf_path)))
    assert unused == []


def test_train_autoencoder_cli(tmp_path):
    """The AE pretrainer end to end on synthetic mouth tracks: trains,
    logs, exports an encoder checkpoint loadable by AEVideoModel's
    pretrain path."""
    import train_autoencoder

    for split in ("tr", "cv"):
        d = tmp_path / split
        d.mkdir()
        entries = []
        rng = np.random.default_rng(0)
        for i in range(4):
            npz = d / f"mouth{i}.npz"
            frames = (rng.random((6, 96, 96)) * 255).astype(np.uint8)
            np.savez(npz, data=frames)
            entries.append([f"wav{i}.wav", str(npz), 32000])
        with open(d / "s1.json", "w") as f:
            json.dump(entries, f)

    exp_dir = tmp_path / "exp"
    args = argparse.Namespace(
        train_dir=str(tmp_path / "tr"), valid_dir=str(tmp_path / "cv"),
        exp_dir=str(exp_dir), epochs=2, batch_size=2, lr=1e-3,
        base_channels=2, num_layers=3)
    train_autoencoder.main(args)

    ckpt = exp_dir / "best_model.ckpt"
    assert ckpt.exists()
    assert (exp_dir / "best_k_models.json").exists()

    # encoder export round-trips into the AE encoder module
    from flax import serialization as fser
    import jax.numpy as jnp
    from rtfs_net_tpu.models.videomodels.autoencoder import EncoderAE

    with open(ckpt, "rb") as f:
        blob = fser.msgpack_restore(f.read())
    enc = EncoderAE(in_channels=1, base_channels=2, num_layers=3)
    out = enc.apply({"params": blob["params"]}, jnp.zeros((2, 1, 88, 88)))
    assert np.isfinite(np.asarray(out)).all()
