"""Auxiliary CLI coverage: train_autoencoder.py main() and the unified
manifest builder (data_preprocess/preprocess.py)."""
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from rtfs_net_tpu.datas import wavio


def _mouth_npz(path, rng, tv=20):
    np.savez_compressed(path, data=(rng.random((tv, 96, 96)) * 255).astype(np.uint8))


def test_train_autoencoder_cli(tmp_path, rng):
    # manifests with mouth paths (s1.json schema)
    for split in ("tr", "cv"):
        d = tmp_path / split
        d.mkdir(parents=True)
        s1 = []
        for i in range(4):
            wav = str(d / f"s1_{i}.wav")
            wavio.write(wav, rng.standard_normal(4000).astype(np.float32), 16000)
            mp = str(d / f"m_{i}.npz")
            _mouth_npz(mp, rng)
            s1.append([wav, mp, 4000])
        with open(d / "s1.json", "w") as f:
            json.dump(s1, f)

    import train_autoencoder as ae_cli
    import argparse

    args = argparse.Namespace(
        train_dir=str(tmp_path / "tr"), valid_dir=str(tmp_path / "cv"),
        exp_dir=str(tmp_path / "exp"), epochs=2, batch_size=2, lr=1e-3,
        base_channels=4, num_layers=3,
    )
    ae_cli.main(args)
    assert os.path.exists(tmp_path / "exp" / "best_model.ckpt")
    assert os.path.exists(tmp_path / "exp" / "best_k_models.json")
    # exported encoder loads into AEVideoModel
    from flax import serialization as fser
    import jax, jax.numpy as jnp
    from rtfs_net_tpu.models.videomodels import AEVideoModel

    with open(tmp_path / "exp" / "best_model.ckpt", "rb") as f:
        enc = fser.msgpack_restore(f.read())
    model = AEVideoModel(in_channels=1, base_channels=4, num_layers=3)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 4, 88, 88)))
    out = model.apply({"params": {"encoder": enc["params"]}},
                      jnp.zeros((1, 1, 4, 88, 88)))
    assert out.shape[0] == 1


@pytest.mark.parametrize("dataset,wav_name,expected_m1,expected_m2", [
    ("lrs2", "abc123_00001_-1.5_def456_00002_1.5.wav",
     "abc123_00001.npz", "def456_00002.npz"),
    ("vox2", "id00017_abcdefghijk_00001_-2.0_id00042_lmnopqrstuv_00002_2.0.wav",
     "id00017_abcdefghijk_00001.npz", "id00042_lmnopqrstuv_00002.npz"),
])
def test_preprocess_manifest_builder(tmp_path, rng, dataset, wav_name,
                                     expected_m1, expected_m2):
    from data_preprocess.preprocess import preprocess

    audio_root = tmp_path / "audio"
    for spk in ("mix", "s1", "s2"):
        d = audio_root / "tr" / spk
        d.mkdir(parents=True)
        wavio.write(str(d / wav_name),
                    rng.standard_normal(1000).astype(np.float32), 16000)
    mouth_dir = tmp_path / "mouths"
    mouth_dir.mkdir()
    out_dir = tmp_path / "out"
    preprocess(dataset, str(audio_root), str(mouth_dir), str(out_dir),
               splits=("tr",))

    with open(out_dir / "tr" / "mix.json") as f:
        mix = json.load(f)
    assert mix[0][1] == 1000  # n_samples
    with open(out_dir / "tr" / "s1.json") as f:
        s1 = json.load(f)
    assert os.path.basename(s1[0][1]) == expected_m1
    with open(out_dir / "tr" / "s2.json") as f:
        s2 = json.load(f)
    assert os.path.basename(s2[0][1]) == expected_m2


def test_preprocess_wham_audio_only(tmp_path, rng):
    from data_preprocess.preprocess import preprocess

    audio_root = tmp_path / "audio"
    for spk in ("mix", "s1", "s2"):
        d = audio_root / "tr" / spk
        d.mkdir(parents=True)
        wavio.write(str(d / "utt.wav"),
                    rng.standard_normal(500).astype(np.float32), 8000)
    out = tmp_path / "out"
    preprocess("wham", str(audio_root), "", str(out), splits=("tr",))
    with open(out / "tr" / "s1.json") as f:
        s1 = json.load(f)
    assert len(s1[0]) == 2  # no mouth path
