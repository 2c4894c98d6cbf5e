"""separate.py CLI: exported model separates a wav file end to end."""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from rtfs_net_tpu.datas import wavio
from rtfs_net_tpu.models import AVNet, serialization
from tests.test_system import TINY_AUDIONET


def test_separate_cli(tmp_path, rng):
    conf = {**TINY_AUDIONET}
    conf["video_params"] = {}
    conf["fusion_params"] = {}
    model = AVNet(**conf)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2000)), None)
    ckpt = str(tmp_path / "best_model.ckpt")
    serialization.save_model(ckpt, "AVNet", conf, v)

    wav_path = str(tmp_path / "mix.wav")
    wavio.write(wav_path, rng.standard_normal(3000).astype(np.float32) * 0.1, 16000)

    import separate as cli

    cli.main(argparse.Namespace(
        model=ckpt, input=wav_path, mouth=None, videonet_conf=None,
        output=str(tmp_path / "out"), bucket_size=2000, bf16=False,
    ))
    out = str(tmp_path / "out" / "mix_s1.wav")
    assert os.path.exists(out)
    data, sr = wavio.read(out)
    assert sr == 16000 and data.shape[0] == 3000
    assert np.isfinite(data).all()


def test_separate_cli_chunked(tmp_path, rng):
    """Long-form mode: 50%-overlap chunked separation via the reference's
    split/merge utilities, all chunks one batch."""
    conf = {**TINY_AUDIONET}
    conf["video_params"] = {}
    conf["fusion_params"] = {}
    model = AVNet(**conf)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2000)), None)
    ckpt = str(tmp_path / "best_model.ckpt")
    serialization.save_model(ckpt, "AVNet", conf, v)

    wav_path = str(tmp_path / "long.wav")
    wavio.write(wav_path, rng.standard_normal(9100).astype(np.float32) * 0.1, 16000)

    import separate as cli

    cli.main(argparse.Namespace(
        model=ckpt, input=wav_path, mouth=None, videonet_conf=None,
        output=str(tmp_path / "out"), bucket_size=2000, bf16=False,
        chunk_seconds=0.25,
    ))
    data, sr = wavio.read(str(tmp_path / "out" / "long_s1.wav"))
    assert sr == 16000 and data.shape[0] == 9100
    assert np.isfinite(data).all() and np.abs(data).max() > 0


def test_separate_cli_artifact(tmp_path, rng):
    """--model accepts a .rtfsx serving artifact; output matches the
    ckpt-path run (same weights, f32 — only the XLA compilation differs)."""
    conf = {**TINY_AUDIONET}
    conf["video_params"] = {}
    conf["fusion_params"] = {}
    model = AVNet(**conf)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2000)), None)
    ckpt = str(tmp_path / "best_model.ckpt")
    serialization.save_model(ckpt, "AVNet", conf, v)

    from rtfs_net_tpu.export import export_serving, save_serving

    exported = export_serving(model, v, 1, 2000, mouth_shape=None,
                              compute_dtype=jnp.float32)
    art = str(tmp_path / "model.rtfsx")
    save_serving(art, exported, 1, 2000, compute_dtype="float32")

    wav_path = str(tmp_path / "mix.wav")
    wavio.write(wav_path, rng.standard_normal(1500).astype(np.float32) * 0.1,
                16000)

    import separate as cli

    cli.main(argparse.Namespace(
        model=ckpt, input=wav_path, mouth=None, videonet_conf=None,
        output=str(tmp_path / "out_ckpt"), bucket_size=2000, bf16=False,
    ))
    cli.main(argparse.Namespace(
        model=art, input=wav_path, mouth=None, videonet_conf=None,
        output=str(tmp_path / "out_art"), bucket_size=4000, bf16=False,
    ))
    want, _ = wavio.read(str(tmp_path / "out_ckpt" / "mix_s1.wav"))
    got, sr = wavio.read(str(tmp_path / "out_art" / "mix_s1.wav"))
    assert sr == 16000 and got.shape[0] == 1500
    np.testing.assert_allclose(got, want, atol=1e-4)

    # over-length input without chunking is refused with the right hint
    long_path = str(tmp_path / "long.wav")
    wavio.write(long_path,
                rng.standard_normal(5000).astype(np.float32) * 0.1, 16000)
    import pytest

    with pytest.raises(SystemExit, match="chunk-seconds"):
        cli.main(argparse.Namespace(
            model=art, input=long_path, mouth=None, videonet_conf=None,
            output=str(tmp_path / "out_art2"), bucket_size=4000, bf16=False,
        ))


def test_split_merge_halved_roundtrip(rng):
    """merge(split(x)) doubles every sample (each lands in exactly two
    50%-overlap blocks after the stride padding); halving reconstructs
    exactly — the invariant the chunked CLI relies on."""
    from rtfs_net_tpu.utils.features import split_feature, merge_feature

    x = jnp.asarray(rng.standard_normal((1, 1, 5000)).astype(np.float32))
    blocks, rest = split_feature(x, 1600)
    back = merge_feature(blocks, rest) * 0.5
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-6)
