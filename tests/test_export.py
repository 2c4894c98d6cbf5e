"""AOT serving export: StableHLO artifact round-trip + CLI
(rtfs_net_tpu/export.py, scripts/export_serving.py).

The artifact contract: ``jax.export.deserialize(blob).call(mix, mouth)``
reproduces ``model.apply`` at the exported shapes (numerically — the
artifact is a separate XLA compilation, so fusion choices may differ at
the last ulp), with no model zoo / registry / config needed at load time.
"""
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rtfs_net_tpu.export import (export_serving, load_artifact, load_serving,
                                 save_serving, save_serving_multi)
from rtfs_net_tpu.models import AVNet
from rtfs_net_tpu.models.serialization import save_model

from tests.test_system import TINY_AUDIONET

B, L, SR = 2, 4000, 8000
EMB, TV = 16, 4


@pytest.fixture(scope="module")
def tiny_model():
    model = AVNet(**TINY_AUDIONET)
    rng = np.random.default_rng(0)
    mix = jnp.asarray(rng.standard_normal((1, L)).astype(np.float32))
    mouth = jnp.asarray(rng.standard_normal((1, EMB, TV)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), mix, mouth)
    return model, variables


def test_export_roundtrip_matches_apply(tiny_model, tmp_path):
    model, variables = tiny_model
    exported = export_serving(model, variables, B, L, mouth_shape=(EMB, TV),
                              compute_dtype=jnp.float32)
    path = str(tmp_path / "model.rtfsx")
    save_serving(path, exported, B, L, mouth_shape=(EMB, TV),
                 compute_dtype="float32")

    loaded, header = load_serving(path)
    assert header["batch_size"] == B
    assert header["mouth_shape"] == [EMB, TV]

    rng = np.random.default_rng(1)
    mix = jnp.asarray(rng.standard_normal((B, L)).astype(np.float32))
    mouth = jnp.asarray(rng.standard_normal((B, EMB, TV)).astype(np.float32))
    want = model.apply(variables, mix, mouth)
    got = loaded.call(mix, mouth)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-4)


def test_export_audio_only_convention(tiny_model, tmp_path):
    conf = {**TINY_AUDIONET, "video_params": {}, "fusion_params": {},
            "video_bn_params": {}, "pretrained_vout_chan": -1}
    model = AVNet(**conf)
    rng = np.random.default_rng(0)
    mix = jnp.asarray(rng.standard_normal((1, L)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), mix)
    exported = export_serving(model, variables, B, L, mouth_shape=None,
                              compute_dtype=jnp.float32)
    path = str(tmp_path / "audio.rtfsx")
    save_serving(path, exported, B, L, compute_dtype="float32")
    loaded, header = load_serving(path)
    assert header["mouth_shape"] is None
    mix = jnp.asarray(rng.standard_normal((B, L)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(loaded.call(mix)), np.asarray(model.apply(variables, mix)),
        atol=1e-5, rtol=1e-4)


def test_export_pins_shapes(tiny_model):
    model, variables = tiny_model
    exported = export_serving(model, variables, B, L, mouth_shape=(EMB, TV),
                              compute_dtype=jnp.float32)
    rng = np.random.default_rng(2)
    bad_mix = jnp.asarray(rng.standard_normal((B + 1, L)).astype(np.float32))
    mouth = jnp.asarray(rng.standard_normal((B + 1, EMB, TV)).astype(np.float32))
    with pytest.raises(Exception):
        exported.call(bad_mix, mouth)


def test_bucketed_artifact_serves_any_batch(tiny_model, tmp_path):
    """RTFSXPT2: pad/chunk dispatch over pinned-batch buckets is exact.

    Nothing in the model mixes the batch axis, so serving B=3 through a
    {1, 2}-bucket artifact (one padded B=2 call + one B=1 call, or two
    B=2 calls) must match per-row ``model.apply`` bit-for-bit modulo the
    separate-XLA-compilation ulp.
    """
    model, variables = tiny_model
    exports = {
        b: export_serving(model, variables, b, L, mouth_shape=(EMB, TV),
                          compute_dtype=jnp.float32)
        for b in (1, 2)
    }
    path = str(tmp_path / "multi.rtfsx")
    save_serving_multi(path, exports, L, mouth_shape=(EMB, TV),
                       compute_dtype="float32")

    art = load_artifact(path)
    assert art.batch_sizes == [1, 2]
    assert [b["batch_size"] for b in art.header["buckets"]] == [1, 2]

    rng = np.random.default_rng(4)
    for n in (1, 2, 3, 5):  # exact fit, pad, and chunk-over-largest cases
        mix = jnp.asarray(rng.standard_normal((n, L)).astype(np.float32))
        mouth = jnp.asarray(rng.standard_normal((n, EMB, TV)).astype(np.float32))
        want = model.apply(variables, mix, mouth)
        got = art(mix, mouth)
        assert got.shape == np.asarray(want).shape
        np.testing.assert_allclose(got, np.asarray(want), atol=1e-5, rtol=1e-4)


def test_mesh_sharded_artifact(tiny_model, tmp_path):
    """mesh_devices=8: the serving fn is shard_map-ped over the 1-D data
    mesh (batch sharded, weights replicated). Per-shard execution is the
    exact single-device program, so results must match model.apply; the
    loader rebuilds the mesh from the Exported's nr_devices."""
    model, variables = tiny_model
    n_dev = 8
    exports = {
        b: export_serving(model, variables, b, L, mouth_shape=(EMB, TV),
                          compute_dtype=jnp.float32, mesh_devices=n_dev)
        for b in (8, 16)
    }
    assert all(e.nr_devices == n_dev for e in exports.values())
    path = str(tmp_path / "mesh.rtfsx")
    save_serving_multi(path, exports, L, mouth_shape=(EMB, TV),
                       compute_dtype="float32")
    art = load_artifact(path)
    assert art.header["nr_devices"] == n_dev

    rng = np.random.default_rng(7)
    for n in (8, 11, 19):  # exact fit, pad, chunk-over-largest
        mix = jnp.asarray(rng.standard_normal((n, L)).astype(np.float32))
        mouth = jnp.asarray(rng.standard_normal((n, EMB, TV)).astype(np.float32))
        want = np.asarray(model.apply(variables, mix, mouth))
        got = art(mix, mouth)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


def test_mesh_export_requires_divisible_batch(tiny_model):
    model, variables = tiny_model
    with pytest.raises(AssertionError, match="shard evenly"):
        export_serving(model, variables, 9, L, mouth_shape=(EMB, TV),
                       compute_dtype=jnp.float32, mesh_devices=8)


def test_load_artifact_reads_single_bucket_format(tiny_model, tmp_path):
    model, variables = tiny_model
    exported = export_serving(model, variables, B, L, mouth_shape=(EMB, TV),
                              compute_dtype=jnp.float32)
    path = str(tmp_path / "single.rtfsx")
    save_serving(path, exported, B, L, mouth_shape=(EMB, TV),
                 compute_dtype="float32")
    art = load_artifact(path)
    assert art.batch_sizes == [B]
    rng = np.random.default_rng(5)
    mix = jnp.asarray(rng.standard_normal((1, L)).astype(np.float32))  # pads to B
    mouth = jnp.asarray(rng.standard_normal((1, EMB, TV)).astype(np.float32))
    np.testing.assert_allclose(
        art(mix, mouth), np.asarray(model.apply(variables, mix, mouth)),
        atol=1e-5, rtol=1e-4)


def test_export_cli_bucketed(tiny_model, tmp_path):
    model, variables = tiny_model
    ckpt = str(tmp_path / "exp" / "best_model.ckpt")
    save_model(ckpt, "AVNet", dict(TINY_AUDIONET), variables)

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import export_serving as cli

    out = cli.main(["--ckpt", ckpt, "--batch-sizes", "1,2",
                    "--segment", str(L / SR), "--sample-rate", str(SR),
                    "--mouth-shape", f"{EMB},{TV}", "--dtype", "float32"])
    art = load_artifact(out)
    assert art.batch_sizes == [1, 2]
    rng = np.random.default_rng(6)
    mix = jnp.asarray(rng.standard_normal((3, L)).astype(np.float32))
    mouth = jnp.asarray(rng.standard_normal((3, EMB, TV)).astype(np.float32))
    np.testing.assert_allclose(
        art(mix, mouth), np.asarray(model.apply(variables, mix, mouth)),
        atol=1e-5, rtol=1e-4)


def test_export_cli(tiny_model, tmp_path, monkeypatch):
    model, variables = tiny_model
    ckpt = str(tmp_path / "exp" / "best_model.ckpt")
    save_model(ckpt, "AVNet", dict(TINY_AUDIONET), variables)

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import export_serving as cli

    out = cli.main(["--ckpt", ckpt, "--batch-size", str(B),
                    "--segment", str(L / SR), "--sample-rate", str(SR),
                    "--mouth-shape", f"{EMB},{TV}", "--dtype", "float32"])
    assert os.path.exists(out)
    loaded, header = load_serving(out)
    assert header["model_name"] == "AVNet"
    rng = np.random.default_rng(3)
    mix = jnp.asarray(rng.standard_normal((B, L)).astype(np.float32))
    mouth = jnp.asarray(rng.standard_normal((B, EMB, TV)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(loaded.call(mix, mouth)),
        np.asarray(model.apply(variables, mix, mouth)),
        atol=1e-5, rtol=1e-4)
