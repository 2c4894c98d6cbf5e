"""Rehearse the published-checkpoint ingestion pipeline end-to-end.

The reference's deployment contract is ``best_model.pth`` in the serialize
schema ``{model_name, state_dict, model_args, infos}`` (reference
``base_av_model.py:36-51``) evaluated via ``from_pretrain`` + ``test.py``.
Here: a reference-source AVNet is serialized with the reference's OWN
``serialize()``, ``torch.save``d, ingested by ``scripts/import_checkpoint.py``
into an experiment dir, and the resulting ``best_model.ckpt`` is (a) proven
bitwise-identical to the in-memory ``convert_avnet`` result and
forward-parity-checked against the torch model, then (b) evaluated through
the real ``test.py`` CLI (batched bucketed eval with a video model) to a
``metrics.csv``. (a)'s bitwise equality is what makes (b)'s SI-SNR "match
the in-memory converted model" — same weights, same engine.
"""
import importlib.util
import json
import os
import sys

import numpy as np
import pytest
import yaml

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from rtfs_net_tpu.datas import wavio
from rtfs_net_tpu.models import AVNet, serialization
from rtfs_net_tpu.utils.avnet_convert import convert_avnet

from _refsrc import REF_MODELS
from test_reference_parity import tiny_conf, _build_ref_avnet

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_MODELS), reason="/root/reference not mounted")


def _load_import_cli():
    here = os.path.dirname(__file__)
    path = os.path.join(here, "..", "scripts", "import_checkpoint.py")
    spec = importlib.util.spec_from_file_location("import_checkpoint", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _reference_pth(audionet_conf, pth_path):
    """Serialize a reference-source AVNet with the reference's own
    serialize() into the published file format."""
    ref_model = _build_ref_avnet(audionet_conf).eval()
    blob = ref_model.serialize()
    assert set(blob) == {"model_name", "state_dict", "model_args", "infos"}
    torch.save(blob, pth_path)
    return ref_model


def _full_conf(audionet_conf, data_root, log_root, videonet=None):
    return {
        "videonet": videonet or {"model_name": None},
        "audionet": audionet_conf,
        "training": {"gpus": [0], "epochs": 1, "batch_size": 2,
                     "num_workers": 0, "half_lr": True, "early_stop": True,
                     "divide_lr_by": None, "online_mix": False},
        "optim": {"optimizer": "adamw", "lr": 0.001, "weight_decay": 0.1},
        "sche": {"patience": 10, "factor": 0.5},
        "data": {"train_dir": str(data_root), "valid_dir": str(data_root),
                 "nondefault_nsrc": 1, "sample_rate": 16000,
                 "segment": 2.0, "normalize_audio": False},
        "log": {"path": str(log_root), "pro_name": "p",
                "exp_name": "imported"},
    }


def test_pth_file_roundtrip_and_parity(tmp_path):
    """pth FILE -> import CLI -> ckpt == in-memory convert_avnet, and the
    loaded model matches the reference torch forward."""
    rng = np.random.default_rng(7)
    conf_audionet = tiny_conf()
    pth = str(tmp_path / "best_model.pth")
    ref_model = _reference_pth(conf_audionet, pth)

    conf = _full_conf(conf_audionet, tmp_path, tmp_path / "log")
    conf_path = tmp_path / "conf.yaml"
    with open(conf_path, "w") as f:
        yaml.safe_dump(conf, f)

    exp_dir = str(tmp_path / "exp")
    ic = _load_import_cli()
    ic.main(["--pth", pth, "--conf", str(conf_path), "--exp-dir", exp_dir])

    assert os.path.exists(os.path.join(exp_dir, "best_model.ckpt"))
    assert os.path.exists(os.path.join(exp_dir, "conf.yaml"))

    model, loaded, header = serialization.load_model(
        os.path.join(exp_dir, "best_model.ckpt"))
    assert header["model_name"] == "AVNet"
    assert header["model_args"]["enc_dec_params"] == conf_audionet["enc_dec_params"]

    # bitwise: the ckpt written by the CLI IS the in-memory conversion
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    variables = AVNet(**conf_audionet).init(
        jax.random.PRNGKey(3), jnp.zeros((1, 4000)),
        jnp.zeros((1, conf_audionet["pretrained_vout_chan"], 13)))
    converted = convert_avnet(sd, variables, conf_audionet)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        loaded, converted)

    # forward parity vs the torch model the blob came from
    mix = rng.standard_normal((1, 4000)).astype(np.float32)
    mouth = rng.standard_normal(
        (1, conf_audionet["pretrained_vout_chan"], 13)).astype(np.float32)
    with torch.no_grad():
        golden = ref_model(torch.from_numpy(mix), torch.from_numpy(mouth)).numpy()
    out = np.asarray(model.apply(loaded, jnp.asarray(mix), jnp.asarray(mouth)))
    scale = float(np.abs(golden).max()) or 1.0
    np.testing.assert_allclose(out, golden, atol=1e-3 * scale)


def test_import_then_test_cli_eval(tmp_path):
    """Full rehearsal: pth -> import CLI -> test.py batched eval with a
    registry video model -> metrics.csv / results.csv / wav examples."""
    rng = np.random.default_rng(11)

    # video model from the registry (what test.py rebuilds from conf —
    # reference test.py:41-42); its output width becomes the AVNet's
    # pretrained_vout_chan
    from rtfs_net_tpu.models import videomodels

    vmodel = videomodels.get("AEVideoModel")()
    vout = int(vmodel.apply(
        vmodel.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 2, 88, 88))),
        jnp.zeros((1, 1, 2, 88, 88))).shape[1])

    conf_audionet = tiny_conf()
    conf_audionet["pretrained_vout_chan"] = vout
    conf_audionet["video_bn_params"] = {"out_chan": 16, "kernel_size": 1}

    pth = str(tmp_path / "best_model.pth")
    _reference_pth(conf_audionet, pth)

    # synthetic test manifests: 1 s wavs + 25 fps mouth npz
    data_root = tmp_path / "tt"
    data_root.mkdir()
    L, TV, n = 16000, 25, 3
    mix, s1, s2 = [], [], []
    for i in range(n):
        paths = []
        for name in ("mix", "s1", "s2"):
            p = str(data_root / f"{name}_{i}.wav")
            wavio.write(p, rng.standard_normal(L).astype(np.float32) * 0.1, 16000)
            paths.append(p)
        mouths = []
        for name in ("m1", "m2"):
            mp = str(data_root / f"{name}_{i}.npz")
            np.savez_compressed(
                mp, data=(rng.random((TV, 96, 96)) * 255).astype(np.uint8))
            mouths.append(mp)
        mix.append([paths[0], L])
        s1.append([paths[1], mouths[0], L])
        s2.append([paths[2], mouths[1], L])
    for name, data in (("mix", mix), ("s1", s1), ("s2", s2)):
        with open(data_root / f"{name}.json", "w") as f:
            json.dump(data, f)

    videonet = {"model_name": "AEVideoModel"}
    conf = _full_conf(conf_audionet, data_root, tmp_path / "log", videonet)
    conf_path = tmp_path / "conf.yaml"
    with open(conf_path, "w") as f:
        yaml.safe_dump(conf, f)

    exp_dir = str(tmp_path / "exp")
    ic = _load_import_cli()
    ic.main(["--pth", pth, "--conf", str(conf_path), "--exp-dir", exp_dir])

    import importlib

    test_cli = importlib.import_module("test")
    with open(os.path.join(exp_dir, "conf.yaml")) as f:
        econf = yaml.safe_load(f)
    econf["main_args"] = {"conf_dir": os.path.join(exp_dir, "conf.yaml"),
                          "test_dir": str(data_root), "exp_dir": exp_dir,
                          "n_save_ex": 1, "bucket_size": 16000}
    test_cli.main(econf)

    res_dir = os.path.join(exp_dir, "results_new")
    assert os.path.exists(os.path.join(res_dir, "results.csv"))
    with open(os.path.join(res_dir, "metrics.csv")) as f:
        rows = f.read().strip().splitlines()
    # header + one row per utterance (n_src=1 duplicates each mixture per
    # speaker: 3 files x 2 speakers)
    assert len(rows) >= 1 + 2 * n
    header = rows[0].split(",")
    si_col = header.index("si-snr")
    vals = [float(r.split(",")[si_col]) for r in rows[1:1 + 2 * n]]
    assert all(np.isfinite(v) for v in vals)
    assert os.path.exists(os.path.join(res_dir, "examples", "0_est.wav"))
