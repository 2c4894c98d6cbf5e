#!/usr/bin/env python
"""One-command ingestion of a published reference checkpoint.

    python scripts/import_checkpoint.py --pth best_model.pth \
        --conf rtfs_net_tpu/configs/lrs2_RTFSNet_4_layer.yaml \
        --exp-dir exp/imported_lrs2_rtfs4

Reads the reference's serialized ``best_model.pth`` schema
``{model_name, state_dict, model_args, infos}`` (reference
``src/models/TDAVNet/base_av_model.py:36-51``; also accepts a raw
state_dict or a Lightning ckpt whose keys carry the ``audio_model.``
prefix, like ``load_state_dict_in``, base_av_model.py:13-22), converts the
weights with ``utils.avnet_convert``, and writes a ready-to-eval
experiment directory:

    <exp-dir>/best_model.ckpt   converted model (msgpack, registry-rebuildable)
    <exp-dir>/conf.yaml         the supplied config (the blob's model_args is
                                the reference's reflective get_config() dict,
                                not constructor kwargs — the conf's audionet
                                provides those, like reference test.py:39)

so the standard eval CLI runs on it directly:

    python test.py --conf-dir <exp-dir>/conf.yaml --test-dir <manifests>

The video backbone needs no conversion step here: ``test.py`` rebuilds it
from ``conf["videonet"]`` and converts its ``.pth.tar`` on load (reference
``test.py:41-42`` does the same fresh-pretrain rebuild).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def import_checkpoint(pth_path: str, conf: dict, exp_dir: str) -> str:
    """Convert ``pth_path`` into ``<exp_dir>/best_model.ckpt`` (+conf.yaml).

    Returns the ckpt path. ``conf`` must carry an ``audionet`` section with
    the model's constructor kwargs (the reference contract:
    ``AVNet.from_pretrain(path, **conf["audionet"])``, reference test.py:39).
    """
    import torch
    import yaml

    import jax
    import jax.numpy as jnp

    from rtfs_net_tpu.models import build_model, serialization
    from rtfs_net_tpu.utils.avnet_convert import convert_avnet

    blob = torch.load(pth_path, map_location="cpu", weights_only=False)
    model_args = None
    model_name = "AVNet"
    if isinstance(blob, dict) and "state_dict" in blob:
        sd = blob["state_dict"]
        model_args = blob.get("model_args")
        model_name = blob.get("model_name", model_name)
    else:
        sd = blob
    sd = {k.split("audio_model.")[-1]: v.detach().cpu().numpy()
          for k, v in sd.items() if hasattr(v, "detach")}

    # The published schema's model_args is the REFLECTIVE get_config() dict
    # (sections keyed encoder/audio_bottleneck/... — reference
    # base_av_model.py:36-41, tdavnet.py:100-108), NOT constructor kwargs;
    # the reference's own from_pretrain takes kwargs from conf.yaml
    # (reference test.py:39). Mirror that: constructor args come from the
    # conf, and blob model_args only wins if it actually holds kwargs.
    if model_args and "enc_dec_params" in model_args:
        audionet = dict(model_args)
    else:
        audionet = dict(conf["audionet"])

    model = build_model("AVNet", **audionet)
    sr = int(conf.get("data", {}).get("sample_rate", 16000))
    mix = jnp.zeros((1, 2 * sr))
    mouth_emb = None
    if audionet.get("video_params"):
        vout = int(audionet.get("pretrained_vout_chan", 512))
        mouth_emb = jnp.zeros((1, vout, 50))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), mix, mouth_emb)

    converted = convert_avnet(sd, variables, audionet)

    os.makedirs(exp_dir, exist_ok=True)
    ckpt_path = os.path.join(exp_dir, "best_model.ckpt")
    # save under the name of the class we actually built/converted — the
    # blob's model_name (e.g. a legacy alias) may not exist in our
    # registry, and load_model must be able to rebuild from this header
    serialization.save_model(ckpt_path, "AVNet", audionet, converted)

    out_conf = dict(conf)
    out_conf["audionet"] = audionet
    out_conf["imported_from"] = {"pth": os.path.abspath(pth_path),
                                 "blob_model_name": model_name}
    with open(os.path.join(exp_dir, "conf.yaml"), "w") as f:
        yaml.safe_dump(out_conf, f)
    return ckpt_path


def main(argv=None):
    import yaml

    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--pth", required=True,
                   help="reference best_model.pth (or Lightning ckpt)")
    p.add_argument("--conf", required=True,
                   help="config YAML supplying data/training/log sections; "
                        "its audionet section provides the constructor "
                        "kwargs (published blobs carry the reflective "
                        "get_config() dict, not kwargs — reference "
                        "test.py:39 reads them from conf.yaml too)")
    p.add_argument("--exp-dir", required=True,
                   help="output experiment directory")
    args = p.parse_args(argv)

    with open(args.conf) as f:
        conf = yaml.safe_load(f)
    ckpt = import_checkpoint(args.pth, conf, args.exp_dir)
    print(f"wrote {ckpt}")
    print(f"evaluate with: python test.py --conf-dir "
          f"{os.path.join(args.exp_dir, 'conf.yaml')} --test-dir <manifests>")


if __name__ == "__main__":
    main()
