#!/usr/bin/env python
"""Training CLI (reference: ``train.py``).

    python train.py --conf-dir rtfs_net_tpu/configs/lrs2_RTFSNet_4_layer.yaml
                    [--checkpoint <ckpt-name>]

Builds loaders/model/optimizer from the YAML config (every leaf
CLI-overridable), trains data-parallel over all local TPU chips, exports
the best model. Instead of the reference's GPU busy-wait + Lightning DDP
launch (train.py:62-68,135-148), device placement is one jitted program
over the local mesh.
"""
import argparse
import os

import yaml

from rtfs_net_tpu.utils import prepare_parser_from_dict, parse_args_as_dict


def build_dataloaders(conf):
    from rtfs_net_tpu.datas import AVSpeechDataset, DataLoader

    audio_only = conf["main_args"].get("audio_only", False)
    train_set = AVSpeechDataset(
        json_dir=conf["data"]["train_dir"],
        n_src=conf["data"]["nondefault_nsrc"],
        sample_rate=conf["data"]["sample_rate"],
        segment=conf["data"]["segment"],
        normalize_audio=conf["data"]["normalize_audio"],
        audio_only=audio_only,
    )
    val_set = AVSpeechDataset(
        json_dir=conf["data"]["valid_dir"],
        n_src=conf["data"]["nondefault_nsrc"],
        sample_rate=conf["data"]["sample_rate"],
        segment=conf["data"]["segment"],
        normalize_audio=conf["data"]["normalize_audio"],
        audio_only=audio_only,
    )
    train_loader = DataLoader(
        train_set, batch_size=conf["training"]["batch_size"], shuffle=True,
        num_workers=conf["training"]["num_workers"], drop_last=True,
    )
    val_loader = DataLoader(
        val_set, batch_size=conf["training"]["batch_size"], shuffle=False,
        num_workers=conf["training"]["num_workers"], drop_last=True,
    )
    return train_loader, val_loader


def build_video_model(conf):
    """Construct the pretrained video backbone. Returns
    (model, variables, n_params); (None, None, 0) for audio-only runs.
    The variables ride in TrainState (not baked into the jitted step) so
    ``train_video_model=True`` can update them and compiles stay small."""
    import jax
    import jax.numpy as jnp
    from rtfs_net_tpu.models import videomodels

    videonet = conf.get("videonet") or {}
    name = videonet.get("model_name")
    if not name or conf["main_args"].get("audio_only", False):
        return None, None, 0
    cls = videomodels.get(name)
    model = cls(**{k: v for k, v in videonet.items()
                   if k in {f.name for f in __import__("dataclasses").fields(cls)}})
    sample = jnp.zeros((1, 1, 4, 88, 88))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), sample)
    pretrain = videonet.get("pretrain")
    if pretrain and os.path.exists(pretrain):
        from rtfs_net_tpu.utils.torch_convert import load_video_backbone

        variables = load_video_backbone(pretrain, variables)
        print(f"loaded pretrained video backbone from {pretrain}")
    elif pretrain:
        print(f"WARNING: pretrain path {pretrain} not found; using random "
              "(frozen) video backbone weights")

    n = sum(int(x.size) for x in jax.tree.leaves(variables["params"]))
    return model, variables, n


def main(conf):
    from rtfs_net_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from rtfs_net_tpu.models import build_model
    from rtfs_net_tpu.losses import PITLossWrapper, pairwise_neg_snr, pairwise_neg_sisdr
    from rtfs_net_tpu.system import System, Trainer, make_optimizer

    train_loader, val_loader = build_dataloaders(conf)

    video_model, video_vars, v_params = build_video_model(conf)
    model = build_model("AVNet", **conf["audionet"])
    optimizer = make_optimizer(**conf["optim"])

    exp_dir = os.path.join(conf["log"]["path"], conf["log"]["exp_name"])
    os.makedirs(exp_dir, exist_ok=True)
    with open(os.path.join(exp_dir, "conf.yaml"), "w") as f:
        yaml.safe_dump(conf, f, default_flow_style=None)

    loss_func = {
        "train": PITLossWrapper(pairwise_neg_snr, pit_from="pw_mtx"),
        "val": PITLossWrapper(pairwise_neg_sisdr, pit_from="pw_mtx"),
    }
    system = System(model, optimizer, loss_func, video_model=video_model,
                    video_variables=video_vars,
                    train_video_model=conf["main_args"].get("train_video_model", False),
                    accum_steps=int(conf["training"].get("accum_steps")
                                    or conf["main_args"].get("accum_steps") or 1),
                    online_mix=bool(conf["training"].get("online_mix", False)
                                    and video_model is None))

    # init from one sample batch
    sample = next(iter(val_loader))
    mix = jnp.asarray(sample[0][:1])
    mouth = None
    if len(sample) > 2 and isinstance(sample[2], np.ndarray):
        mouth = jnp.asarray(sample[2][:1])
    state = system.init_state(jax.random.PRNGKey(0), mix, mouth)

    trainer = Trainer(
        system,
        exp_dir=exp_dir,
        epochs=conf["training"]["epochs"],
        config=conf,
        half_lr=conf["training"]["half_lr"],
        sche_patience=conf["sche"]["patience"],
        sche_factor=conf["sche"]["factor"],
        divide_lr_by=conf["training"]["divide_lr_by"],
        early_stop=conf["training"]["early_stop"],
    )
    state = trainer.resume(state, conf["main_args"].get("checkpoint"))
    state = trainer.fit(state, train_loader, val_loader)
    best_path = trainer.export_best(state, "AVNet", conf["audionet"])
    print(f"exported {best_path}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--conf-dir", default="rtfs_net_tpu/configs/lrs2_RTFSNet_4_layer.yaml",
                        help="Full path to the YAML config")
    parser.add_argument("--checkpoint", default=None,
                        help="Checkpoint name to resume from")
    parser.add_argument("--audio-only", dest="audio_only", default=False,
                        type=bool, help="Train without the video branch")
    parser.add_argument("--train-video-model", dest="train_video_model",
                        default=False, type=bool,
                        help="Unfreeze and train the video backbone "
                             "(BN stats stay frozen, matching the reference)")
    parser.add_argument("--accum-steps", dest="accum_steps", default=1,
                        type=int,
                        help="Microbatch gradient-accumulation factor: the "
                             "per-chip batch runs as this many sequential "
                             "microbatches inside one step (trades step "
                             "latency for peak HBM)")
    args, _ = parser.parse_known_args()
    with open(args.conf_dir) as f:
        def_conf = yaml.safe_load(f)
    parser = prepare_parser_from_dict(def_conf, parser=parser)
    conf = parse_args_as_dict(parser, return_plain_args=False)
    main(conf)
