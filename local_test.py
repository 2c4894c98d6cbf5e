#!/usr/bin/env python
"""Synthetic end-to-end smoke train (reference: ``local_test.py`` — the
de-facto integration test: a fake dataset of random tensors drives the
full build/train/checkpoint/export path for one epoch on one chip).

    python local_test.py [--conf-dir ...] [--check-only] [--epochs N]

``--check-only`` constructs the model and prints the params/MACs report,
then exits (reference ``local_test.py:64-65``).
"""
import argparse
import os
import time

import numpy as np
import yaml


class FakeAVSpeechDataset:
    """Random-tensor dataset with the reference's exact sample shapes
    (local_test.py:22-35): 2 s mixtures + (1, 50, 88, 88) mouths."""

    def __init__(self, n_items=8, sample_rate=16000, seconds=2, frames=50,
                 audio_only=False, seed=0):
        self.n = n_items
        self.L = sample_rate * seconds
        self.frames = frames
        self.audio_only = audio_only
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return self.n

    def __getitem__(self, idx):
        mix = self.rng.standard_normal(self.L).astype(np.float32)
        src = self.rng.standard_normal(self.L).astype(np.float32)
        if self.audio_only:
            return mix, src, f"utt{idx}"
        mouth = self.rng.standard_normal(
            (1, self.frames, 88, 88)).astype(np.float32)
        return mix, src, mouth, f"utt{idx}"


def main(args):
    from rtfs_net_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from rtfs_net_tpu.datas import DataLoader
    from rtfs_net_tpu.losses import PITLossWrapper, pairwise_neg_snr, pairwise_neg_sisdr
    from rtfs_net_tpu.models import build_model, videomodels
    from rtfs_net_tpu.system import System, Trainer, make_optimizer
    from rtfs_net_tpu.utils.flops import count_params

    with open(args.conf_dir) as f:
        conf = yaml.safe_load(f)

    t0 = time.time()
    model = build_model("AVNet", **conf["audionet"])
    mix = jnp.zeros((1, 32000))
    mouth_emb0 = jnp.zeros((1, conf["audionet"]["pretrained_vout_chan"], 50))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), mix, mouth_emb0)
    n_params = count_params(variables["params"])
    print(f"model built in {time.time() - t0:.1f}s: {n_params / 1e6:.3f} M params")

    if args.check_only:
        from rtfs_net_tpu.utils.flops import model_macs_report

        print(model_macs_report(model, variables, mix, mouth_emb0))
        return

    # frozen random video backbone (no pretrain in the smoke test);
    # variables ride in TrainState rather than being baked into the jit
    vmodel = videomodels.FRCNNVideoModel(backbone_type="resnet", relu_type="prelu")
    vvars = jax.jit(vmodel.init)(jax.random.PRNGKey(1), jnp.zeros((1, 1, 4, 88, 88)))

    system = System(
        model,
        make_optimizer(**conf["optim"]),
        {"train": PITLossWrapper(pairwise_neg_snr),
         "val": PITLossWrapper(pairwise_neg_sisdr)},
        video_model=vmodel,
        video_variables=vvars,
    )

    train_loader = DataLoader(FakeAVSpeechDataset(args.items), args.batch_size,
                              shuffle=True, num_workers=2)
    val_loader = DataLoader(FakeAVSpeechDataset(args.items // 2, seed=1),
                            args.batch_size, shuffle=False, num_workers=2)

    sample_mouth = jnp.zeros((1, 1, 50, 88, 88))
    state = system.init_state(jax.random.PRNGKey(0), mix, sample_mouth)

    exp_dir = args.exp_dir or os.path.join("log", "local_test")
    trainer = Trainer(system, exp_dir=exp_dir, epochs=args.epochs, config=conf,
                      sche_patience=conf["sche"]["patience"],
                      sche_factor=conf["sche"]["factor"])
    t1 = time.time()
    state = trainer.fit(state, train_loader, val_loader)
    print(f"trained {args.epochs} epoch(s) in {time.time() - t1:.1f}s")
    best = trainer.export_best(state, "AVNet", conf["audionet"])
    print(f"exported {best}")

    # reload + run the exported model (the reference's serialize round trip)
    from rtfs_net_tpu.models import serialization

    model2, v2, _ = serialization.load_model(best)
    out = jax.jit(lambda v, m, e: model2.apply(v, m, e))(v2, mix, mouth_emb0)
    print(f"reloaded best model forward: {out.shape}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--conf-dir",
                        default="rtfs_net_tpu/configs/lrs2_RTFSNet_4_layer.yaml")
    parser.add_argument("--check-only", action="store_true")
    parser.add_argument("--epochs", type=int, default=1)
    parser.add_argument("--items", type=int, default=8)
    parser.add_argument("--batch-size", type=int, default=2)
    parser.add_argument("--exp-dir", default=None)
    main(parser.parse_args())
