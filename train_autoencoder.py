#!/usr/bin/env python
"""Lip-autoencoder pretraining CLI (reference: ``train_autoencoder.py`` —
trains the conv autoencoder on mouth frames with MSE, exports the encoder
state as the AEVideoModel backbone)."""
import argparse
import json
import os

import numpy as np


class MouthFramesDataset:
    """Mouth-only dataset (reference AVSpeechDataModule,
    ``videomodels/autoencoder/datamodule.py``): loads npz mouth tracks,
    center-crops to 88x88, yields (1, T, 88, 88) clips."""

    def __init__(self, json_dir, segment_frames=50):
        from rtfs_net_tpu.datas.transform import get_preprocessing_pipelines

        with open(os.path.join(json_dir, "s1.json")) as f:
            infos = json.load(f)
        self.paths = [i[1] for i in infos if len(i) > 2]
        self.segment_frames = segment_frames
        self.pipeline = get_preprocessing_pipelines()["val"]

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, idx):
        frames = np.load(self.paths[idx])["data"]
        frames = self.pipeline(frames)[: self.segment_frames]
        return (frames[None].astype(np.float32),)


def main(args):
    import jax
    import jax.numpy as jnp
    import optax

    from rtfs_net_tpu.datas import DataLoader
    from rtfs_net_tpu.models.videomodels import AE
    from rtfs_net_tpu.system.tb_writer import TensorBoardLogger
    from flax import serialization as fser

    model = AE(in_channels=1, base_channels=args.base_channels,
               num_layers=args.num_layers)
    sample = jnp.zeros((1, 1, 88, 88))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), sample)["params"]
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    train_ds = MouthFramesDataset(args.train_dir)
    val_ds = MouthFramesDataset(args.valid_dir)
    train_loader = DataLoader(train_ds, args.batch_size, shuffle=True)
    val_loader = DataLoader(val_ds, args.batch_size)

    @jax.jit
    def train_step(params, opt_state, frames):
        # (B, 1, T, H, W) -> per-frame (B*T, 1, H, W)
        B, C, T, H, W = frames.shape
        x = jnp.swapaxes(frames, 1, 2).reshape(B * T, C, H, W)

        def loss_fn(p):
            recon = model.apply({"params": p}, x)
            return jnp.mean((recon - x) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    @jax.jit
    def val_step(params, frames):
        B, C, T, H, W = frames.shape
        x = jnp.swapaxes(frames, 1, 2).reshape(B * T, C, H, W)
        recon = model.apply({"params": params}, x)
        return jnp.mean((recon - x) ** 2)

    exp_dir = args.exp_dir
    os.makedirs(exp_dir, exist_ok=True)
    logger = TensorBoardLogger(os.path.join(exp_dir, "tb"), name="baseline")
    best = float("inf")
    best_k = {}
    for epoch in range(args.epochs):
        train_loader.set_epoch(epoch)
        losses = []
        for (frames,) in train_loader:
            params, opt_state, loss = train_step(params, opt_state,
                                                 jnp.asarray(frames))
            losses.append(float(loss))
        val_losses = [float(val_step(params, jnp.asarray(f)))
                      for (f,) in val_loader]
        vl = float(np.mean(val_losses)) if val_losses else float("nan")
        logger.add_scalar("train/loss", float(np.mean(losses)), epoch)
        logger.add_scalar("val/loss", vl, epoch)
        print(f"epoch {epoch}: train={np.mean(losses):.5f} val={vl:.5f}")
        best_k[f"epoch{epoch}"] = vl
        if vl < best:
            best = vl
            # export the ENCODER only (reference train_autoencoder.py:75)
            enc = {"params": params["encoder"]}
            with open(os.path.join(exp_dir, "best_model.ckpt"), "wb") as f:
                f.write(fser.msgpack_serialize(jax.device_get(enc)))
    with open(os.path.join(exp_dir, "best_k_models.json"), "w") as f:
        json.dump(best_k, f, indent=0)
    logger.finalize()
    print("Finished Training")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--train-dir", default="data_preprocess/LRS2/tr")
    parser.add_argument("--valid-dir", default="data_preprocess/LRS2/cv")
    parser.add_argument("--exp-dir", default="log/autoencoder")
    parser.add_argument("--epochs", type=int, default=200)
    parser.add_argument("--batch-size", type=int, default=40)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--base-channels", type=int, default=4)
    parser.add_argument("--num-layers", type=int, default=3)
    main(parser.parse_args())
