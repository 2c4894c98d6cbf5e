#!/usr/bin/env python
"""Standalone separation CLI (reference equivalence: the ``separate()``
inference helper, ``src/utils/separator.py:22-68``, as a user-facing tool).

    python separate.py --model <exp_dir>/best_model.ckpt \\
        --input mix.wav [--mouth mouth.npz] [--output out_dir/] \\
        [--videonet-conf conf.yaml] [--bf16]

Loads an exported model, separates one wav (optionally conditioned on a
mouth-ROI npz through the frozen video backbone), rescales output energy
to the input's and writes ``<stem>_s{i}.wav``.

``--model`` also accepts an AOT serving artifact (``model.rtfsx`` from
``scripts/export_serving.py``): inputs pad to the artifact's exported
segment length, and no model zoo/config is touched at run time.
"""
import argparse
import os

import numpy as np


def main(args):
    import jax
    import jax.numpy as jnp
    import yaml

    from rtfs_net_tpu.datas import wavio
    from rtfs_net_tpu.datas.transform import get_preprocessing_pipelines
    from rtfs_net_tpu.models import serialization
    from rtfs_net_tpu.utils.separator import separate

    artifact = None
    if args.model.endswith(".rtfsx"):
        # AOT serving artifact: pinned shapes, weights baked in — no model
        # zoo / config needed. Inputs pad to the exported segment length.
        from rtfs_net_tpu.export import load_artifact

        artifact = load_artifact(args.model)
        model = variables = None
    else:
        model, variables, header = serialization.load_model(args.model)
    wav, sr = wavio.read(args.input)
    L = wav.shape[-1]
    if artifact is not None:
        bucket = int(artifact.header["segment_samples"])
        if L > bucket and not getattr(args, "chunk_seconds", 0):
            raise SystemExit(
                f"input ({L} samples) exceeds the artifact's exported "
                f"segment ({bucket}); use --chunk-seconds for long-form")
    else:
        bucket = max(1, args.bucket_size)
    pad_L = -(-L // bucket) * bucket
    mix = jnp.asarray(np.pad(wav, (0, pad_L - L))[None])

    mouth_emb = None
    if args.mouth:
        frames = np.load(args.mouth)["data"]
        frames = get_preprocessing_pipelines()["val"](frames).astype(np.float32)
        videonet = {}
        if args.videonet_conf:
            with open(args.videonet_conf) as f:
                videonet = (yaml.safe_load(f) or {}).get("videonet", {})
        if videonet.get("model_name"):
            import dataclasses
            from rtfs_net_tpu.models import videomodels
            from rtfs_net_tpu.utils.torch_convert import load_video_backbone

            cls = videomodels.get(videonet["model_name"])
            fields = {f.name for f in dataclasses.fields(cls)}
            vmodel = cls(**{k: v for k, v in videonet.items() if k in fields})
            vvars = jax.jit(vmodel.init)(jax.random.PRNGKey(0),
                                         jnp.zeros((1, 1, 4, 88, 88)))
            pretrain = videonet.get("pretrain")
            if pretrain and os.path.exists(pretrain):
                vvars = load_video_backbone(pretrain, vvars)
            mouth_emb = vmodel.apply(vvars, jnp.asarray(frames[None, None]))
        else:
            raise SystemExit("--mouth given but no videonet config; pass "
                             "--videonet-conf with a videonet: block")

    if artifact is not None:
        mouth_shape = artifact.header.get("mouth_shape")
        if (mouth_emb is None) != (mouth_shape is None):
            raise SystemExit(
                "artifact calling convention is "
                f"{artifact.header['calling_convention']!r} but "
                f"{'no ' if mouth_emb is None else ''}mouth input was given")
        if mouth_emb is not None:
            tv = int(mouth_shape[-1])
            cur = mouth_emb.shape[-1]
            if cur > tv:
                raise SystemExit(f"mouth track ({cur} frames) exceeds the "
                                 f"artifact's exported {tv}")
            if cur < tv:
                mouth_emb = jnp.pad(mouth_emb,
                                    ((0, 0), (0, 0), (0, tv - cur)))
            mouth_emb = np.asarray(mouth_emb, np.float32)

        def fwd(_v, m, e):
            m = np.asarray(m, np.float32)
            out = artifact(m) if e is None else artifact(m, e)
            return jnp.asarray(out)
    else:
        dtype = jnp.bfloat16 if args.bf16 else jnp.float32
        from rtfs_net_tpu.models import for_inference

        model = for_inference(model)
        fwd = jax.jit(lambda v, m, e: model.apply(
            v, m.astype(dtype), None if e is None else e.astype(dtype)
        ).astype(jnp.float32))

    chunk = getattr(args, "chunk_seconds", 0) or 0
    if chunk > 0:
        # streaming/long-form mode: 50%-overlap chunks via the reference's
        # split/merge utilities (src/models/utils/utils.py:25-55), all
        # chunks separated as ONE batch, halved overlap-add reconstruction
        # (every sample lands in exactly two blocks)
        if mouth_emb is not None:
            raise SystemExit("--chunk-seconds currently supports "
                             "audio-only models (mouth conditioning spans "
                             "the full utterance)")
        from rtfs_net_tpu.utils.features import split_feature, merge_feature

        block = int(chunk * sr)
        if artifact is not None and block != bucket:
            raise SystemExit(
                f"--chunk-seconds must match the artifact's exported "
                f"segment: {bucket / sr:g} s ({bucket} samples)")
        raw = jnp.asarray(wav[None])  # chunking does its own padding
        blocks, rest = split_feature(raw[:, None, :], block)  # (1,1,block,n)
        n = blocks.shape[-1]
        batch = jnp.moveaxis(blocks[0, 0], -1, 0)  # (n, block)
        est_b = separate(lambda m: fwd(variables, m, None), batch)  # (n, n_src, block)
        stacked = jnp.moveaxis(est_b, 0, -1)[None]  # (1, n_src, block, n)
        merged = merge_feature(stacked, rest) * 0.5
        est = np.asarray(merged)[0][:, :L]
    else:
        est = separate(lambda m: fwd(variables, m, mouth_emb), mix)
        est = np.asarray(est)[0][:, :L]  # (n_src, L)

    out_dir = args.output or os.path.dirname(os.path.abspath(args.input))
    os.makedirs(out_dir, exist_ok=True)
    stem = os.path.splitext(os.path.basename(args.input))[0]
    for i in range(est.shape[0]):
        path = os.path.join(out_dir, f"{stem}_s{i + 1}.wav")
        wavio.write(path, est[i], sr)
        print(f"wrote {path}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True,
                   help="best_model.ckpt path, or a .rtfsx serving artifact")
    p.add_argument("--input", required=True, help="mixture wav")
    p.add_argument("--mouth", default=None, help="mouth-ROI npz of the target speaker")
    p.add_argument("--videonet-conf", default=None,
                   help="YAML with a videonet: block (e.g. the experiment conf.yaml)")
    p.add_argument("--output", default=None, help="output dir")
    p.add_argument("--bucket-size", type=int, default=4000)
    p.add_argument("--chunk-seconds", type=float, default=0,
                   help="long-form mode: separate 50%%-overlap chunks of "
                        "this length as one batch and overlap-add "
                        "(audio-only models)")
    p.add_argument("--bf16", action="store_true", help="serving precision")
    main(p.parse_args())
