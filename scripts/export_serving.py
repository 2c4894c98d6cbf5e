#!/usr/bin/env python
"""Export a trained model to a self-contained AOT serving artifact.

    python scripts/export_serving.py --ckpt exp/.../best_model.ckpt \
        --out model.rtfsx --batch-size 128 --segment 2.0

The artifact is versioned StableHLO with the weights baked in
(rtfs_net_tpu/export.py): a serving fleet loads it with
``jax.export.deserialize`` — no model zoo, no configs, no registry.
The reference's deployment story is best_model.pth + the importable
class zoo (base_av_model.py:24-51); this is the TPU-native equivalent.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", required=True, help="best_model.ckpt (msgpack)")
    p.add_argument("--out", default=None, help="output path (default: <ckpt dir>/model.rtfsx)")
    p.add_argument("--batch-size", type=int, default=128,
                   help="serving batch (128 = measured v5e optimum)")
    p.add_argument("--batch-sizes", default=None,
                   help="comma list (e.g. 1,8,32,128) -> bucketed RTFSXPT2 "
                        "artifact serving ANY request batch via pad/chunk "
                        "dispatch (rtfs_net_tpu.export.load_artifact)")
    p.add_argument("--segment", type=float, default=2.0, help="utterance seconds")
    p.add_argument("--sample-rate", type=int, default=16000)
    p.add_argument("--fps", type=int, default=25, help="video fps for the mouth track")
    p.add_argument("--audio-only", action="store_true",
                   help="export the f(mix) convention (no mouth input)")
    p.add_argument("--mouth-shape", default=None,
                   help="override per-utterance mouth-embedding shape, e.g. 512,50")
    p.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    p.add_argument("--platforms", default=None,
                   help="comma list (e.g. tpu,cpu); default: current backend")
    p.add_argument("--mesh-devices", type=int, default=1,
                   help="export a multi-chip artifact: batch shard_map-ped "
                        "over a 1-D data mesh of N devices (weights "
                        "replicated); every batch size must divide by N and "
                        "serving requires N devices visible")
    args = p.parse_args(argv)

    from rtfs_net_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from rtfs_net_tpu.export import export_serving, save_serving
    from rtfs_net_tpu.models.serialization import load_model

    model, variables, header = load_model(args.ckpt)
    segment_samples = int(args.segment * args.sample_rate)

    mouth_shape = None
    if not args.audio_only:
        if args.mouth_shape:
            mouth_shape = tuple(int(v) for v in args.mouth_shape.split(","))
        else:
            vout = getattr(model, "pretrained_vout_chan", -1)
            if vout and vout > 0:
                mouth_shape = (vout, int(args.segment * args.fps))
    platforms = args.platforms.split(",") if args.platforms else None

    extra = {"model_name": header.get("model_name", "AVNet"),
             "sample_rate": args.sample_rate}
    out = args.out or os.path.join(os.path.dirname(os.path.abspath(args.ckpt)),
                                   "model.rtfsx")
    if args.batch_sizes:
        from rtfs_net_tpu.export import save_serving_multi

        sizes = sorted({int(v) for v in args.batch_sizes.split(",")})
        exports = {
            b: export_serving(model, variables, b, segment_samples,
                              mouth_shape=mouth_shape, compute_dtype=args.dtype,
                              platforms=platforms,
                              mesh_devices=args.mesh_devices)
            for b in sizes
        }
        save_serving_multi(out, exports, segment_samples,
                           mouth_shape=mouth_shape, compute_dtype=args.dtype,
                           extra=extra)
        plats = list(exports[sizes[0]].platforms)
        batches = sizes
    else:
        exported = export_serving(
            model, variables, args.batch_size, segment_samples,
            mouth_shape=mouth_shape, compute_dtype=args.dtype,
            platforms=platforms, mesh_devices=args.mesh_devices,
        )
        save_serving(out, exported, args.batch_size, segment_samples,
                     mouth_shape=mouth_shape, compute_dtype=args.dtype,
                     extra=extra)
        plats = list(exported.platforms)
        batches = [args.batch_size]
    size = os.path.getsize(out)
    print(f"exported {out} ({size/1e6:.1f} MB, platforms={plats}, "
          f"B={batches}, L={segment_samples}, mouth={mouth_shape}, "
          f"{args.dtype})")
    return out


if __name__ == "__main__":
    main()
