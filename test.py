#!/usr/bin/env python
"""Evaluation CLI (reference: ``test.py``).

    python test.py --conf-dir <exp_dir>/conf.yaml --test-dir <manifest_dir>

Loads ``best_model.ckpt`` from the experiment dir (rebuilt via the model
registry from the embedded args — the reference instead re-imports a code
snapshot, test.py:33-36; here the model is config-reconstructable so the
embedded ``model_args`` ARE the snapshot), runs the full test set, streams
per-utterance SI-SNRi/SDRi/PESQ/STOI to ``metrics.csv``, writes summary
``results.csv`` and wav examples.

Variable-length eval under XLA static shapes: utterances are bucketed by
padded length (multiples of ``--bucket-size`` samples) so each bucket
compiles once; metrics are computed on the unpadded samples. Zero padding
slightly shifts the gLN global statistics, so smaller buckets are more
faithful (default 4000 = 0.25 s granularity; ``--bucket-size 1`` gives
exact-length eval at the cost of one compile per distinct length;
``tests/test_variable_length_eval.py`` bounds the SI-SNR delta).

Batched + multi-chip: utterances in the same bucket run as batches of
``--eval-batch-size`` (default training batch x2, the reference's eval
loader setting — reference test.py:127-141) sharded over the local device
mesh; per-utterance metrics stay unpadded and identical to the serial
loop (``tests/test_batched_eval.py``).
"""
import argparse
import os

import numpy as np
import yaml


def main(conf):
    from rtfs_net_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from rtfs_net_tpu.datas import AVSpeechDataset, wavio
    from rtfs_net_tpu.losses import PITLossWrapper, pairwise_neg_sisdr
    from rtfs_net_tpu.metrics import ALLMetricsTracker
    from rtfs_net_tpu.models import serialization
    from rtfs_net_tpu.utils.flops import count_params

    exp_dir = conf["main_args"].get("exp_dir") or os.path.dirname(
        conf["main_args"]["conf_dir"]
    )
    model_path = os.path.join(exp_dir, "best_model.ckpt")
    model, variables, header = serialization.load_model(model_path)

    videonet = conf.get("videonet") or {}
    video_apply = None
    if videonet.get("model_name"):
        import dataclasses
        from rtfs_net_tpu.models import videomodels

        cls = videomodels.get(videonet["model_name"])
        fields = {f.name for f in dataclasses.fields(cls)}
        vmodel = cls(**{k: v for k, v in videonet.items() if k in fields})
        vvars = jax.jit(vmodel.init)(jax.random.PRNGKey(0),
                                     jnp.zeros((1, 1, 4, 88, 88)))
        pretrain = videonet.get("pretrain")
        if pretrain and os.path.exists(pretrain):
            from rtfs_net_tpu.utils.torch_convert import load_video_backbone

            vvars = load_video_backbone(pretrain, vvars)
        # normalize_mouths is identity on host-normalized float frames and
        # the on-device affine for raw uint8 frames (--device-normalize-video)
        from rtfs_net_tpu.datas.transform import normalize_mouths

        video_apply = jax.jit(lambda m: vmodel.apply(vvars, normalize_mouths(m)))

    test_set = AVSpeechDataset(
        conf["main_args"]["test_dir"],
        n_src=conf["data"]["nondefault_nsrc"],
        sample_rate=conf["data"]["sample_rate"],
        segment=None,
        normalize_audio=conf["data"]["normalize_audio"],
        device_normalize_video=bool(
            conf["main_args"].get("device_normalize_video", False)),
    )

    save_dir = os.path.join(exp_dir, "results_new")
    os.makedirs(os.path.join(save_dir, "examples"), exist_ok=True)
    metrics = ALLMetricsTracker(save_file=os.path.join(save_dir, "metrics.csv"))
    loss_func = PITLossWrapper(pairwise_neg_sisdr, pit_from="pw_mtx")

    bucket = int(conf["main_args"].get("bucket_size", 4000))
    n_save_ex = int(conf["main_args"].get("n_save_ex", 10))
    eval_bs = int(conf["main_args"].get("eval_batch_size") or
                  conf["training"]["batch_size"] * 2)
    sr = conf["data"]["sample_rate"]

    from rtfs_net_tpu.evaluation import run_batched_eval

    from rtfs_net_tpu.models import for_inference

    run_batched_eval(
        model=for_inference(model), variables=variables, test_set=test_set,
        metrics=metrics, loss_func=loss_func, video_apply=video_apply,
        bucket=bucket, eval_batch_size=eval_bs, sample_rate=sr,
        n_save_ex=n_save_ex,
        examples_dir=os.path.join(save_dir, "examples"),
    )

    metrics.final()
    mean, std = metrics.get_mean(), metrics.get_std()

    order = ["si-snr_i", "sdr_i", "pesq", "stoi", "si-snr", "sdr"]
    rows = [("Model", conf["log"]["exp_name"]),
            ("Params (M)", count_params(variables["params"]) / 1e6)]

    # MACs over a 2 s input, like the reference's thop accounting embedded
    # into results.csv (reference test.py:91-98, base_av_model.py:61-118)
    from rtfs_net_tpu.utils.flops import flops_report

    try:
        mix2s = jnp.zeros((1, 2 * conf["data"]["sample_rate"]))
        vout = conf["audionet"].get("pretrained_vout_chan", 512)
        emb2s = jnp.zeros((1, vout, 50)) if video_apply is not None else None
        # XLA cost analysis counts a scan body ONCE — unroll the repeats
        # for accounting so every repeat's MACs are in the total
        macs_model = (model.clone(scan_shared_repeats=False)
                      if hasattr(model, "scan_shared_repeats") else model)
        rep = flops_report(lambda v, m, e: macs_model.apply(v, m, e),
                           variables, mix2s, emb2s)
        rows.append(("MACs (G, 2s)", round(rep["gmacs"], 2)))
    except Exception as e:
        rows.append(("MACs (G, 2s)", f"unavailable ({e})"))
    if video_apply is not None:
        try:
            vrep = flops_report(video_apply,
                                jnp.zeros((1, 1, 50, 88, 88)))
            rows.append(("Videomodel MACs (G, 2s)", round(vrep["gmacs"], 2)))
        except Exception as e:
            rows.append(("Videomodel MACs (G, 2s)", f"unavailable ({e})"))
    for k in sorted(mean, key=lambda k: order.index(k) if k in order else 100):
        m, s = round(mean[k], 4), round(std[k], 3)
        rows.append((k, f"{m} ± {s}"))
        print(f"{k}\tmean: {m}  std: {s}")
    for k, v in conf["audionet"].items():
        if isinstance(v, dict):
            rows.extend([(f"{k}_{kk}", vv) for kk, vv in v.items()])
        else:
            rows.append((k, v))

    import csv

    with open(os.path.join(save_dir, "results.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["Key", "Value"])
        w.writerows(rows)


if __name__ == "__main__":
    from rtfs_net_tpu.utils import prepare_parser_from_dict, parse_args_as_dict

    parser = argparse.ArgumentParser()
    parser.add_argument("--conf-dir", required=True,
                        help="Path to the experiment conf.yaml")
    parser.add_argument("--test-dir", required=True,
                        help="Manifest dir with {mix,s1,s2}.json")
    parser.add_argument("--exp-dir", default=None)
    parser.add_argument("--n-save-ex", dest="n_save_ex", default=10, type=int)
    parser.add_argument("--bucket-size", dest="bucket_size", default=4000, type=int)
    parser.add_argument("--eval-batch-size", dest="eval_batch_size", default=None,
                        type=int, help="utterances per batch (default: "
                                       "training batch_size x 2)")
    parser.add_argument("--device-normalize-video", dest="device_normalize_video",
                        default=False, type=bool,
                        help="ship mouth frames to the device as raw uint8 "
                             "(1 byte/pixel, 4x less input bandwidth) and "
                             "normalize on-device")
    args, _ = parser.parse_known_args()
    with open(args.conf_dir) as f:
        def_conf = yaml.safe_load(f)
    parser = prepare_parser_from_dict(def_conf, parser=parser)
    conf = parse_args_as_dict(parser)
    conf["main_args"]["conf_dir"] = args.conf_dir
    main(conf)
