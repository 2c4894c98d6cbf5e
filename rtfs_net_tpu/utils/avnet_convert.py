"""Reference AVNet checkpoint -> flax variables converter.

Maps the torch module naming of the reference implementation
(``src/models/tdavnet.py`` assembly) onto this repo's flax param tree so
published ``best_model.pth`` checkpoints (``{model_name, state_dict,
model_args}`` — base_av_model.py:36-51) evaluate here for SI-SNRi parity.

Name-mapping contract (reference -> flax):
  ConvNormAct   P.full_layer.{0..4}   -> {pre_norm, pre_act, conv, norm, act}
                (gLN wraps GroupNorm as ``.norm``; LN4D exposes gamma/beta;
                BatchNorm exposes weight/bias/running_mean/running_var)
  ConvActNorm   P.{conv,act,norm}     -> {conv, act, norm}
  DualPathRNN   P.{norm,rnn,linear}   -> same; SRU layer l:
                rnn.rnn_lst.{l}.{weight,weight_c,bias} with column layout
                [dir][k][h] -> ours [k][dir][h] (transposed on load)
  MHSA          P.{norm1,pos_enc,attention,norm2} -> same names
  TDANetBlock   P.{gateway,projection,downsample_layers.i,globalatt.j,
                fusion_layers.i,concat_layers.i,residual_conv}
                -> {gateway, projection, down{i}, globalatt{j}, fuse{i},
                   concat{i}, residual_conv}
  ATTNFusion    P.{audio_lstm,video_lstm} -> {audio_attn, video_attn}
  FRCNNBlock    fusion_layers.{i}.0 -> lateral{i};
                residual_conv.{0,1} -> residual_conv{0,1}

Weight layouts are identical by construction (torch conv layouts kept),
so besides the SRU column shuffle the conversion is renaming + BN-stat
splitting.
"""
from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import jax.numpy as jnp
import numpy as np


class ConversionError(Exception):
    pass


class _Writer:
    """Collects (collection, path) -> value with shape checking against the
    target variables tree."""

    def __init__(self, variables):
        self.params = _tree_to_dict(variables.get("params", {}))
        self.stats = _tree_to_dict(variables.get("batch_stats", {}))
        self.filled = set()

    def put(self, collection: str, path: Tuple[str, ...], value: np.ndarray,
            src_key: str):
        tree = self.params if collection == "params" else self.stats
        node = tree
        for p in path[:-1]:
            if p not in node:
                raise ConversionError(
                    f"{src_key}: flax path {'/'.join(path)} missing at {p}"
                )
            node = node[p]
        leaf = path[-1]
        if leaf not in node:
            raise ConversionError(f"{src_key}: flax leaf {'/'.join(path)} missing")
        cur = np.asarray(node[leaf])
        value = np.asarray(value)
        if cur.shape != value.shape:
            raise ConversionError(
                f"{src_key}: shape {value.shape} != {'/'.join(path)} {cur.shape}"
            )
        node[leaf] = jnp.asarray(value)
        self.filled.add((collection,) + path)

    def result(self):
        out = {"params": self.params}
        if self.stats:
            out["batch_stats"] = self.stats
        return out


def _tree_to_dict(tree):
    if hasattr(tree, "items"):
        return {k: _tree_to_dict(v) for k, v in tree.items()}
    return tree


def _subtree(variables_dict, path):
    node = variables_dict
    for p in path:
        if node is None or p not in node:
            return None
        node = node[p]
    return node


# ------------------------------------------------------------------ leaves
def _map_norm(w: "_Writer", sd, src: str, path, src_key_root: str):
    """Map one norm at reference prefix ``src`` onto flax subtree ``path``.
    Detects the reference flavour from the available keys."""
    if f"{src}.norm.weight" in sd:  # gLN (GroupNorm wrapper)
        w.put("params", path + ("scale",), sd[f"{src}.norm.weight"], src)
        w.put("params", path + ("bias",), sd[f"{src}.norm.bias"], src)
    elif f"{src}.gamma" in sd:  # LayerNormalization4D
        w.put("params", path + ("scale",), sd[f"{src}.gamma"], src)
        w.put("params", path + ("bias",), sd[f"{src}.beta"], src)
    elif f"{src}.running_mean" in sd:  # BatchNorm
        w.put("params", path + ("scale",), sd[f"{src}.weight"], src)
        w.put("params", path + ("bias",), sd[f"{src}.bias"], src)
        w.put("batch_stats", path + ("mean",), sd[f"{src}.running_mean"], src)
        w.put("batch_stats", path + ("var",), sd[f"{src}.running_var"], src)
    elif f"{src}.weight" in sd:  # plain LayerNorm
        w.put("params", path + ("scale",), sd[f"{src}.weight"], src)
        w.put("params", path + ("bias",), sd[f"{src}.bias"], src)
    # else: Identity — nothing to map


def _map_conv_leaf(w, sd, src, path):
    w.put("params", path + ("weight",), sd[f"{src}.weight"], src)
    if f"{src}.bias" in sd:
        w.put("params", path + ("bias",), sd[f"{src}.bias"], src)


def map_conv_norm_act(w, sd, src, path):
    """ConvNormAct: reference Sequential full_layer = (pre_norm, pre_act,
    conv, norm, act)."""
    base = f"{src}.full_layer"
    _map_norm(w, sd, f"{base}.0", path + ("pre_norm",), src)
    if f"{base}.1.weight" in sd:  # PReLU pre_act
        w.put("params", path + ("pre_act", "alpha"), sd[f"{base}.1.weight"], src)
    if f"{base}.2.weight" in sd:
        _map_conv_leaf(w, sd, f"{base}.2", path + ("conv",))
    _map_norm(w, sd, f"{base}.3", path + ("norm",), src)
    if f"{base}.4.weight" in sd:  # PReLU act
        w.put("params", path + ("act", "alpha"), sd[f"{base}.4.weight"], src)


def map_conv_act_norm(w, sd, src, path):
    if f"{src}.conv.weight" in sd:
        _map_conv_leaf(w, sd, f"{src}.conv", path + ("conv",))
    if f"{src}.act.weight" in sd:
        w.put("params", path + ("act", "alpha"), sd[f"{src}.act.weight"], src)
    _map_norm(w, sd, f"{src}.norm", path + ("norm",), src)


def map_injection_multi_sum(w, sd, src, path):
    for name in ("local_embedding", "global_embedding", "global_gate"):
        map_conv_norm_act(w, sd, f"{src}.{name}", path + (name,))


def _sru_cols_to_ours(wt: np.ndarray, k: int, ndir: int, h: int) -> np.ndarray:
    """sru weight columns [dir][k][h] -> ours [k][dir*h]."""
    d_in = wt.shape[0]
    return (wt.reshape(d_in, ndir, k, h).transpose(0, 2, 1, 3)
            .reshape(d_in, k * ndir * h))


def map_dual_path_rnn(w, sd, src, path, num_layers: int, hid: int,
                      bidirectional: bool):
    _map_norm(w, sd, f"{src}.norm", path + ("norm",), src)
    if f"{src}.rnn.attention.in_proj_weight" in sd:  # rnn_type == "Attn"
        map_mhsa(w, sd, f"{src}.rnn", path + ("rnn",))
    ndir = 2 if bidirectional else 1
    for l in range(num_layers):
        pre = f"{src}.rnn.rnn_lst.{l}"
        if f"{pre}.weight" in sd:  # SRU
            wt = np.asarray(sd[f"{pre}.weight"])
            k = wt.shape[1] // (ndir * hid)
            w.put("params", path + ("rnn", f"weight_l{l}"),
                  _sru_cols_to_ours(wt, k, ndir, hid), pre)
            w.put("params", path + ("rnn", f"weight_c_l{l}"),
                  sd[f"{pre}.weight_c"], pre)
            w.put("params", path + ("rnn", f"bias_l{l}"), sd[f"{pre}.bias"], pre)
    # cuDNN LSTM/GRU naming passes straight through
    for key in list(sd):
        m = re.match(re.escape(src) + r"\.rnn\.(weight_[ih]h_l\d+(?:_reverse)?|"
                     r"bias_[ih]h_l\d+(?:_reverse)?)$", key)
        if m:
            w.put("params", path + ("rnn", m.group(1)), sd[key], key)
    _map_conv_leaf(w, sd, f"{src}.linear", path + ("linear",))


def map_mhsa(w, sd, src, path):
    for norm in ("norm1", "norm2"):
        _map_norm(w, sd, f"{src}.{norm}", path + (norm,), src)
    w.put("params", path + ("attention", "in_proj_weight"),
          sd[f"{src}.attention.in_proj_weight"], src)
    w.put("params", path + ("attention", "in_proj_bias"),
          sd[f"{src}.attention.in_proj_bias"], src)
    _map_conv_leaf(w, sd, f"{src}.attention.out_proj",
                   path + ("attention", "out_proj"))


def map_mhsa2d(w, sd, src, path, n_head: int):
    """Pack the reference's 3×n_head per-head 1×1 ConvActNorms
    (``attention.py:156-158``) into our fused layout: one qkv conv
    ([all Q heads][all K][all V] along out-channels), stacked PReLU
    alphas (H,), stacked LN4D affines (H, chan, 1, F)."""
    def head_parts(group):
        weights, biases, alphas, gammas, betas = [], [], [], [], []
        for h in range(n_head):
            pre = f"{src}.{group}.{h}"
            weights.append(np.asarray(sd[f"{pre}.conv.weight"]))
            biases.append(np.asarray(sd[f"{pre}.conv.bias"]))
            alphas.append(np.asarray(sd[f"{pre}.act.weight"]).reshape(()))
            gammas.append(np.asarray(sd[f"{pre}.norm.gamma"])[0])  # (C,1,F)
            betas.append(np.asarray(sd[f"{pre}.norm.beta"])[0])
        return (np.concatenate(weights, 0), np.concatenate(biases, 0),
                np.stack(alphas), np.stack(gammas), np.stack(betas))

    qw, qb, qa, qg, qbeta = head_parts("Queries")
    kw, kb, ka, kg, kbeta = head_parts("Keys")
    vw, vb, va, vg, vbeta = head_parts("Values")
    w.put("params", path + ("qkv_conv", "weight"),
          np.concatenate([qw, kw, vw], 0), f"{src}.Queries/Keys/Values")
    w.put("params", path + ("qkv_conv", "bias"),
          np.concatenate([qb, kb, vb], 0), f"{src}.Queries/Keys/Values")
    for name, alpha, gamma, beta in (("q", qa, qg, qbeta),
                                     ("k", ka, kg, kbeta),
                                     ("v", va, vg, vbeta)):
        w.put("params", path + (f"{name}_alpha",), alpha, src)
        w.put("params", path + (f"{name}_scale",), gamma, src)
        w.put("params", path + (f"{name}_bias",), beta, src)
    map_conv_act_norm(w, sd, f"{src}.attn_concat_proj",
                      path + ("attn_concat_proj",))


def map_ffn(w, sd, src, path):
    """FeedForwardNetwork (encoder/refiner/decoder) or ConvolutionalRNN
    (encoder/forward_pass/backward_pass/decoder) -> our auto-named
    ConvNormAct_{i} children, in instantiation order."""
    if f"{src}.refiner.full_layer.2.weight" in sd:  # FeedForwardNetwork
        ref_names = ("encoder", "refiner", "decoder")
    else:  # ConvolutionalRNN
        ref_names = ("encoder", "forward_pass", "backward_pass", "decoder")
    for i, ref_name in enumerate(ref_names):
        map_conv_norm_act(w, sd, f"{src}.{ref_name}",
                          path + (f"ConvNormAct_{i}",))


def map_global_attention(w, sd, src, path):
    map_mhsa(w, sd, f"{src}.MHSA", path + ("MHSA",))
    map_ffn(w, sd, f"{src}.FFN", path + ("FFN",))


def map_rnn_projection(w, sd, src, path):
    """RNNProjection (reference rnn_layers.py:12-59): LN -> cuDNN RNN ->
    Sequential(PReLU, Dropout, Linear, Dropout) -> LN."""
    _map_norm(w, sd, f"{src}.norm1", path + ("norm1",), src)
    _map_norm(w, sd, f"{src}.norm2", path + ("norm2",), src)
    for key in list(sd):
        m = re.match(re.escape(src) + r"\.rnn\.(weight_[ih]h_l\d+(?:_reverse)?|"
                     r"bias_[ih]h_l\d+(?:_reverse)?)$", key)
        if m:
            w.put("params", path + ("rnn", m.group(1)), sd[key], key)
    w.put("params", path + ("prelu", "alpha"), sd[f"{src}.proj.0.weight"], src)
    w.put("params", path + ("proj", "weight"), sd[f"{src}.proj.2.weight"], src)
    w.put("params", path + ("proj", "bias"), sd[f"{src}.proj.2.bias"], src)


def map_global_attention_rnn(w, sd, src, path):
    map_rnn_projection(w, sd, f"{src}.RNN", path + ("RNN",))


def map_global_galr(w, sd, src, path):
    """GlobalGALR (reference rnn_layers.py:329-379): time RNNProjection +
    freq MHSA/FFN, optional group FFN."""
    map_rnn_projection(w, sd, f"{src}.time_RNN", path + ("time_RNN",))
    map_mhsa(w, sd, f"{src}.freq_MHSA", path + ("freq_MHSA",))
    map_ffn(w, sd, f"{src}.freq_FFN", path + ("freq_FFN",))
    if f"{src}.group_FFN.encoder.full_layer.2.weight" in sd:
        map_ffn(w, sd, f"{src}.group_FFN", path + ("group_FFN",))


def map_global_attention_2d(w, sd, src, path):
    """GlobalAttention2D (reference attention.py:223-280): time/freq MHSA,
    optional per-axis FFNs, one group_FFN shared across both applications."""
    for name in ("time_MHSA", "freq_MHSA"):
        map_mhsa(w, sd, f"{src}.{name}", path + (name,))
    for name in ("time_FFN", "freq_FFN", "group_FFN"):
        if f"{src}.{name}.encoder.full_layer.2.weight" in sd:
            map_ffn(w, sd, f"{src}.{name}", path + (name,))


def map_attn_fusion_cell(w, sd, src, path):
    for name in ("key_embed", "value_embed", "attention_embed", "resize"):
        map_conv_norm_act(w, sd, f"{src}.{name}", path + (name,))


def map_conv_rnn_fusion_cell(w, sd, src, path):
    """ConvLSTMFusionCell / ConvGRUFusionCell: two gate ConvNormActs
    (reference layers/fusion.py:82-96,149-163)."""
    for name in ("conv_a", "conv_b"):
        map_conv_norm_act(w, sd, f"{src}.{name}", path + (name,))


# ------------------------------------------------------------------ blocks
def map_tdanet_block(w, sd, src, path, conf):
    depth = conf.get("upsampling_depth", 4)
    map_conv_norm_act(w, sd, f"{src}.gateway", path + ("gateway",))
    map_conv_norm_act(w, sd, f"{src}.projection", path + ("projection",))
    for i in range(depth):
        map_conv_norm_act(w, sd, f"{src}.downsample_layers.{i}",
                          path + (f"down{i}",))
        map_injection_multi_sum(w, sd, f"{src}.fusion_layers.{i}",
                                path + (f"fuse{i}",))
    for i in range(depth - 1):
        map_injection_multi_sum(w, sd, f"{src}.concat_layers.{i}",
                                path + (f"concat{i}",))
    _map_globalatt(w, sd, src, path, conf)
    map_conv_norm_act(w, sd, f"{src}.residual_conv", path + ("residual_conv",))


def _map_globalatt(w, sd, src, path, conf):
    """Map a config-built ``globalatt`` Sequential (TDANet/DPTNet blocks)."""
    for j, (lname, lconf) in enumerate((conf.get("layers") or {}).items()):
        lsrc = f"{src}.globalatt.{j}"
        lpath = path + (f"globalatt{j}",)
        lt = lconf["layer_type"]
        if lt == "DualPathRNN":
            map_dual_path_rnn(w, sd, lsrc, lpath, lconf.get("num_layers", 1),
                              lconf["hid_chan"], lconf.get("bidirectional", True))
        elif lt == "MultiHeadSelfAttention2D":
            map_mhsa2d(w, sd, lsrc, lpath, lconf.get("n_head", 4))
        elif lt == "GlobalAttention":
            map_global_attention(w, sd, lsrc, lpath)
        elif lt == "GlobalAttention2D":
            map_global_attention_2d(w, sd, lsrc, lpath)
        elif lt == "MultiHeadSelfAttention":
            map_mhsa(w, sd, lsrc, lpath)
        elif lt in ("FeedForwardNetwork", "ConvolutionalRNN"):
            map_ffn(w, sd, lsrc, lpath)
        elif lt == "GlobalAttentionRNN":
            map_global_attention_rnn(w, sd, lsrc, lpath)
        elif lt == "GlobalGALR":
            map_global_galr(w, sd, lsrc, lpath)
        else:
            raise ConversionError(f"unsupported globalatt layer_type {lt}")


def map_dpt_block(w, sd, src, path, conf):
    """DPTNetBlock (reference separators/dpt.py:7-49): gateway/projection
    convs around the config-built globalatt stack."""
    map_conv_norm_act(w, sd, f"{src}.gateway", path + ("gateway",))
    map_conv_norm_act(w, sd, f"{src}.projection", path + ("projection",))
    _map_globalatt(w, sd, src, path, conf)
    map_conv_norm_act(w, sd, f"{src}.residual_conv", path + ("residual_conv",))


def map_frcnn_block(w, sd, src, path, conf):
    depth = conf.get("upsampling_depth", 4)
    map_conv_norm_act(w, sd, f"{src}.gateway", path + ("gateway",))
    map_conv_norm_act(w, sd, f"{src}.projection", path + ("projection",))
    for i in range(depth):
        map_conv_norm_act(w, sd, f"{src}.downsample_layers.{i}",
                          path + (f"down{i}",))
        if i >= 1:
            map_conv_norm_act(w, sd, f"{src}.fusion_layers.{i}.0",
                              path + (f"lateral{i}",))
        map_conv_norm_act(w, sd, f"{src}.concat_layers.{i}",
                          path + (f"concat{i}",))
    map_conv_norm_act(w, sd, f"{src}.residual_conv.0",
                      path + ("residual_conv0",))
    map_conv_norm_act(w, sd, f"{src}.residual_conv.1",
                      path + ("residual_conv1",))


def map_separator(w, sd, src, path, params: Dict[str, Any], which: str):
    net = params.get(f"{which}_net")
    if not net:
        return
    mapper = {"TDANet": map_tdanet_block, "FRCNN": map_frcnn_block,
              "DPTNet": map_dpt_block}[net]
    if params.get("shared", False):
        mapper(w, sd, f"{src}.blocks", path + ("blocks",), params)
    else:
        for i in range(params.get("repeats", 1)):
            mapper(w, sd, f"{src}.blocks.{i}", path + ("blocks_" + str(i),),
                   params)


def map_fusion(w, sd, src, path, fusion_params, fusion_repeats: int):
    ftype = fusion_params.get("fusion_type", "ConcatFusion")
    shared = fusion_params.get("fusion_shared", False)

    def one(fsrc, fpath):
        # reference naming quirk: LSTM/GRU/ATTN fusion all name their cells
        # audio_lstm/video_lstm (TDAVNet/fusion.py:120-212); the video-side
        # module only exists when video_fusion=True (not the last repeat)
        if ftype == "ATTNFusion":
            map_attn_fusion_cell(w, sd, f"{fsrc}.audio_lstm",
                                 fpath + ("audio_attn",))
            if f"{fsrc}.video_lstm.resize.full_layer.2.weight" in sd:
                map_attn_fusion_cell(w, sd, f"{fsrc}.video_lstm",
                                     fpath + ("video_attn",))
        elif ftype == "ConcatFusion":
            map_conv_norm_act(w, sd, f"{fsrc}.audio_conv", fpath + ("audio_conv",))
            if f"{fsrc}.video_conv.full_layer.2.weight" in sd:
                map_conv_norm_act(w, sd, f"{fsrc}.video_conv", fpath + ("video_conv",))
        elif ftype == "SumFusion":
            # SumFusion swaps names: video_conv maps video->audio (always
            # present), audio_conv maps audio->video (video_fusion only)
            map_conv_norm_act(w, sd, f"{fsrc}.video_conv", fpath + ("video_conv",))
            if f"{fsrc}.audio_conv.full_layer.2.weight" in sd:
                map_conv_norm_act(w, sd, f"{fsrc}.audio_conv", fpath + ("audio_conv",))
        elif ftype == "InjectionFusion":
            map_conv_norm_act(w, sd, f"{fsrc}.video_conv", fpath + ("video_conv",))
            map_injection_multi_sum(w, sd, f"{fsrc}.audio_inj",
                                    fpath + ("audio_inj",))
            if f"{fsrc}.audio_conv.full_layer.2.weight" in sd:
                map_conv_norm_act(w, sd, f"{fsrc}.audio_conv", fpath + ("audio_conv",))
                map_injection_multi_sum(w, sd, f"{fsrc}.video_inj",
                                        fpath + ("video_inj",))
        elif ftype in ("LSTMFusion", "GRUFusion"):
            ours = "lstm" if ftype == "LSTMFusion" else "gru"
            map_conv_rnn_fusion_cell(w, sd, f"{fsrc}.audio_lstm",
                                     fpath + (f"audio_{ours}",))
            if f"{fsrc}.video_lstm.conv_a.full_layer.2.weight" in sd:
                map_conv_rnn_fusion_cell(w, sd, f"{fsrc}.video_lstm",
                                         fpath + (f"video_{ours}",))
        else:
            raise ConversionError(f"fusion_type {ftype} conversion not implemented")

    if fusion_repeats <= 0:
        return
    if shared:
        one(f"{src}.fusion_module", path + ("fusion_module",))
    else:
        for i in range(fusion_repeats):
            one(f"{src}.fusion_module.{i}", path + (f"fusion_module_{i}",))


# ------------------------------------------------------------------- top
def convert_avnet(sd: Dict[str, np.ndarray], variables, audionet_conf) -> Dict:
    """state_dict (reference naming) + target variables + audionet config
    -> converted variables."""
    w = _Writer(variables)
    enc_type = audionet_conf["enc_dec_params"]["encoder_type"]
    if enc_type == "STFTEncoder":
        map_conv_norm_act(w, sd, "encoder.conv", ("encoder", "conv"))
    else:
        n_layers = audionet_conf["enc_dec_params"].get("layers", 1)
        for i in range(n_layers):
            map_conv_norm_act(w, sd, f"encoder.encoder.{i}",
                              ("encoder", f"branch{i}"))

    map_conv_norm_act(w, sd, "audio_bottleneck", ("audio_bottleneck",))
    if "video_bottleneck.full_layer.2.weight" in sd:
        map_conv_norm_act(w, sd, "video_bottleneck", ("video_bottleneck",))

    ap = audionet_conf["audio_params"]
    vp = audionet_conf.get("video_params") or {}
    fp = audionet_conf.get("fusion_params") or {}
    map_separator(w, sd, "refinement_module.audio_net",
                  ("refinement_module", "audio_net"), ap, "audio")
    if vp.get("video_net"):
        map_separator(w, sd, "refinement_module.video_net",
                      ("refinement_module", "video_net"), vp, "video")
    map_fusion(w, sd, "refinement_module.crossmodal_fusion",
               ("refinement_module", "crossmodal_fusion"), fp,
               vp.get("repeats", 0))

    mg = audionet_conf.get("mask_generation_params", {})
    mg_type = mg.get("mask_generator_type", "MaskGenerator")
    if mg_type == "MaskGenerator" and not mg.get("direct", False):
        w.put("params", ("mask_generator", "prelu", "alpha"),
              sd["mask_generator.mask_generator.0.weight"],
              "mask_generator.0")
        map_conv_norm_act(w, sd, "mask_generator.mask_generator.1",
                          ("mask_generator", "mask_conv"))
        if mg.get("output_gate", False):
            map_conv_norm_act(w, sd, "mask_generator.output",
                              ("mask_generator", "output"))
            map_conv_norm_act(w, sd, "mask_generator.gate",
                              ("mask_generator", "gate"))
    elif mg_type == "MaskGenerator2Chan":
        # Sequential(PReLU, ConvTranspose2d, act) — mask_generator.py:132-143
        w.put("params", ("mask_generator", "prelu", "alpha"),
              sd["mask_generator.mask_generator.0.weight"],
              "mask_generator.0")
        _map_conv_leaf(w, sd, "mask_generator.mask_generator.1",
                       ("mask_generator", "deconv"))
        if mg.get("output_gate", False):
            map_conv_norm_act(w, sd, "mask_generator.output",
                              ("mask_generator", "output"))
            map_conv_norm_act(w, sd, "mask_generator.gate",
                              ("mask_generator", "gate"))

    if "decoder.decoder.weight" in sd:
        _map_conv_leaf(w, sd, "decoder.decoder", ("decoder", "decoder"))

    return w.result()


def load_avnet_checkpoint(path: str, variables, audionet_conf) -> Dict:
    """Load a reference best_model.pth and convert (strips an optional
    ``audio_model.`` prefix like base_av_model.load_state_dict_in)."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    sd = {k.split("audio_model.")[-1]: v.detach().cpu().numpy()
          for k, v in sd.items() if hasattr(v, "detach")}
    return convert_avnet(sd, variables, audionet_conf)
