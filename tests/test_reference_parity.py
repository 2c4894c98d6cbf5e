"""Ground-truth parity against the ACTUAL reference source.

These tests import ``/root/reference/src/models`` itself (see
``tests/_refsrc.py`` for the four import shims), build reference modules
with random torch init in eval mode, convert their state dicts with
``rtfs_net_tpu.utils.avnet_convert`` / ``torch_convert``, and require
number-for-number agreement with this repo's flax models.

Unlike tests/test_avnet_convert.py (self-authored torch replicas, kept
for the SRU variant the CUDA-only sru package blocks), any misreading of
the reference here fails loudly: the golden values come from the
reference's own code (``src/models/tdavnet.py:86-97`` end-to-end).

Skipped wholesale when /root/reference isn't mounted.
"""
import copy
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from rtfs_net_tpu.models import AVNet
from rtfs_net_tpu.models.videomodels import FRCNNVideoModel
from rtfs_net_tpu.utils.avnet_convert import convert_avnet
from rtfs_net_tpu.utils.torch_convert import convert_video_backbone

from _refsrc import load_reference_models, reference_config, REF_MODELS

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_MODELS), reason="/root/reference not mounted")

KEY = jax.random.PRNGKey(0)


def _forward_pair(ref_model, audionet_conf, mix, mouth, atol_rel=1e-3):
    """Run the reference torch model and the converted flax model on the
    same input; assert allclose scaled by the reference output range."""
    ref_model = ref_model.eval()
    with torch.no_grad():
        args = (torch.from_numpy(mix),) if mouth is None else (
            torch.from_numpy(mix), torch.from_numpy(mouth))
        golden = ref_model(*args).numpy()

    model = AVNet(**audionet_conf)
    jmouth = None if mouth is None else jnp.asarray(mouth)
    variables = model.init(KEY, jnp.asarray(mix), jmouth)
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    converted = convert_avnet(sd, variables, audionet_conf)
    out = np.asarray(model.apply(converted, jnp.asarray(mix), jmouth))

    assert out.shape == golden.shape
    scale = float(np.abs(golden).max()) or 1.0
    np.testing.assert_allclose(out, golden, atol=atol_rel * scale)
    return golden, out


def _build_ref_avnet(audionet_conf):
    ref = load_reference_models()
    conf = copy.deepcopy(audionet_conf)
    torch.manual_seed(0)
    return ref.AVNet(**conf, print_macs=False)


def _swap_sru(conf, rnn_type):
    conf = copy.deepcopy(conf)
    for params in (conf.get("audio_params"), conf.get("video_params")):
        for lc in (params or {}).get("layers", {}).values():
            if lc.get("rnn_type") == "SRU":
                lc["rnn_type"] = rnn_type
    return conf


# ------------------------------------------------------------- full configs
@pytest.mark.parametrize("rnn_type", ["LSTM", "GRU", "Attn"])
def test_rtfs4_full_config_parity(rng, rnn_type):
    """The complete lrs2_RTFSNet_4_layer audionet (SRU->rnn_type swapped;
    the sru CUDA package can't run here — replica tests cover SRU)."""
    conf = _swap_sru(reference_config("lrs2_RTFSNet_4_layer.yaml")["audionet"],
                     rnn_type)
    ref_model = _build_ref_avnet(conf)
    L = 8000
    mix = rng.standard_normal((1, L)).astype(np.float32)
    mouth = rng.standard_normal((1, conf["pretrained_vout_chan"], 13)).astype(np.float32)
    _forward_pair(ref_model, conf, mix, mouth)


def test_ctcnet16_full_config_parity(rng):
    """The complete lrs2_CTCNet_16_layer audionet: ConvolutionalEncoder/
    Decoder, FRCNN audio (16 shared repeats) + FRCNN video (3 unshared,
    BatchNorm1d), unshared ConcatFusion."""
    conf = reference_config("lrs2_CTCNet_16_layer.yaml")["audionet"]
    ref_model = _build_ref_avnet(conf)
    L = 4000
    mix = rng.standard_normal((1, L)).astype(np.float32)
    mouth = rng.standard_normal((1, conf["pretrained_vout_chan"], 7)).astype(np.float32)
    _forward_pair(ref_model, conf, mix, mouth, atol_rel=2e-3)


# ----------------------------------------------------------- tiny AV config
WIN, HOP = 64, 32
C_ENC, C_BN, C_HID, C_V = 16, 16, 8, 16
N_FREQS_DOWN = (WIN // 2 + 1 + 2 - 4) // 2 + 1  # k4 s2 p1 on F=33 -> 16


def tiny_conf(fusion_type="ATTNFusion", mask_generation_params=None,
              audio_net="TDANet", audio_layers=None, video_repeats=1):
    """A small RTFS-style AV config exercising the video branch and
    cross-modal fusion with fast CPU compiles."""
    audio_layers = audio_layers or {
        "layer_1": {"layer_type": "MultiHeadSelfAttention2D", "dim": 3,
                    "n_freqs": N_FREQS_DOWN, "n_head": 2, "hid_chan": 2,
                    "act_type": "PReLU",
                    "norm_type": "LayerNormalization4D"},
    }
    return {
        "n_src": 1,
        "pretrained_vout_chan": C_V,
        "enc_dec_params": {"encoder_type": "STFTEncoder",
                           "decoder_type": "STFTDecoder",
                           "win": WIN, "hop_length": HOP, "out_chan": C_ENC,
                           "kernel_size": 3, "stride": 1, "bias": False,
                           "act_type": None, "norm_type": None},
        "audio_bn_params": {"pre_norm_type": "gLN", "pre_act_type": "ReLU",
                            "out_chan": C_BN, "kernel_size": 1, "is2d": True},
        "video_bn_params": {"kernel_size": -1},
        "audio_params": {"audio_net": audio_net, "hid_chan": C_HID,
                         "kernel_size": 4, "stride": 2, "norm_type": "gLN",
                         "act_type": "PReLU", "upsampling_depth": 2,
                         "repeats": 3, "shared": True, "is2d": True,
                         "layers": audio_layers},
        "video_params": {"video_net": "TDANet", "hid_chan": 8,
                         "kernel_size": 3, "stride": 2,
                         "norm_type": "BatchNorm1d", "act_type": "PReLU",
                         "upsampling_depth": 2, "repeats": video_repeats,
                         "shared": True, "is2d": False,
                         "layers": {
                             "layer_1": {"layer_type": "GlobalAttention",
                                         "ffn_name": "FeedForwardNetwork",
                                         "kernel_size": 3, "n_head": 2,
                                         "dropout": 0.1}}},
        "fusion_params": {"fusion_type": fusion_type, "fusion_shared": False,
                          "kernel_size": 1, "is2d": True},
        "mask_generation_params": mask_generation_params or {
            "mask_generator_type": "MaskGenerator", "mask_act": "ReLU",
            "RI_split": True, "is2d": True},
    }


@pytest.mark.parametrize("fusion_type", [
    "ConcatFusion", "SumFusion", "InjectionFusion",
    "LSTMFusion", "GRUFusion", "ATTNFusion",
])
def test_fusion_strategy_parity(rng, fusion_type):
    """All 6 fusion strategies vs the real reference, unshared over 2
    fusion repeats (repeat 0 has the video-side cell, last repeat's
    video_fusion is disabled — TDAVNet/fusion.py:253-259).

    ATTNFusion runs with a single repeat: the reference's video-side CAF
    cell requires 4D video (``layers/fusion.py:253`` unpacks 4 dims) and
    crashes on the 1D video branch — every shipped config uses it with
    video repeats=1, where video_fusion is disabled on the only repeat.
    """
    conf = tiny_conf(fusion_type=fusion_type,
                     video_repeats=1 if fusion_type == "ATTNFusion" else 2)
    ref_model = _build_ref_avnet(conf)
    mix = rng.standard_normal((2, 1600)).astype(np.float32)
    mouth = rng.standard_normal((2, C_V, 13)).astype(np.float32)
    _forward_pair(ref_model, conf, mix, mouth)


@pytest.mark.parametrize("mg", [
    {"mask_generator_type": "MaskGenerator2Chan", "mask_act": "ReLU",
     "RI_split": True, "is2d": True},
    {"mask_generator_type": "MaskGenerator2Chan", "mask_act": "ReLU",
     "RI_split": False, "output_gate": True, "dw_gate": True, "is2d": True},
    {"mask_generator_type": "MaskGenerator2Chan", "mask_act": "ReLU",
     "direct": True, "is2d": True},
])
def test_mask_generator_2chan_parity(rng, mg):
    """MaskGenerator2Chan masks the raw 2-channel spectrogram directly
    (reference mask_generator.py:102-187): encoder kernel<=0 keeps the
    raw Re/Im planes."""
    conf = tiny_conf(mask_generation_params=mg)
    conf["enc_dec_params"].update({"out_chan": 2, "kernel_size": 0})
    ref_model = _build_ref_avnet(conf)
    mix = rng.standard_normal((2, 1600)).astype(np.float32)
    mouth = rng.standard_normal((2, C_V, 13)).astype(np.float32)
    _forward_pair(ref_model, conf, mix, mouth)


def test_dptnet_parity(rng):
    """DPTNet separator with GlobalAttention2D + MultiHeadSelfAttention2D
    globalatt layers (reference separators/dpt.py; attention.py:223-280
    incl. the shared group_FFN applied twice)."""
    layers = {
        "layer_1": {"layer_type": "GlobalAttention2D",
                    "ffn_name": "FeedForwardNetwork", "kernel_size": 3,
                    "n_head": 2, "dropout": 0.1, "single_ffn": True,
                    "group_ffn": True},
        "layer_2": {"layer_type": "MultiHeadSelfAttention2D", "dim": 3,
                    "n_freqs": WIN // 2 + 1, "n_head": 2, "hid_chan": 2,
                    "act_type": "PReLU",
                    "norm_type": "LayerNormalization4D"},
    }
    conf = tiny_conf(audio_net="DPTNet", audio_layers=layers)
    # DPTNet keeps full resolution: globalatt runs at F = win//2+1
    conf["audio_params"].pop("upsampling_depth", None)
    ref_model = _build_ref_avnet(conf)
    mix = rng.standard_normal((2, 1600)).astype(np.float32)
    mouth = rng.standard_normal((2, C_V, 13)).astype(np.float32)
    _forward_pair(ref_model, conf, mix, mouth)


def test_convolutional_rnn_ffn_parity(rng):
    """GlobalAttention with ffn_name=ConvolutionalRNN (conv_layers.py:262-316)
    in the video branch."""
    conf = tiny_conf()
    conf["video_params"]["layers"]["layer_1"]["ffn_name"] = "ConvolutionalRNN"
    ref_model = _build_ref_avnet(conf)
    mix = rng.standard_normal((2, 1600)).astype(np.float32)
    mouth = rng.standard_normal((2, C_V, 13)).astype(np.float32)
    _forward_pair(ref_model, conf, mix, mouth)


def test_multilayer_conv_encoder_parity(rng):
    """ConvolutionalEncoder with layers=2 (dilated branch sum —
    reference encoder.py:58-119) in a CTCNet-style time-domain config."""
    conf = copy.deepcopy(reference_config("lrs2_CTCNet_16_layer.yaml")["audionet"])
    conf["enc_dec_params"]["layers"] = 2
    conf["audio_params"].update(repeats=2)
    conf["video_params"].update(repeats=1, shared=True)
    ref_model = _build_ref_avnet(conf)
    mix = rng.standard_normal((1, 4000)).astype(np.float32)
    mouth = rng.standard_normal((1, conf["pretrained_vout_chan"], 7)).astype(np.float32)
    _forward_pair(ref_model, conf, mix, mouth)


# ----------------------------------------------------------- layer-level
def _layer_parity(ref_layer, our_layer, x, mapper, atol_rel=1e-4):
    from rtfs_net_tpu.utils.avnet_convert import _Writer

    ref_layer = ref_layer.eval()
    with torch.no_grad():
        golden = ref_layer(torch.from_numpy(x)).numpy()
    variables = our_layer.init(KEY, jnp.asarray(x))
    w = _Writer(variables)
    # prefix keys so mappers can be called with src="L"
    sd = {f"L.{k}": v.detach().numpy()
          for k, v in ref_layer.state_dict().items()}
    mapper(w, sd)
    out = np.asarray(our_layer.apply(w.result(), jnp.asarray(x)))
    scale = float(np.abs(golden).max()) or 1.0
    np.testing.assert_allclose(out, golden, atol=atol_rel * scale)


def test_global_galr_parity(rng):
    """GlobalGALR numerical parity vs the real reference layer
    (rnn_layers.py:329-379) — was shape-only in round 1."""
    from rtfs_net_tpu.models.layers import GlobalGALR
    from rtfs_net_tpu.utils.avnet_convert import map_global_galr

    ref = load_reference_models()
    torch.manual_seed(0)
    t_layer = ref.layers.GlobalGALR(in_chan=16, n_head=2, kernel_size=3,
                                    rnn_type="LSTM", group_ffn=True)
    j_layer = GlobalGALR(in_chan=16, n_head=2, kernel_size=3,
                         rnn_type="LSTM", group_ffn=True)
    x = rng.standard_normal((2, 16, 12, 9)).astype(np.float32)
    _layer_parity(t_layer, j_layer, x,
                  lambda w, sd: map_global_galr(w, sd, "L", ()))


def test_global_attention_rnn_parity(rng):
    from rtfs_net_tpu.models.layers import GlobalAttentionRNN
    from rtfs_net_tpu.utils.avnet_convert import map_global_attention_rnn

    ref = load_reference_models()
    torch.manual_seed(0)
    t_layer = ref.layers.GlobalAttentionRNN(in_chan=16, rnn_type="GRU")
    j_layer = GlobalAttentionRNN(in_chan=16, rnn_type="GRU")
    x = rng.standard_normal((2, 16, 20)).astype(np.float32)
    _layer_parity(t_layer, j_layer, x,
                  lambda w, sd: map_global_attention_rnn(w, sd, "L", ()))


# ------------------------------------------------------------- video models
@pytest.mark.parametrize("backbone", ["resnet", "shufflenet"])
def test_video_model_parity(rng, backbone):
    """FRCNNVideoModel (3D frontend + trunk) vs the real reference,
    random init, eval mode (reference frcnn_videomodel.py:16-73)."""
    ref = load_reference_models()
    torch.manual_seed(0)
    tm = ref.videomodels.FRCNNVideoModel(
        backbone_type=backbone, relu_type="prelu", width_mult=1.0,
        pretrain=None, print_macs=False)
    # reference train() override returns None (frcnn_videomodel.py:78-83),
    # so .eval() can't be chained
    tm.eval()
    # 96x96 input keeps the shufflenet globalpool kernel (input_size/32)
    # consistent with the reference's construction
    frames = rng.standard_normal((1, 1, 4, 96, 96)).astype(np.float32) * 0.5
    with torch.no_grad():
        golden = tm(torch.from_numpy(frames)).numpy()

    model = FRCNNVideoModel(backbone_type=backbone, relu_type="prelu",
                            width_mult=1.0)
    variables = model.init(KEY, jnp.asarray(frames))
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    converted = convert_video_backbone(sd, variables, backbone)
    out = np.asarray(model.apply(converted, jnp.asarray(frames)))
    assert out.shape == golden.shape
    scale = float(np.abs(golden).max()) or 1.0
    np.testing.assert_allclose(out, golden, atol=1e-3 * scale)
