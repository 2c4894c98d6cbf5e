"""tf_order="ft" (internal (B,C,F,T) layout) vs "tf" parity.

The swapped order exists purely for TPU physical layout (F=129 in the lane
dim pads to 256 — ~2x wasted bytes on every intermediate); it must be
invisible in every other respect: identical param tree (bitwise — kernels
are transposed at APPLY time), identical outputs, identical gradients.
"""
import copy

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rtfs_net_tpu.models import AVNet


def tiny_rtfs_conf(**over):
    """RTFS-4-shaped config at toy sizes (mirrors the active YAML schema)."""
    conf = dict(
        n_src=1,
        pretrained_vout_chan=32,
        video_bn_params={"kernel_size": -1},
        audio_bn_params={"pre_norm_type": "gLN", "pre_act_type": "ReLU",
                         "out_chan": 16, "kernel_size": 1, "is2d": True},
        enc_dec_params={"encoder_type": "STFTEncoder",
                        "decoder_type": "STFTDecoder",
                        "win": 64, "hop_length": 32, "out_chan": 16,
                        "kernel_size": 3, "stride": 1, "bias": False,
                        "act_type": None, "norm_type": None},
        audio_params={
            "audio_net": "TDANet", "hid_chan": 8, "kernel_size": 4,
            "stride": 2, "norm_type": "gLN", "act_type": "PReLU",
            "upsampling_depth": 2, "repeats": 2, "shared": True,
            "is2d": True,
            "layers": {
                "layer_1": {"layer_type": "DualPathRNN", "hid_chan": 4,
                            "dim": 4, "kernel_size": 8, "stride": 1,
                            "rnn_type": "SRU", "num_layers": 2,
                            "bidirectional": True},
                "layer_2": {"layer_type": "DualPathRNN", "hid_chan": 4,
                            "dim": 3, "kernel_size": 8, "stride": 1,
                            "rnn_type": "LSTM", "num_layers": 1,
                            "bidirectional": True},
                "layer_3": {"layer_type": "MultiHeadSelfAttention2D",
                            "dim": 3, "n_freqs": 16, "n_head": 2,
                            "hid_chan": 2, "act_type": "PReLU",
                            "norm_type": "LayerNormalization4D"},
            },
        },
        video_params={
            "video_net": "TDANet", "hid_chan": 8, "kernel_size": 3,
            "stride": 2, "norm_type": "BatchNorm1d", "act_type": "PReLU",
            "upsampling_depth": 2, "repeats": 1, "shared": True,
            "is2d": False,
            "layers": {"layer_1": {"layer_type": "GlobalAttention",
                                   "ffn_name": "FeedForwardNetwork",
                                   "kernel_size": 3, "n_head": 2,
                                   "dropout": 0.0}},
        },
        fusion_params={"fusion_type": "ATTNFusion", "fusion_shared": True,
                       "kernel_size": 4, "is2d": True},
        mask_generation_params={"mask_generator_type": "MaskGenerator",
                                "mask_act": "ReLU", "RI_split": True,
                                "is2d": True},
    )
    conf.update(over)
    return conf


@pytest.fixture(scope="module")
def io_tensors():
    rng = np.random.default_rng(0)
    mix = jnp.asarray(rng.standard_normal((2, 1600)).astype(np.float32))
    mouth = jnp.asarray(rng.standard_normal((2, 32, 13)).astype(np.float32))
    return mix, mouth


def _mk(order, **over):
    return AVNet(tf_order=order, **tiny_rtfs_conf(**over))


def test_ft_eligible_and_auto(io_tensors):
    assert _mk("auto")._ft_eligible()
    # a non-flippable layer type disables auto
    conf = tiny_rtfs_conf()
    conf["audio_params"] = dict(conf["audio_params"])
    layers = {k: dict(v) for k, v in conf["audio_params"]["layers"].items()}
    layers["layer_3"] = {"layer_type": "GlobalAttention2D", "n_head": 2,
                         "ffn_name": "FeedForwardNetwork", "kernel_size": 3}
    conf["audio_params"]["layers"] = layers
    m = AVNet(tf_order="auto", **conf)
    assert not m._ft_eligible()
    with pytest.raises(ValueError):
        mix, mouth = io_tensors
        AVNet(tf_order="ft", **conf).init(jax.random.PRNGKey(0), mix, mouth)


def test_param_tree_identical(io_tensors):
    mix, mouth = io_tensors
    v_tf = _mk("tf").init(jax.random.PRNGKey(0), mix, mouth)
    v_ft = _mk("ft").init(jax.random.PRNGKey(0), mix, mouth)
    flat_tf = jax.tree_util.tree_leaves_with_path(v_tf)
    flat_ft = jax.tree_util.tree_leaves_with_path(v_ft)
    assert len(flat_tf) == len(flat_ft)
    for (p1, a), (p2, b) in zip(flat_tf, flat_ft):
        assert p1 == p2
        assert a.shape == b.shape, (p1, a.shape, b.shape)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(p1))


def test_forward_parity(io_tensors):
    mix, mouth = io_tensors
    m_tf, m_ft = _mk("tf"), _mk("ft")
    variables = m_tf.init(jax.random.PRNGKey(0), mix, mouth)
    y_tf = m_tf.apply(variables, mix, mouth)
    y_ft = m_ft.apply(variables, mix, mouth)  # SAME variables — layout-free
    assert y_tf.shape == y_ft.shape
    np.testing.assert_allclose(np.asarray(y_tf), np.asarray(y_ft),
                               rtol=0, atol=2e-5)


def test_grad_parity(io_tensors):
    mix, mouth = io_tensors
    m_tf, m_ft = _mk("tf"), _mk("ft")
    variables = m_tf.init(jax.random.PRNGKey(0), mix, mouth)
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}

    def loss(m):
        def f(p):
            y = m.apply({"params": p, **rest}, mix, mouth, train=False)
            return jnp.mean(jnp.square(y))
        return f

    g_tf = jax.grad(loss(m_tf))(params)
    g_ft = jax.grad(loss(m_ft))(params)
    for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_tf),
            jax.tree_util.tree_leaves_with_path(g_ft)):
        assert p1 == p2
        scale = max(1e-3, float(jnp.abs(a).max()))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=5e-4 * scale, err_msg=str(p1))


def test_audio_only_parity(io_tensors):
    mix, _ = io_tensors
    over = dict(video_params={}, fusion_params={})
    m_tf, m_ft = _mk("tf", **over), _mk("ft", **over)
    variables = m_tf.init(jax.random.PRNGKey(0), mix, None)
    y_tf = m_tf.apply(variables, mix, None)
    y_ft = m_ft.apply(variables, mix, None)
    np.testing.assert_allclose(np.asarray(y_tf), np.asarray(y_ft),
                               rtol=0, atol=2e-5)


def test_dptnet_ft(io_tensors):
    mix, _ = io_tensors
    over = dict(
        audio_params={
            "audio_net": "DPTNet", "hid_chan": 8, "repeats": 2,
            "shared": True, "is2d": True,
            "layers": {
                "layer_1": {"layer_type": "DualPathRNN", "hid_chan": 4,
                            "dim": 4, "kernel_size": 8, "stride": 1,
                            "rnn_type": "GRU", "num_layers": 1,
                            "bidirectional": True}},
        },
        video_params={},
        fusion_params={},
    )
    m_tf = AVNet(tf_order="tf", **tiny_rtfs_conf(**over))
    m_ft = AVNet(tf_order="ft", **tiny_rtfs_conf(**over))
    variables = m_tf.init(jax.random.PRNGKey(0), mix, None)
    y_tf = m_tf.apply(variables, mix, None)
    y_ft = m_ft.apply(variables, mix, None)
    np.testing.assert_allclose(np.asarray(y_tf), np.asarray(y_ft),
                               rtol=0, atol=2e-5)
