#!/usr/bin/env python
"""Stage-level timing of the RTFS-4 forward on the real TPU: times each
component at its true in-graph shapes to locate the bottleneck."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def bench(name, fn, *args, iters=20):
    fn = jax.jit(fn)
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:42s} {dt:8.2f} ms")
    return dt


def main():
    from rtfs_net_tpu.models import layers as L
    from rtfs_net_tpu.models.separators.tdanet import TDANetBlock
    from rtfs_net_tpu.models.encoders import STFTEncoder
    from rtfs_net_tpu.models.decoders import STFTDecoder
    from rtfs_net_tpu.ops.rnn import SRU

    B = 8
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    def mk(shape):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32))

    print(f"batch={B}  device={jax.devices()[0]}")

    # 1. encoder / decoder
    enc = STFTEncoder(win=256, hop_length=128, out_chan=256, kernel_size=3,
                      stride=1, bias=False, act_type=None, norm_type=None)
    x = mk((B, 32000))
    venc = enc.init(key, x)
    bench("STFTEncoder (stft + conv3x3 2->256)", lambda v, x: enc.apply(v, x), venc, x)

    dec = STFTDecoder(win=256, hop_length=128, in_chan=256, n_src=1,
                      kernel_size=3, stride=1, bias=False)
    semb = mk((B, 1, 256, 251, 129))
    vdec = dec.init(key, semb, (B, 32000))
    bench("STFTDecoder", lambda v, s: dec.apply(v, s, (B, 32000)), vdec, semb)

    # 2. full TDANet block at bottleneck shapes
    layers_conf = {
        "layer_1": {"layer_type": "DualPathRNN", "hid_chan": 32, "dim": 4,
                    "kernel_size": 8, "stride": 1, "rnn_type": "SRU",
                    "num_layers": 4, "bidirectional": True},
        "layer_2": {"layer_type": "DualPathRNN", "hid_chan": 32, "dim": 3,
                    "kernel_size": 8, "stride": 1, "rnn_type": "SRU",
                    "num_layers": 4, "bidirectional": True},
        "layer_3": {"layer_type": "MultiHeadSelfAttention2D", "dim": 3,
                    "n_freqs": 64, "n_head": 4, "hid_chan": 4,
                    "act_type": "PReLU", "norm_type": "LayerNormalization4D"},
    }
    blk = TDANetBlock(in_chan=256, hid_chan=64, kernel_size=4, stride=2,
                      norm_type="gLN", act_type="PReLU", upsampling_depth=2,
                      layers=layers_conf, is2d=True)
    xb = mk((B, 256, 251, 129))
    vblk = jax.jit(blk.init)(key, xb)
    t_blk = bench("TDANetBlock (one RTFS repeat)", lambda v, x: blk.apply(v, x), vblk, xb)

    # 3. the globalatt pieces at pooled shapes (B, 64, 125, 64)
    g = mk((B, 64, 125, 64))
    dp4 = L.DualPathRNN(in_chan=64, hid_chan=32, dim=4, kernel_size=8,
                        stride=1, rnn_type="SRU", num_layers=4, bidirectional=True)
    v4 = jax.jit(dp4.init)(key, g)
    bench("DualPathRNN freq-axis (seq 57, B*125)", lambda v, x: dp4.apply(v, x), v4, g)

    dp3 = L.DualPathRNN(in_chan=64, hid_chan=32, dim=3, kernel_size=8,
                        stride=1, rnn_type="SRU", num_layers=4, bidirectional=True)
    v3 = jax.jit(dp3.init)(key, g)
    bench("DualPathRNN time-axis (seq 118, B*64)", lambda v, x: dp3.apply(v, x), v3, g)

    mh = L.MultiHeadSelfAttention2D(in_chan=64, n_freqs=64, n_head=4,
                                    hid_chan=4, dim=3)
    vmh = jax.jit(mh.init)(key, g)
    bench("MHSA2D (T=125 attn, E*F=256 keys)", lambda v, x: mh.apply(v, x), vmh, g)

    # 4. raw SRU stack at the two folded-batch shapes
    for name, (Lseq, Bfold) in {
        "SRU 4L bidir (57, 1000, 512)": (57, B * 125),
        "SRU 4L bidir (118, 512, 512)": (118, B * 64),
    }.items():
        s = mk((Lseq, Bfold, 512))
        sru = SRU(512, 32, num_layers=4, bidirectional=True)
        vs = jax.jit(sru.init)(key, s)
        bench(name, lambda v, x: sru.apply(v, x), vs, s)

    # 5. gateway/pyramid convs of the block alone (grouped convs at 251x129)
    cn = L.ConvNormAct(in_chan=256, out_chan=256, kernel_size=1, groups=256,
                       act_type="PReLU", is2d=True)
    vcn = cn.init(key, xb)
    bench("gateway DW 1x1 conv (256ch, 251x129)", lambda v, x: cn.apply(v, x), vcn, xb)

    dw = L.ConvNormAct(in_chan=64, out_chan=64, kernel_size=4, stride=2,
                       groups=64, norm_type="gLN", is2d=True)
    xd = mk((B, 64, 251, 129))
    vdw = dw.init(key, xd)
    bench("downsample DW 4x4 s2 (64ch)", lambda v, x: dw.apply(v, x), vdw, xd)

    print(f"\n4 repeats x TDANetBlock = {4 * t_blk:.1f} ms (fwd total was ~90 ms)")


if __name__ == "__main__":
    main()
