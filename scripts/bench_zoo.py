"""Zoo serving benchmark: per-utterance latency of all four headline
configs on the real chip, bf16 at serving batch 128 (vs the paper's
published per-utterance GPU latency). Run from anywhere."""
import os, sys, yaml, numpy as np
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)
from rtfs_net_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
from rtfs_net_tpu.models import AVNet
from rtfs_net_tpu.utils.profiling import timed

rng = np.random.default_rng(0)
B, L, TV = 128, 32000, 50
pool = [jnp.asarray(rng.standard_normal((B, L)).astype(np.float32)) for _ in range(4)]
mouth = jnp.asarray(rng.standard_normal((B, 512, TV)).astype(np.float32) * 0.1)

for name, paper_ms in [("lrs2_RTFSNet_4_layer", 57.8), ("lrs2_RTFSNet_6_layer", 64.7),
                       ("lrs2_RTFSNet_12_layer", 109.9), ("lrs2_CTCNet_16_layer", 122.7)]:
    conf = yaml.safe_load(open(f"rtfs_net_tpu/configs/{name}.yaml"))
    model = AVNet(**conf["audionet"])
    v = jax.jit(model.init)(jax.random.PRNGKey(0), pool[0][:1], mouth[:1])
    fwd = jax.jit(lambda vv, m, mo: model.apply(
        vv, m.astype(jnp.bfloat16), mo.astype(jnp.bfloat16)).astype(jnp.float32))
    fwd(v, pool[0], mouth)
    st = timed(lambda m: fwd(v, m, mouth),
               make_args=lambda i: (pool[i % len(pool)] + float(i)*1e-6,), iters=5)
    ms_utt = st['min_ms']/B
    print(f"{name}: {ms_utt:.2f} ms/utt ({B/(st['min_ms']/1e3):.0f} utt/s) paper {paper_ms} -> {paper_ms/ms_utt:.1f}x")
