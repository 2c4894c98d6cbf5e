"""On-chip AV training proof: raw mouths -> trainable ResNet backbone ->
CAF fusion overfits a small batch with train_video_model=True (video
params verified to update). Run from anywhere."""
import os, sys, yaml, numpy as np, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)
from rtfs_net_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
from rtfs_net_tpu.models import AVNet
from rtfs_net_tpu.models.videomodels import FRCNNVideoModel
from rtfs_net_tpu.losses import PITLossWrapper, pairwise_neg_snr, pairwise_neg_sisdr
from rtfs_net_tpu.system import System, make_optimizer

conf = yaml.safe_load(open("rtfs_net_tpu/configs/lrs2_RTFSNet_4_layer.yaml"))
rng = np.random.default_rng(0)
B, L, TV = 2, 32000, 50
src = jnp.asarray(rng.standard_normal((B, L)).astype(np.float32))
noise = jnp.asarray(rng.standard_normal((B, L)).astype(np.float32))
mix = src + 0.5 * noise
mouths = jnp.asarray(rng.standard_normal((B, 1, TV, 88, 88)).astype(np.float32) * 0.3)

vmodel = FRCNNVideoModel(backbone_type="resnet", relu_type="prelu")
vvars = jax.jit(vmodel.init)(jax.random.PRNGKey(1), mouths[:1])
model = AVNet(**conf["audionet"])
system = System(model, make_optimizer("adamw", lr=1e-3, weight_decay=0.1),
                {"train": PITLossWrapper(pairwise_neg_snr),
                 "val": PITLossWrapper(pairwise_neg_sisdr)},
                video_model=vmodel, video_variables=vvars,
                train_video_model=True, compute_dtype=jnp.bfloat16)
state = system.init_state(jax.random.PRNGKey(0), mix[:1], mouths[:1])
step = jax.jit(system.train_step)
batch = (mix, src[:, None], mouths)
key = jax.random.PRNGKey(2)
t0 = time.time()
losses = []
for i in range(120):
    key, sub = jax.random.split(key)
    state, m = step(state, batch, sub)
    if i % 20 == 0 or i == 119:
        l = float(m["loss"])
        losses.append(l)
        print(f"step {i}: loss {l:.2f} ({time.time()-t0:.0f}s)")
v0 = jax.tree.leaves(vvars["params"])[0]
v1 = jax.tree.leaves(state.video_params)[0]
print("video params updated:", not np.allclose(np.asarray(v0), np.asarray(v1)))
print("SI-SDR proxy: start", -losses[0], "end", -losses[-1])
