"""Training system core (reference: ``src/system/core.py`` — the Lightning
``System`` module).

TPU-native restructuring: instead of a stateful module + framework trainer,
the system is a pair of **pure step functions** (train/val) over an explicit
``TrainState`` pytree, compiled once with ``jax.jit`` (single chip) or
``shard_map`` over a ``data`` mesh axis (multi chip — see
``rtfs_net_tpu.parallel``). Gradient sync = ``lax.pmean`` over the axis
(the reference's DDP all-reduce); grad-clip 5.0 applied after sync
(the reference's ``Trainer(gradient_clip_val=5.0)``, train.py:142).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax import lax


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


class System:
    """Owns the model/optimizer/losses and builds the pure step functions.

    loss_func routing matches the reference (train.py:98-101): train =
    PIT neg-SNR, val = PIT neg-SI-SDR.
    """

    def __init__(
        self,
        model,
        optimizer: optax.GradientTransformation,
        loss_func: Dict[str, Callable],
        video_apply: Optional[Callable] = None,
        train_video_model: bool = False,
        grad_clip: float = 5.0,
        data_axis: Optional[str] = None,
        compute_dtype=None,
    ):
        self.model = model
        self.optimizer = optimizer
        self.loss_func = loss_func
        self.video_apply = video_apply
        self.train_video_model = train_video_model
        self.grad_clip = grad_clip
        self.data_axis = data_axis
        # mixed precision: params/grads/loss stay fp32, activations run in
        # compute_dtype (e.g. jnp.bfloat16); the modules follow the input
        # dtype and norms accumulate stats in fp32 internally
        self.compute_dtype = compute_dtype

    # ---------------------------------------------------------------- init
    def init_state(self, rng, sample_mix, sample_mouth=None) -> TrainState:
        mouth_emb = None
        if sample_mouth is not None:
            mouth_emb = self.mouth_embedding(sample_mouth)
        variables = self.model.init(rng, sample_mix, mouth_emb)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        opt_state = self.optimizer.init(params)
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
        )

    def mouth_embedding(self, mouths):
        """Frozen video branch (reference core.py:88-89 runs it under
        no_grad); identity when no video model is configured."""
        if self.video_apply is None:
            return mouths
        emb = self.video_apply(mouths)
        if not self.train_video_model:
            emb = lax.stop_gradient(emb)
        return emb

    # --------------------------------------------------------------- steps
    def _forward(self, params, batch_stats, mix, mouths, train: bool, rng):
        if self.compute_dtype is not None:
            mix = mix.astype(self.compute_dtype)
            if mouths is not None:
                mouths = mouths.astype(self.compute_dtype)
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        mouth_emb = self.mouth_embedding(mouths) if mouths is not None else None
        kwargs = {}
        mutable = False
        if train:
            kwargs["rngs"] = {"dropout": rng}
            if batch_stats:
                mutable = ["batch_stats"]
        out = self.model.apply(
            variables, mix, mouth_emb, train=train, mutable=mutable, **kwargs
        )
        if mutable:
            est, updates = out
            est = est.astype(jnp.float32)
            return est, updates.get("batch_stats", batch_stats)
        return out.astype(jnp.float32), batch_stats

    def train_step(self, state: TrainState, batch, rng) -> Tuple[TrainState, Dict]:
        mix, targets, mouths = batch
        if targets.ndim == 2:
            targets = targets[:, None, :]

        def loss_fn(params):
            est, new_stats = self._forward(params, state.batch_stats, mix, mouths, True, rng)
            loss = self.loss_func["train"](est, targets)
            return loss, new_stats

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        if self.data_axis is not None:
            grads = lax.pmean(grads, self.data_axis)
            loss = lax.pmean(loss, self.data_axis)
        if self.grad_clip:
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, self.grad_clip / (gnorm + 1e-6))
            grads = jax.tree.map(lambda g: g * scale, grads)
        else:
            gnorm = optax.global_norm(grads)
        updates, new_opt_state = self.optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        return new_state, {"loss": loss, "grad_norm": gnorm}

    def val_step(self, state: TrainState, batch) -> Dict:
        mix, targets, mouths = batch
        if targets.ndim == 2:
            targets = targets[:, None, :]
        est, _ = self._forward(state.params, state.batch_stats, mix, mouths, False, None)
        loss = self.loss_func["val"](est, targets)
        if self.data_axis is not None:
            loss = lax.pmean(loss, self.data_axis)
        return {"val_loss": loss}

    # ---------------------------------------------------------- inference
    def separate(self, state: TrainState, mix, mouths=None):
        est, _ = self._forward(state.params, state.batch_stats, mix, mouths, False, None)
        return est


def online_mixing_collate(rng, targets):
    """Energy-matched within-batch source remix augmentation
    (reference core.py:185-201). targets: (B, n_src, T) -> (mix, targets)."""
    B, n_src, T = targets.shape
    energies = jnp.sum(targets ** 2, axis=-1, keepdims=True)
    new_src = []
    for i in range(n_src):
        rng, sub = jax.random.split(rng)
        perm = jax.random.permutation(sub, B)
        s = targets[perm, i, :]
        s = s * jnp.sqrt(energies[:, i] / (jnp.sum(s ** 2, -1, keepdims=True) + 1e-8))
        new_src.append(s)
    targets = jnp.stack(new_src, axis=1)
    return targets.sum(1), targets
