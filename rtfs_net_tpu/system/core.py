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
    # Video backbone variables ride in the state (not baked as jit
    # constants): smaller executables, faster compiles, and
    # train_video_model=True can actually update them (reference
    # core.py:86-89 gates no_grad on the flag).
    video_params: Any = None
    video_stats: Any = None


class System:
    """Owns the model/optimizer/losses and builds the pure step functions.

    loss_func routing matches the reference (train.py:98-101): train =
    PIT neg-SNR, val = PIT neg-SI-SDR.

    The video backbone is passed as ``video_model`` (a flax module) +
    ``video_variables`` (its params/batch_stats); they are threaded through
    ``TrainState`` so the jitted steps see them as inputs. When
    ``train_video_model`` is True the optimizer state covers
    ``{"model", "video"}`` and video params receive updates; BN stats stay
    frozen either way (reference ``frcnn_videomodel.py:78-83`` pins BN to
    eval even when the backbone trains). ``video_apply`` (a host closure)
    remains supported for callers that manage the backbone themselves.
    """

    def __init__(
        self,
        model,
        optimizer: optax.GradientTransformation,
        loss_func: Dict[str, Callable],
        video_apply: Optional[Callable] = None,
        video_model=None,
        video_variables: Optional[Dict] = None,
        train_video_model: bool = False,
        grad_clip: float = 5.0,
        data_axis: Optional[str] = None,
        compute_dtype=None,
        accum_steps: int = 1,
        online_mix: bool = False,
    ):
        self.model = model
        self.optimizer = optimizer
        self.loss_func = loss_func
        self.video_apply = video_apply
        self.video_model = video_model
        self.video_variables = video_variables
        self.train_video_model = train_video_model
        self.grad_clip = grad_clip
        self.data_axis = data_axis
        # mixed precision: params/grads/loss stay fp32, activations run in
        # compute_dtype (e.g. jnp.bfloat16); the modules follow the input
        # dtype and norms accumulate stats in fp32 internally
        self.compute_dtype = compute_dtype
        # microbatch gradient accumulation: a global batch B runs as
        # accum_steps sequential microbatches of B/accum_steps inside one
        # jitted step (lax.scan), trading step latency for peak HBM — any
        # global batch trains within memory
        self.accum_steps = int(accum_steps)
        # energy-matched within-batch remix augmentation on the audio-only
        # train path (reference core.py:96-98 applies it when
        # config["training"]["online_mix"] and no video model); runs inside
        # the jitted step with the step rng
        self.online_mix = bool(online_mix)

    @property
    def _trains_video(self) -> bool:
        return bool(self.train_video_model and self.video_model is not None)

    # ---------------------------------------------------------------- init
    def init_state(self, rng, sample_mix, sample_mouth=None) -> TrainState:
        video_params = None
        video_stats = None
        if self.video_model is not None:
            vv = self.video_variables or {}
            video_params = vv.get("params")
            video_stats = vv.get("batch_stats", {})
        mouth_emb = None
        if sample_mouth is not None:
            mouth_emb = self._video_embed(video_params, video_stats, sample_mouth)
        variables = self.model.init(rng, sample_mix, mouth_emb)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        if self._trains_video:
            opt_state = self.optimizer.init({"model": params, "video": video_params})
        else:
            opt_state = self.optimizer.init(params)
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
            video_params=video_params,
            video_stats=video_stats,
        )

    def _video_embed(self, video_params, video_stats, mouths):
        """Video branch forward. BN always runs frozen (running stats) —
        reference frcnn_videomodel.py:78-83 keeps BN in eval even when the
        backbone trains."""
        if self.video_model is None:
            if self.video_apply is not None:
                return self.video_apply(mouths)
            return mouths
        variables = {"params": video_params}
        if video_stats:
            variables["batch_stats"] = video_stats
        return self.video_model.apply(variables, mouths)

    def mouth_embedding(self, mouths, state: Optional[TrainState] = None):
        """Frozen video branch (reference core.py:88-89 runs it under
        no_grad); identity when no video model is configured."""
        vp = state.video_params if state is not None else (
            (self.video_variables or {}).get("params"))
        vs = state.video_stats if state is not None else (
            (self.video_variables or {}).get("batch_stats", {}))
        emb = self._video_embed(vp, vs, mouths)
        if not self.train_video_model:
            emb = lax.stop_gradient(emb)
        return emb

    # --------------------------------------------------------------- steps
    def _forward(self, params, batch_stats, mix, mouths, train: bool, rng,
                 video_params=None, video_stats=None):
        # scan-unroll (unrolled recurrences win ~13% at inference, hurt the
        # differentiated backward) is picked inside DualPathRNN from the
        # `train` flag — no cross-System global involved.
        if self.compute_dtype is not None:
            mix = mix.astype(self.compute_dtype)
            if mouths is not None:
                mouths = mouths.astype(self.compute_dtype)
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        mouth_emb = None
        if mouths is not None:
            mouth_emb = self._video_embed(video_params, video_stats, mouths)
            if not self.train_video_model:
                mouth_emb = lax.stop_gradient(mouth_emb)
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
        if self.online_mix and mouths is None:
            # audio-only remix augmentation (reference core.py:96-98):
            # the mixture is REPLACED by a fresh sum of energy-matched,
            # batch-permuted sources
            rng, mix_rng = jax.random.split(rng)
            mix, targets = online_mixing_collate(mix_rng, targets)
        trains_video = self._trains_video

        def loss_fn(trainable):
            if trains_video:
                params, vparams = trainable["model"], trainable["video"]
            else:
                params, vparams = trainable, state.video_params
            est, new_stats = self._forward(
                params, state.batch_stats, mix, mouths, True, rng,
                video_params=vparams, video_stats=state.video_stats)
            loss = self.loss_func["train"](est, targets)
            return loss, new_stats

        trainable = ({"model": state.params, "video": state.video_params}
                     if trains_video else state.params)
        if self.accum_steps > 1:
            loss, new_stats, grads = self._accumulated_grads(
                trainable, state, (mix, targets, mouths), rng, trains_video)
        else:
            (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(trainable)
        if self.data_axis is not None:
            grads = lax.pmean(grads, self.data_axis)
            loss = lax.pmean(loss, self.data_axis)
        if self.grad_clip:
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, self.grad_clip / (gnorm + 1e-6))
            grads = jax.tree.map(lambda g: g * scale, grads)
        else:
            gnorm = optax.global_norm(grads)
        updates, new_opt_state = self.optimizer.update(grads, state.opt_state, trainable)
        new_trainable = optax.apply_updates(trainable, updates)
        if trains_video:
            new_params = new_trainable["model"]
            new_video_params = new_trainable["video"]
        else:
            new_params = new_trainable
            new_video_params = state.video_params
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
            video_params=new_video_params,
        )
        return new_state, {"loss": loss, "grad_norm": gnorm}

    def _accumulated_grads(self, trainable, state, batch, rng, trains_video):
        """Microbatched grads: ``lax.scan`` over ``accum_steps`` slices of
        the batch, mean of losses/grads (equivalent to the full-batch
        gradient for mean losses). BN stats thread through the scan carry
        so each microbatch sees the previous one's running stats."""
        mix, targets, mouths = batch
        A = self.accum_steps
        B = mix.shape[0]
        if B % A:
            raise ValueError(f"batch {B} not divisible by accum_steps {A}")

        def split(x):
            return (None if x is None
                    else x.reshape((A, B // A) + x.shape[1:]))

        micro = tuple(split(x) for x in (mix, targets, mouths))
        rngs = (jax.random.split(rng, A) if rng is not None
                else jnp.zeros((A, 2), jnp.uint32))

        def loss_for(tr, stats, mb, r):
            if trains_video:
                params, vparams = tr["model"], tr["video"]
            else:
                params, vparams = tr, state.video_params
            m, t, mo = mb
            est, new_stats = self._forward(
                params, stats, m, mo, True, r,
                video_params=vparams, video_stats=state.video_stats)
            return self.loss_func["train"](est, t), new_stats

        zero_grads = jax.tree.map(jnp.zeros_like, trainable)

        def body(carry, xs):
            stats, grad_acc, loss_acc = carry
            mb_mix, mb_tgt, mb_mouth, r = xs
            (loss, new_stats), g = jax.value_and_grad(
                loss_for, has_aux=True)(trainable, stats, (mb_mix, mb_tgt, mb_mouth), r)
            grad_acc = jax.tree.map(jnp.add, grad_acc, g)
            return (new_stats, grad_acc, loss_acc + loss), None

        xs = micro + (rngs,)
        (new_stats, grads, loss_sum), _ = lax.scan(
            body, (state.batch_stats, zero_grads, jnp.zeros(())), xs)
        inv = 1.0 / A
        grads = jax.tree.map(lambda g: g * inv, grads)
        return loss_sum * inv, new_stats, grads

    def val_step(self, state: TrainState, batch) -> Dict:
        mix, targets, mouths = batch
        if targets.ndim == 2:
            targets = targets[:, None, :]
        est, _ = self._forward(state.params, state.batch_stats, mix, mouths,
                               False, None, video_params=state.video_params,
                               video_stats=state.video_stats)
        loss = self.loss_func["val"](est, targets)
        if self.data_axis is not None:
            loss = lax.pmean(loss, self.data_axis)
        return {"val_loss": loss}

    # ---------------------------------------------------------- inference
    def separate(self, state: TrainState, mix, mouths=None):
        est, _ = self._forward(state.params, state.batch_stats, mix, mouths,
                               False, None, video_params=state.video_params,
                               video_stats=state.video_stats)
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
