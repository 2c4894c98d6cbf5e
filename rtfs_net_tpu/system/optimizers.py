"""Optimizer factory (reference: ``src/system/optimizers.py:58-108`` — a
string registry over torch.optim + torch_optimizer extras; AdamW is what
every active config uses).

Built on optax. The learning rate is injected via
``optax.inject_hyperparams`` so the ReduceLROnPlateau scheduler can mutate
it in the optimizer state without recompiling the train step.
"""
from __future__ import annotations

import jax.numpy as jnp
import optax


def make_optimizer(optimizer: str = "adamw", lr: float = 1e-3,
                   weight_decay: float = 0.0, momentum: float = 0.0,
                   betas=(0.9, 0.999), eps: float = 1e-8,
                   **kwargs) -> optax.GradientTransformation:
    """Build an optax optimizer by name (case-insensitive, torch-style
    hyperparameter names). The returned transformation is wrapped in
    ``inject_hyperparams`` so ``state.hyperparams['learning_rate']`` is a
    mutable leaf (used by ReduceLROnPlateau / halving schedules)."""
    name = optimizer.lower()

    def build(learning_rate):
        if name == "adamw":
            return optax.adamw(learning_rate, b1=betas[0], b2=betas[1],
                               eps=eps, weight_decay=weight_decay)
        if name == "adam":
            return optax.adam(learning_rate, b1=betas[0], b2=betas[1], eps=eps)
        if name == "sgd":
            opt = optax.sgd(learning_rate, momentum=momentum or None)
            if weight_decay:
                opt = optax.chain(optax.add_decayed_weights(weight_decay), opt)
            return opt
        if name == "rmsprop":
            return optax.rmsprop(learning_rate, momentum=momentum, eps=eps)
        if name == "adagrad":
            return optax.adagrad(learning_rate, eps=eps)
        if name == "adamax":
            return optax.adamax(learning_rate, b1=betas[0], b2=betas[1], eps=eps)
        if name == "radam":
            return optax.radam(learning_rate, b1=betas[0], b2=betas[1], eps=eps)
        if name in ("adabelief",):
            return optax.adabelief(learning_rate, b1=betas[0], b2=betas[1], eps=eps)
        if name in ("lamb",):
            return optax.lamb(learning_rate, b1=betas[0], b2=betas[1], eps=eps,
                              weight_decay=weight_decay)
        if name in ("lars",):
            return optax.lars(learning_rate, weight_decay=weight_decay,
                              momentum=momentum)
        if name in ("novograd",):
            return optax.novograd(learning_rate, b1=betas[0], b2=betas[1],
                                  eps=eps, weight_decay=weight_decay)
        if name in ("yogi",):
            return optax.yogi(learning_rate, b1=betas[0], b2=betas[1], eps=eps)
        if name in ("sm3",):
            return optax.sm3(learning_rate)
        if name in ("adafactor",):
            return optax.adafactor(learning_rate)
        if name in ("fromage",):
            return optax.fromage(learning_rate)
        if name in ("lion",):
            return optax.lion(learning_rate, weight_decay=weight_decay)
        raise ValueError(f"Could not interpret optimizer identifier: {optimizer}")

    return optax.inject_hyperparams(
        lambda learning_rate: build(learning_rate)
    )(learning_rate=lr)


def get_lr(opt_state) -> float:
    """Read the injected learning rate back out of the optimizer state."""
    return float(opt_state.hyperparams["learning_rate"])


def set_lr(opt_state, lr: float):
    """Return the optimizer state with the learning rate replaced."""
    cur = opt_state.hyperparams["learning_rate"]
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.asarray(cur).dtype)
    return opt_state
