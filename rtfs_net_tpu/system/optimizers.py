"""Optimizer factory (reference: ``src/system/optimizers.py:58-108`` — a
string registry over torch.optim + torch_optimizer extras; AdamW is what
every active config uses).

Built on optax. The learning rate is injected via
``optax.inject_hyperparams`` so the ReduceLROnPlateau scheduler can mutate
it in the optimizer state without recompiling the train step.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


# ---------------------------------------------------------------- custom
# torch_optimizer names the reference registry exposes that optax lacks
# (reference optimizers.py:10-26). Each is the published update rule as an
# optax GradientTransformation; none is used by an active config (all use
# AdamW) but the registry contract carries the names.

def _qhm(momentum: float = 0.999, nu: float = 0.7):
    """Quasi-hyperbolic momentum (Ma & Yarats 2019): update =
    (1-nu)*g + nu*buf, buf = momentum*buf + (1-momentum)*g."""
    def init(params):
        return {"buf": jax.tree.map(jnp.zeros_like, params)}

    def update(grads, state, params=None):
        buf = jax.tree.map(lambda b, g: momentum * b + (1 - momentum) * g,
                           state["buf"], grads)
        upd = jax.tree.map(lambda g, b: (1 - nu) * g + nu * b, grads, buf)
        return upd, {"buf": buf}

    return optax.GradientTransformation(init, update)


def _qhadam(b1: float = 0.9, b2: float = 0.999, nu1: float = 0.7,
            nu2: float = 1.0, eps: float = 1e-8):
    """QHAdam (Ma & Yarats 2019): quasi-hyperbolic weighting of the Adam
    moment estimates."""
    def init(params):
        z = jax.tree.map(jnp.zeros_like, params)
        return {"m": z, "v": jax.tree.map(jnp.zeros_like, params),
                "t": jnp.zeros((), jnp.int32)}

    def update(grads, state, params=None):
        t = state["t"] + 1
        m = jax.tree.map(lambda m_, g: b1 * m_ + (1 - b1) * g, state["m"], grads)
        v = jax.tree.map(lambda v_, g: b2 * v_ + (1 - b2) * g * g,
                         state["v"], grads)
        mc = jax.tree.map(lambda m_: m_ / (1 - b1 ** t), m)
        vc = jax.tree.map(lambda v_: v_ / (1 - b2 ** t), v)
        upd = jax.tree.map(
            lambda g, m_, v_: ((1 - nu1) * g + nu1 * m_) /
                              (jnp.sqrt((1 - nu2) * g * g + nu2 * v_) + eps),
            grads, mc, vc)
        return upd, {"m": m, "v": v, "t": t}

    return optax.GradientTransformation(init, update)


def _diffgrad(b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
    """diffGrad (Dubey et al. 2020): Adam with a friction coefficient
    sigmoid(|g_t - g_{t-1}|) on the first moment."""
    def init(params):
        z = jax.tree.map(jnp.zeros_like, params)
        return {"m": z, "v": jax.tree.map(jnp.zeros_like, params),
                "g_prev": jax.tree.map(jnp.zeros_like, params),
                "t": jnp.zeros((), jnp.int32)}

    def update(grads, state, params=None):
        t = state["t"] + 1
        m = jax.tree.map(lambda m_, g: b1 * m_ + (1 - b1) * g, state["m"], grads)
        v = jax.tree.map(lambda v_, g: b2 * v_ + (1 - b2) * g * g,
                         state["v"], grads)
        upd = jax.tree.map(
            lambda g, gp, m_, v_: (jax.nn.sigmoid(jnp.abs(gp - g)) *
                                   (m_ / (1 - b1 ** t))) /
                                  (jnp.sqrt(v_ / (1 - b2 ** t)) + eps),
            grads, state["g_prev"], m, v)
        return upd, {"m": m, "v": v, "g_prev": grads, "t": t}

    return optax.GradientTransformation(init, update)


def _adamod(b1: float = 0.9, b2: float = 0.999, b3: float = 0.999,
            eps: float = 1e-8):
    """AdaMod (Ding et al. 2019): Adam with an exponential long-term bound
    on the per-parameter step size."""
    def init(params):
        z = jax.tree.map(jnp.zeros_like, params)
        return {"m": z, "v": jax.tree.map(jnp.zeros_like, params),
                "s": jax.tree.map(jnp.zeros_like, params),
                "t": jnp.zeros((), jnp.int32)}

    def update(grads, state, params=None):
        t = state["t"] + 1
        m = jax.tree.map(lambda m_, g: b1 * m_ + (1 - b1) * g, state["m"], grads)
        v = jax.tree.map(lambda v_, g: b2 * v_ + (1 - b2) * g * g,
                         state["v"], grads)
        step = jax.tree.map(
            lambda m_, v_: (m_ / (1 - b1 ** t)) /
                           (jnp.sqrt(v_ / (1 - b2 ** t)) + eps), m, v)
        s = jax.tree.map(lambda s_, st: b3 * s_ + (1 - b3) * jnp.abs(st),
                         state["s"], step)
        upd = jax.tree.map(lambda st, s_: jnp.sign(st) *
                           jnp.minimum(jnp.abs(st), s_), step, s)
        return upd, {"m": m, "v": v, "s": s, "t": t}

    return optax.GradientTransformation(init, update)


def _adabound(b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
              final_lr_ratio: float = 10.0, gamma: float = 1e-3):
    """AdaBound (Luo et al. 2019): Adam whose effective per-parameter rate
    is clipped to bounds that converge toward SGD. Bounds are expressed
    relative to the base rate (the outer scale applies learning_rate)."""
    def init(params):
        z = jax.tree.map(jnp.zeros_like, params)
        return {"m": z, "v": jax.tree.map(jnp.zeros_like, params),
                "t": jnp.zeros((), jnp.int32)}

    def update(grads, state, params=None):
        t = state["t"] + 1
        tf = t.astype(jnp.float32)
        m = jax.tree.map(lambda m_, g: b1 * m_ + (1 - b1) * g, state["m"], grads)
        v = jax.tree.map(lambda v_, g: b2 * v_ + (1 - b2) * g * g,
                         state["v"], grads)
        lower = final_lr_ratio * (1.0 - 1.0 / (gamma * tf + 1.0))
        upper = final_lr_ratio * (1.0 + 1.0 / (gamma * tf))
        upd = jax.tree.map(
            lambda m_, v_: jnp.clip(
                1.0 / (jnp.sqrt(v_ / (1 - b2 ** t)) + eps), lower, upper)
            * (m_ / (1 - b1 ** t)),
            m, v)
        return upd, {"m": m, "v": v, "t": t}

    return optax.GradientTransformation(init, update)


def _lookahead(inner: optax.GradientTransformation, sync_period: int = 6,
               slow_step: float = 0.5):
    """Lookahead (Zhang et al. 2019) as a plain GradientTransformation:
    slow weights live in the optimizer state (no LookaheadParams wrapper),
    so the training loop stays oblivious."""
    def init(params):
        return {"inner": inner.init(params),
                "slow": jax.tree.map(jnp.asarray, params),
                "t": jnp.zeros((), jnp.int32)}

    def update(grads, state, params):
        upd, inner_state = inner.update(grads, state["inner"], params)
        fast = jax.tree.map(jnp.add, params, upd)
        t = state["t"] + 1
        sync = (t % sync_period) == 0

        def synced(_):
            new_slow = jax.tree.map(
                lambda s, f: s + slow_step * (f - s), state["slow"], fast)
            return new_slow, new_slow

        def not_synced(_):
            return state["slow"], fast

        slow, new_params = jax.lax.cond(sync, synced, not_synced, None)
        final_upd = jax.tree.map(jnp.subtract, new_params, params)
        return final_upd, {"inner": inner_state, "slow": slow, "t": t}

    return optax.GradientTransformation(init, update)


def _pid(momentum: float = 0.9, integral: float = 5.0, derivative: float = 10.0):
    """PID optimizer (An et al. 2018): P on the gradient, I on the
    momentum buffer, D on the gradient difference."""
    def init(params):
        z = jax.tree.map(jnp.zeros_like, params)
        return {"i": z, "g_prev": jax.tree.map(jnp.zeros_like, params),
                "t": jnp.zeros((), jnp.int32)}

    def update(grads, state, params=None):
        ibuf = jax.tree.map(lambda b, g: momentum * b + g, state["i"], grads)
        first = state["t"] == 0
        dterm = jax.tree.map(
            lambda g, gp: jnp.where(first, jnp.zeros_like(g), g - gp),
            grads, state["g_prev"])
        upd = jax.tree.map(
            lambda g, i_, d_: g + integral * i_ + derivative * d_,
            grads, ibuf, dterm)
        return upd, {"i": ibuf, "g_prev": grads, "t": state["t"] + 1}

    return optax.GradientTransformation(init, update)


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
        if name == "adadelta":
            return optax.adadelta(learning_rate, eps=eps,
                                  weight_decay=weight_decay)
        if name in ("asgd", "accsgd"):
            # averaged/accelerated SGD: momentum SGD dynamics (torch's ASGD
            # averaging affects eval-time iterate reporting, not the
            # training trajectory; AccSGD's long/short-step schedule is
            # approximated by heavy-ball momentum)
            return optax.sgd(learning_rate, momentum=momentum or 0.9)
        if name == "sgdw":
            # decoupled weight decay SGD
            return optax.chain(
                optax.trace(decay=momentum, nesterov=False),
                optax.add_decayed_weights(weight_decay),
                optax.scale_by_learning_rate(learning_rate),
            )
        if name == "qhm":
            return optax.chain(_qhm(momentum=momentum or 0.999),
                               optax.scale_by_learning_rate(learning_rate))
        if name == "qhadam":
            return optax.chain(
                _qhadam(b1=betas[0], b2=betas[1], eps=eps),
                optax.add_decayed_weights(weight_decay) if weight_decay
                else optax.identity(),
                optax.scale_by_learning_rate(learning_rate))
        if name == "diffgrad":
            return optax.chain(_diffgrad(b1=betas[0], b2=betas[1], eps=eps),
                               optax.scale_by_learning_rate(learning_rate))
        if name == "adamod":
            return optax.chain(_adamod(b1=betas[0], b2=betas[1], eps=eps),
                               optax.scale_by_learning_rate(learning_rate))
        if name == "adabound":
            return optax.chain(_adabound(b1=betas[0], b2=betas[1], eps=eps),
                               optax.scale_by_learning_rate(learning_rate))
        if name == "pid":
            return optax.chain(_pid(momentum=momentum or 0.9),
                               optax.scale_by_learning_rate(learning_rate))
        if name in ("ranger", "rangerva"):
            # Ranger = RAdam + Lookahead (RangerVA's variance adaptation
            # approximated by the same composition)
            return _lookahead(
                optax.radam(learning_rate, b1=betas[0], b2=betas[1], eps=eps))
        if name == "rangerqh":
            return _lookahead(
                optax.chain(_qhadam(b1=betas[0], b2=betas[1], eps=eps),
                            optax.scale_by_learning_rate(learning_rate)))
        raise ValueError(f"Could not interpret optimizer identifier: {optimizer}")

    build(lr)  # eager name/hyperparameter validation (inject_hyperparams
    # defers the inner call to init time)
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
