"""Every optimizer name the reference registry exposes
(reference ``src/system/optimizers.py:10-26``: torch.optim 8 + the 15
torch_optimizer extras) must build and take finite steps here."""
import jax
import jax.numpy as jnp
import optax
import pytest

from rtfs_net_tpu.system import make_optimizer

REFERENCE_NAMES = [
    # torch.optim re-exports
    "adam", "rmsprop", "sgd", "adadelta", "adagrad", "adamax", "adamw", "asgd",
    # torch_optimizer extras
    "pid", "qhm", "yogi", "sgdw", "lamb", "radam", "adamod", "accsgd",
    "qhadam", "ranger", "adabound", "diffgrad", "novograd", "rangerqh",
    "rangerva",
]


@pytest.mark.parametrize("name", REFERENCE_NAMES)
def test_reference_optimizer_name_steps(name):
    params = {"w": jnp.ones((4, 3)), "b": jnp.zeros((3,))}
    grads = jax.tree.map(lambda p: jnp.full_like(p, 0.1), params)
    opt = make_optimizer(name, lr=1e-3, weight_decay=0.01, momentum=0.9)
    state = opt.init(params)
    p = params
    for _ in range(7):
        upd, state = opt.update(grads, state, p)
        p = optax.apply_updates(p, upd)
    assert all(bool(jnp.isfinite(x).all()) for x in jax.tree.leaves(p))
    assert any(bool((a != b).any())
               for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p)))


def test_unknown_name_raises():
    with pytest.raises(ValueError, match="interpret optimizer"):
        make_optimizer("definitely_not_an_optimizer")
