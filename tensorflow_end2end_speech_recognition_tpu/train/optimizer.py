"""Optimizer factory + gradient clipping (reference ``models/model_base.py``).

The reference's ``ModelBase._set_optimizer`` exposed adam / adadelta / sgd /
momentum / nesterov / rmsprop selected by config string, with
``clip_grad_norm`` applied to the gradients (SURVEY.md §2.1, Appendix A).

TPU-native shape: the transformation chain ends at ``scale_by_*`` — i.e. it
produces *unscaled* update directions — and the learning rate is a plain
runtime argument of the jitted train step (``updates * -lr``). The plateau
LR controller can then move the rate every epoch without recompiling or
rewriting optimizer state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

OPTIMIZERS = ("adam", "adadelta", "sgd", "momentum", "nesterov", "rmsprop")


def build_optimizer(
    name: str,
    clip_grad_norm: float | None = 5.0,
) -> optax.GradientTransformation:
    """Returns a transform yielding unscaled update directions (no LR)."""
    name = name.lower()
    if name == "adam":
        core = optax.scale_by_adam()
    elif name == "adadelta":
        core = optax.scale_by_adadelta()
    elif name == "sgd":
        core = optax.identity()
    elif name == "momentum":
        core = optax.trace(decay=0.9)
    elif name == "nesterov":
        core = optax.trace(decay=0.9, nesterov=True)
    elif name == "rmsprop":
        core = optax.scale_by_rms()
    else:
        raise ValueError(f"unknown optimizer {name!r}; expected one of {OPTIMIZERS}")
    chain = []
    if clip_grad_norm:
        chain.append(optax.clip_by_global_norm(clip_grad_norm))
    chain.append(core)
    return optax.chain(*chain)


def apply_updates(params, updates, lr):
    """params - lr * updates (lr is a traced scalar inside the train step)."""
    lr = jnp.asarray(lr, jnp.float32)
    return jax.tree.map(lambda p, u: p - lr * u, params, updates)
