"""Optimizer schedules + factory mirroring the reference's TF constructs.

The reference builds tf.keras ExponentialDecay / PolynomialDecay schedules and an
Adam/SGD factory from YAML config (reference tools/train.py:31-53), plus a per-tensor
clip_by_norm(g, 0.01) applied to every gradient before accumulation (reference
models/ssd_model.py:249). These are their optax equivalents with identical math.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def exponential_decay(initial: float, decay_steps: int, decay_rate: float, staircase: bool = False):
    """tf.keras.optimizers.schedules.ExponentialDecay: initial * rate^(step/decay_steps).

    TF's default is continuous (non-staircase) decay — the reference uses the default
    (tools/train.py:31-35)."""

    def schedule(step):
        p = step / decay_steps
        if staircase:
            p = jnp.floor(p)
        return initial * jnp.power(decay_rate, p)

    return schedule


def polynomial_decay(start: float, decay_steps: int, end: float, power: float = 1.0):
    """tf.keras PolynomialDecay (reference warmup schedule, tools/train.py:36-40):
    (start - end) * (1 - min(step, N)/N)^power + end."""

    def schedule(step):
        frac = jnp.clip(step / decay_steps, 0.0, 1.0)
        return (start - end) * jnp.power(1.0 - frac, power) + end

    return schedule


def clip_by_norm_per_tensor(grads, max_norm: float = 0.01):
    """tf.clip_by_norm applied leaf-wise: g * max_norm / max(||g||_2, max_norm).

    The reference clips each gradient tensor to L2 norm 0.01 BEFORE micro-batch
    accumulation (models/ssd_model.py:248-249); this is applied at the same point in
    train/step.py."""

    def clip(g):
        norm = jnp.sqrt(jnp.sum(jnp.square(g.astype(jnp.float32))))
        return g * (max_norm / jnp.maximum(norm, max_norm))

    return jax.tree.map(clip, grads)


def make_optimizer(
    name: str,
    learning_rate,
    beta_1: float = 0.9,
    beta_2: float = 0.999,
    epsilon: float = 1e-7,
    momentum: float = 0.0,
) -> optax.GradientTransformation:
    """Adam/SGD factory (reference tools/train.py:42-53). TF Adam's default epsilon is
    1e-7 (the reference config uses 1e-7 explicitly, config/default.yml:24)."""
    name = name.lower()
    if name == "adam":
        return optax.adam(learning_rate, b1=beta_1, b2=beta_2, eps=epsilon)
    if name == "sgd":
        return optax.sgd(learning_rate, momentum=momentum or None)
    raise ValueError(f"unknown optimizer {name!r}; expected 'adam' or 'sgd'")
