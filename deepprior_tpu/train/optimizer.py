"""Optimizers and LR schedules matching the reference trainer.

- `reference_adam`: ADAM "version 2" with the beta1 decay gamma = 1 - 1e-8
  (reference src/trainer/optimizer.py:58-90).  The gamma term is what
  distinguishes it from textbook Adam; at gamma = 1-1e-8 the difference is
  ~1e-8 per step, but we implement it exactly so numerical parity is a
  property, not an accident.
- `reference_rmsprop`: RMSProp with the reference's epsilon-as-floor
  semantics (optimizer.py:92-116: rms is clamped from below by epsilon=0.01,
  not added).
- `lr_of_ep`: the warmdown schedule lr/10 (ep<=1), lr/3 (1<ep<=2), then
  lr * exp(-0.04 * ep)  (reference nettrainer.py:54).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


def lr_of_ep(base_lr: float):
    """Per-epoch learning-rate schedule (nettrainer.py:54)."""

    def schedule(epoch):
        epoch = jnp.asarray(epoch, jnp.float32)
        return jnp.where(
            epoch <= 1,
            base_lr / 10.0,
            jnp.where(epoch <= 2, base_lr / 3.0, base_lr * jnp.exp(-0.04 * epoch)),
        ).astype(jnp.float32)

    return schedule


class AdamState(NamedTuple):
    count: jnp.ndarray  # timestep t, starts at 1 like the reference
    mu: optax.Updates
    nu: optax.Updates


def reference_adam(
    beta1: float = 0.9,
    beta2: float = 0.999,
    epsilon: float = 1e-8,
    gamma: float = 1.0 - 1e-8,
) -> optax.GradientTransformation:
    """Exact reference ADAM (optimizer.py:58-90). This is the direction-only
    transform (update = +m_hat / (sqrt(v_hat) + eps)); the trainer chains it
    with optax.scale(-lr) for the scheduled step size."""

    def init(params):
        # distinct buffers for mu/nu — sharing one zeros tree breaks buffer
        # donation (the same buffer would be donated twice)
        mu = jax.tree.map(jnp.zeros_like, params)
        nu = jax.tree.map(jnp.zeros_like, params)
        return AdamState(count=jnp.ones((), jnp.float32), mu=mu, nu=nu)

    def update(grads, state, params=None):
        del params
        t = state.count
        # NOTE: in float32 the default gamma = 1 - 1e-8 rounds to exactly
        # 1.0 (1e-8 < ulp(1)/2), so this decay term folds away at compile
        # time — exactly as it does in the reference's float32 Theano run
        # (optimizer.py:58-90).  Bit-parity holds BECAUSE both round; do
        # not "fix" this with a higher-precision formulation (e.g.
        # exp((t-1) * log1p(-1e-8))), which would diverge from the
        # reference.  A non-default gamma (e.g. 0.999) is honored.
        beta1_t = beta1 * gamma ** (t - 1.0)
        mu = jax.tree.map(
            lambda m, g: beta1_t * m + (1.0 - beta1_t) * g, state.mu, grads
        )
        nu = jax.tree.map(
            lambda v, g: beta2 * v + (1.0 - beta2) * jnp.square(g), state.nu, grads
        )
        mu_hat = jax.tree.map(lambda m: m / (1.0 - beta1**t), mu)
        nu_hat = jax.tree.map(lambda v: v / (1.0 - beta2**t), nu)
        updates = jax.tree.map(
            lambda m, v: m / (jnp.sqrt(v) + epsilon), mu_hat, nu_hat
        )
        return updates, AdamState(count=t + 1.0, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def reference_rmsprop(decay: float = 0.9, epsilon: float = 0.01):
    """Reference RMSProp (optimizer.py:92-116): rms floor, not fuzz."""

    def init(params):
        return jax.tree.map(jnp.zeros_like, params)

    def update(grads, state, params=None):
        del params
        msg = jax.tree.map(
            lambda s, g: decay * s + (1.0 - decay) * jnp.square(g), state, grads
        )
        updates = jax.tree.map(
            lambda g, s: g / jnp.maximum(jnp.sqrt(s), epsilon), grads, msg
        )
        return updates, msg

    return optax.GradientTransformation(init, update)


def make_optimizer(
    kind: str = "adam", momentum: float = 0.9
) -> optax.GradientTransformation:
    """Direction transform by name; the trainer scales by the scheduled LR."""
    if kind == "adam":
        return reference_adam()
    if kind == "rmsprop":
        return reference_rmsprop()
    if kind == "sgd_momentum":
        return optax.trace(decay=momentum)
    raise ValueError(f"unknown optimizer {kind!r}")
