"""Training state & optimizer factories.

Mirrors the reference training configuration (model/pose_model.py:82-90,
model/networks/base_function.py:211-224): two Adams with β=(0.0, 0.999),
D lr = ratio_g2d · G lr, and the 'lambda' LR policy
  lr_mult(epoch) = 1 − max(0, epoch+2+iter_count−niter) / (niter_decay+1)
stepped once per epoch. Here the schedule is a pure function of the global
step (epoch = step // iters_per_epoch), so the whole update is jittable.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


class GANTrainState(struct.PyTreeNode):
    """Joint G/D training state (one pytree → one donated jit argument)."""

    step: jax.Array
    params_g: Any
    params_d: Any
    stats_g: Any  # batch_stats collection (batch norm / spectral norm u)
    stats_d: Any
    opt_state_g: Any
    opt_state_d: Any

    @classmethod
    def create(cls, params_g, params_d, stats_g, stats_d, tx_g, tx_d):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params_g=params_g,
            params_d=params_d,
            stats_g=stats_g,
            stats_d=stats_d,
            opt_state_g=tx_g.init(params_g),
            opt_state_d=tx_d.init(params_d),
        )


def lambda_lr_schedule(
    base_lr: float,
    niter: int,
    niter_decay: int,
    iter_count: int = 1,
    iters_per_epoch: int = 1000,
) -> Callable[[jax.Array], jax.Array]:
    """The reference 'lambda' policy (base_function.py:213-217) as a
    step-indexed schedule."""

    def schedule(step):
        epoch = step // iters_per_epoch
        mult = 1.0 - jnp.maximum(
            0.0, (epoch + 2 + iter_count - niter) / float(niter_decay + 1)
        )
        return base_lr * jnp.clip(mult, 0.0, 1.0)

    return schedule


def make_optimizer(
    lr: float | Callable,
    policy: str = "lambda",
    niter: int = 5_000_000,
    niter_decay: int = 0,
    iter_count: int = 1,
    iters_per_epoch: int = 1000,
    lr_decay_iters: int = 50,
) -> optax.GradientTransformation:
    """Adam(β1=0, β2=0.999) under the requested LR policy
    (lambda | step | exponent — base_function.py:211-224, epoch-indexed)."""
    if callable(lr):
        sched = lr
    elif policy == "lambda":
        sched = lambda_lr_schedule(lr, niter, niter_decay, iter_count,
                                   iters_per_epoch)
    elif policy == "step":
        sched = optax.exponential_decay(
            lr, transition_steps=lr_decay_iters * iters_per_epoch,
            decay_rate=0.1, staircase=True,
        )
    elif policy == "exponent":
        sched = optax.exponential_decay(
            lr, transition_steps=iters_per_epoch, decay_rate=0.95,
            staircase=True,
        )
    else:
        raise NotImplementedError(f"lr policy [{policy}] not implemented")
    return optax.adam(sched, b1=0.0, b2=0.999, eps=1e-8)
