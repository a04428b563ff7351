"""Train-state containers and optimizer construction.

Mirrors the reference's optimizer policy (training_loop.py:266-277): Adam with
lazy-regularization hyperparameter scaling — when a reg phase runs every N
steps, main-phase lr and betas are scaled by mb_ratio = N/(N+1). Optimizer
state is explicit (the reference never checkpoints Adam moments; we do).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    buffers: Any = None


def scrub_nan_grads() -> optax.GradientTransformation:
    """Reference training_loop.py:385 (`torch.nan_to_num(flat_grads)`): NaN
    gradients become 0 and ±inf saturates to the fp32 extremes before Adam."""

    def update(updates, state, params=None):
        fmax = jnp.finfo(jnp.float32).max
        updates = jax.tree_util.tree_map(
            lambda g: jnp.nan_to_num(g, nan=0.0, posinf=fmax, neginf=-fmax), updates
        )
        return updates, state

    return optax.GradientTransformation(lambda params: optax.EmptyState(), update)


def adam_with_lazy_reg(lr: float, beta1: float, beta2: float, eps: float, reg_interval: Optional[int]):
    """Reference training_loop.py:270-276: scale lr/betas by N/(N+1)."""
    if reg_interval is not None and reg_interval > 1:
        mb_ratio = reg_interval / (reg_interval + 1)
        lr = lr * mb_ratio
        beta1 = beta1**mb_ratio
        beta2 = beta2**mb_ratio
    return optax.chain(scrub_nan_grads(), optax.adam(lr, b1=beta1, b2=beta2, eps=eps))


def ema_update(ema_params, params, beta):
    """G_ema lerp (training_loop.py:397-407): ema = ema*beta + p*(1-beta)."""
    return jax.tree_util.tree_map(
        lambda e, p: e * beta + p.astype(e.dtype) * (1.0 - beta), ema_params, params
    )


def ema_beta(batch_size: int, ema_kimg: float, cur_nimg: int, ema_rampup: Optional[float] = None):
    ema_nimg = ema_kimg * 1000
    if ema_rampup is not None:
        ema_nimg = min(ema_nimg, cur_nimg * ema_rampup)
    return 0.5 ** (batch_size / max(ema_nimg, 1e-8))
