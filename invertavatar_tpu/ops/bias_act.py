"""Fused bias + activation (+ gain + clamp).

TPU-native counterpart of the reference CUDA op `torch_utils/ops/bias_act.py:54`
(activation table at bias_act.py:23-33). On TPU, XLA fuses the bias add,
activation, gain and clamp into the producing matmul/conv epilogue, so this is a
plain composition — no custom kernel needed. Semantics (including the default
gains, e.g. sqrt(2) for lrelu, and the ±clamp) match the reference exactly.

Layout note: this package is NHWC internally, so the default bias axis is -1
(the reference uses dim=1 on NCHW tensors — same channel axis).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from ..utils.misc import EasyDict

_SQRT2 = math.sqrt(2.0)

activation_funcs = {
    "linear": EasyDict(func=lambda x, alpha: x, def_alpha=0.0, def_gain=1.0),
    "relu": EasyDict(func=lambda x, alpha: jnp.maximum(x, 0.0), def_alpha=0.0, def_gain=_SQRT2),
    "lrelu": EasyDict(
        func=lambda x, alpha: jnp.where(x >= 0, x, x * alpha), def_alpha=0.2, def_gain=_SQRT2
    ),
    "tanh": EasyDict(func=lambda x, alpha: jnp.tanh(x), def_alpha=0.0, def_gain=1.0),
    "sigmoid": EasyDict(func=lambda x, alpha: jax.nn.sigmoid(x), def_alpha=0.0, def_gain=1.0),
    "elu": EasyDict(func=lambda x, alpha: jax.nn.elu(x), def_alpha=0.0, def_gain=1.0),
    "selu": EasyDict(func=lambda x, alpha: jax.nn.selu(x), def_alpha=0.0, def_gain=1.0),
    "softplus": EasyDict(func=lambda x, alpha: jax.nn.softplus(x), def_alpha=0.0, def_gain=1.0),
    "swish": EasyDict(func=lambda x, alpha: jax.nn.sigmoid(x) * x, def_alpha=0.0, def_gain=_SQRT2),
}


def bias_act(
    x: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    axis: int = -1,
    act: str = "linear",
    alpha: Optional[float] = None,
    gain: Optional[float] = None,
    clamp: Optional[float] = None,
) -> jnp.ndarray:
    """Add bias `b` along `axis`, apply activation `act`, scale by `gain`, clamp to ±`clamp`."""
    spec = activation_funcs[act]
    alpha = float(alpha if alpha is not None else spec.def_alpha)
    gain = float(gain if gain is not None else spec.def_gain)

    if b is not None:
        assert b.ndim == 1, "bias must be 1D"
        axis_ = axis % x.ndim
        assert b.shape[0] == x.shape[axis_]
        shape = [1] * x.ndim
        shape[axis_] = -1
        x = x + b.astype(x.dtype).reshape(shape)

    x = spec.func(x, alpha)
    if gain != 1.0:
        x = x * jnp.asarray(gain, dtype=x.dtype)
    if clamp is not None:
        assert clamp >= 0
        x = jnp.clip(x, -clamp, clamp)
    return x
