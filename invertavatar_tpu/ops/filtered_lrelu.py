"""Filtered leaky-ReLU (reference torch_utils/ops/filtered_lrelu.py:58).

up-filter → bias → leaky-ReLU (+gain, clamp) → down-filter, the StyleGAN3
antialiased nonlinearity. Only `networks_stylegan3.py` uses it (no shipped
entry point, SURVEY §2.1) — provided for op-inventory completeness. Composed
from the exact-parity `upfirdn2d` and `bias_act`; XLA fuses the elementwise
middle into the surrounding depthwise convolutions.

Layout: NHWC.
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp

from .bias_act import bias_act
from .upfirdn2d import _filter_size, upfirdn2d


def filtered_lrelu(
    x: jnp.ndarray,
    fu: Optional[jnp.ndarray] = None,
    fd: Optional[jnp.ndarray] = None,
    b: Optional[jnp.ndarray] = None,
    up: int = 1,
    down: int = 1,
    padding=0,
    gain: float = math.sqrt(2.0),
    slope: float = 0.2,
    clamp: Optional[float] = None,
    flip_filter: bool = False,
) -> jnp.ndarray:
    """Matches `_filtered_lrelu_ref` (filtered_lrelu.py:123-155) on NHWC input."""
    assert x.ndim == 4
    assert up >= 1 and down >= 1
    assert gain > 0 and slope >= 0
    x = bias_act(x, b)  # bias only
    x = upfirdn2d(x, fu, up=up, padding=padding, gain=up**2, flip_filter=flip_filter)
    x = bias_act(x, None, act="lrelu", alpha=slope, gain=gain, clamp=clamp)
    x = upfirdn2d(x, fd, down=down, flip_filter=flip_filter)
    return x
