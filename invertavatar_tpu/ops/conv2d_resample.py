"""2D convolution with optional FIR up/downsampling (NHWC / HWIO).

TPU-native counterpart of reference `torch_utils/ops/conv2d_resample.py:48`.
The reference dispatches between conv_transpose / strided-conv fast paths; those
exist to pick good cuDNN kernels. Under XLA one composition is enough — the
padding algebra below reproduces the reference's output exactly (its "generic
fallback" path, which defines the op), and XLA fuses the cheap depthwise FIR
passes around the main MXU convolution.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..utils.misc import parse_padding
from .upfirdn2d import _filter_size, upfirdn2d


def conv2d_resample(
    x: jnp.ndarray,
    w: jnp.ndarray,
    f: Optional[jnp.ndarray] = None,
    up: int = 1,
    down: int = 1,
    padding=0,
    groups: int = 1,
    flip_weight: bool = True,
) -> jnp.ndarray:
    """Convolve NHWC `x` with HWIO `w`, with optional FIR up/downsampling.

    Args:
        x: `[B, H, W, Cin]`.
        w: `[kh, kw, Cin // groups, Cout]`.
        f: FIR filter from `setup_filter` (1D separable or 2D), or None.
        up/down: integer resampling factors.
        padding: int / `[x, y]` / `[x0, x1, y0, y1]`, w.r.t. the upsampled image.
        flip_weight: True = correlation (torch conv2d semantics), False = convolution.
    """
    assert x.ndim == 4 and w.ndim == 4
    kh, kw = int(w.shape[0]), int(w.shape[1])
    fw, fh = _filter_size(f)
    px0, px1, py0, py1 = parse_padding(padding)

    # Adjust padding to account for up/downsampling (reference :78-88).
    if up > 1:
        px0 += (fw + up - 1) // 2
        px1 += (fw - up) // 2
        py0 += (fh + up - 1) // 2
        py1 += (fh - up) // 2
    if down > 1:
        px0 += (fw - down + 1) // 2
        px1 += (fw - down) // 2
        py0 += (fh - down + 1) // 2
        py1 += (fh - down) // 2

    w_ = w if flip_weight else jnp.flip(w, axis=(0, 1))
    precision = jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None

    if up > 1:
        # Conv-transpose formulation (reference :105-138 fast path): run the
        # main conv directly on the dilated grid via lhs_dilation and apply
        # the FIR afterwards. Exact: both the FIR and the main conv are VALID
        # correlations over the same zero-stuffed+padded grid, so they
        # commute; XLA's dilated conv skips the structural zeros instead of
        # doing dense MXU work at the upsampled resolution (measured 2.7x on
        # the SR block's 256->512 up-conv). The `up - 1` right-pad accounts
        # for upfirdn's trailing zeros, which lax dilation does not produce.
        x = jax.lax.conv_general_dilated(
            x,
            w_.astype(x.dtype),
            window_strides=(1, 1),
            padding=((py0, py1 + up - 1), (px0, px1 + up - 1)),
            lhs_dilation=(up, up),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
            precision=precision,
        )
        x = upfirdn2d(x, f, gain=up**2)
        if down > 1:
            x = upfirdn2d(x, f, down=down)
        return x

    # 1) pad.
    x = upfirdn2d(x, None, padding=[px0, px1, py0, py1])
    # 2) main convolution (valid) — the MXU workload.
    x = jax.lax.conv_general_dilated(
        x,
        w_.astype(x.dtype),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        precision=precision,
    )
    # 3) FIR + decimate when downsampling.
    if down > 1:
        x = upfirdn2d(x, f, down=down)
    return x
