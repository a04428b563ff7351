"""Pad → upsample → FIR filter → downsample, fused through XLA convolutions.

TPU-native counterpart of the reference CUDA op `torch_utils/ops/upfirdn2d.py:120`
(CUDA kernel upfirdn2d.cu). The whole pipeline maps onto a single depthwise
`lax.conv_general_dilated`: zero-stuff upsampling is `lhs_dilation`, the FIR tap
is the kernel, downsampling is the window stride, and pad/crop is (possibly
negative) conv padding — all of which XLA fuses and tiles for the VPU/MXU.
Separable filters (the default [1,3,3,1]) run as two rank-1 passes.

Layout: NHWC (TPU-preferred); the reference operates on NCHW.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.misc import parse_padding, parse_scaling

Filter = Optional[jnp.ndarray]


def setup_filter(
    f,
    normalize: bool = True,
    flip_filter: bool = False,
    gain: float = 1.0,
    separable: Optional[bool] = None,
) -> jnp.ndarray:
    """Prepare a FIR filter for `upfirdn2d` (semantics of reference upfirdn2d.py:72).

    Returns a float32 array: `[fh, fw]` (non-separable) or `[taps]` (separable).
    """
    if f is None:
        f = 1
    f = np.asarray(f, dtype=np.float32)
    assert f.ndim in [0, 1, 2]
    assert f.size > 0
    if f.ndim == 0:
        f = f[np.newaxis]
    if separable is None:
        separable = f.ndim == 1 and f.size >= 8
    if f.ndim == 1 and not separable:
        f = np.outer(f, f)
    assert f.ndim == (1 if separable else 2)
    if normalize:
        f = f / f.sum()
    if flip_filter:
        f = f[::-1] if f.ndim == 1 else f[::-1, ::-1]
    f = f * (gain ** (f.ndim / 2))
    return jnp.asarray(np.ascontiguousarray(f), dtype=jnp.float32)


def _depthwise_conv(
    x: jnp.ndarray,
    f2d: jnp.ndarray,
    up: Sequence[int],
    down: Sequence[int],
    padding: Sequence[int],
) -> jnp.ndarray:
    """Depthwise conv over NHWC x with [fh, fw] kernel (correlation, no flip here)."""
    channels = x.shape[-1]
    upx, upy = up
    downx, downy = down
    px0, px1, py0, py1 = padding
    # reference zero-stuffs to H*up (trailing up-1 zeros); lhs_dilation yields
    # H*up-(up-1), so fold the missing trailing zeros into the high padding.
    py1 = py1 + (upy - 1)
    px1 = px1 + (upx - 1)
    kernel = jnp.tile(f2d.astype(x.dtype)[:, :, None, None], (1, 1, 1, channels))
    # fp32 stays exact on TPU (default conv precision is bf16); bf16 inputs
    # take the fast path by construction.
    precision = jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(downy, downx),
        padding=((py0, py1), (px0, px1)),
        lhs_dilation=(upy, upx),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=channels,
        precision=precision,
    )


def upfirdn2d(
    x: jnp.ndarray,
    f: Filter,
    up: Union[int, Sequence[int]] = 1,
    down: Union[int, Sequence[int]] = 1,
    padding: Union[int, Sequence[int]] = 0,
    flip_filter: bool = False,
    gain: float = 1.0,
) -> jnp.ndarray:
    """Upsample, FIR-filter and downsample a batch of NHWC images.

    Matches reference `_upfirdn2d_ref` (upfirdn2d.py:169-213): zero-stuff by
    `up`, pad/crop by `padding` (w.r.t. the upsampled image; negative = crop),
    convolve with `f` (flipped unless `flip_filter`), keep every `down`-th pixel.
    """
    assert x.ndim == 4, "expected NHWC input"
    if f is None:
        f = jnp.ones((1, 1), dtype=jnp.float32)
    assert f.ndim in (1, 2)
    upx, upy = parse_scaling(up)
    downx, downy = parse_scaling(down)
    px0, px1, py0, py1 = parse_padding(padding)

    # XLA conv computes correlation; the reference flips the filter before its
    # correlation when flip_filter=False (i.e. true convolution).
    if not flip_filter:
        f = jnp.flip(f, axis=tuple(range(f.ndim)))

    if f.ndim == 1:
        # Separable: horizontal pass then vertical pass.
        x = _depthwise_conv(x, f[None, :], (upx, 1), (downx, 1), (px0, px1, 0, 0))
        x = _depthwise_conv(x, f[:, None], (1, upy), (1, downy), (0, 0, py0, py1))
    else:
        x = _depthwise_conv(x, f, (upx, upy), (downx, downy), (px0, px1, py0, py1))
    if gain != 1.0:
        x = x * jnp.asarray(gain, dtype=x.dtype)
    return x


def filter2d(x, f, padding=0, flip_filter=False, gain=1.0):
    """Filter NHWC images, output padded to match input (reference upfirdn2d.py:279)."""
    px0, px1, py0, py1 = parse_padding(padding)
    fw, fh = _filter_size(f)
    p = [px0 + fw // 2, px1 + (fw - 1) // 2, py0 + fh // 2, py1 + (fh - 1) // 2]
    return upfirdn2d(x, f, padding=p, flip_filter=flip_filter, gain=gain)


def upsample2d(x, f, up=2, padding=0, flip_filter=False, gain=1.0):
    """Upsample NHWC images with FIR filter (reference upfirdn2d.py:315)."""
    upx, upy = parse_scaling(up)
    px0, px1, py0, py1 = parse_padding(padding)
    fw, fh = _filter_size(f)
    p = [
        px0 + (fw + upx - 1) // 2,
        px1 + (fw - upx) // 2,
        py0 + (fh + upy - 1) // 2,
        py1 + (fh - upy) // 2,
    ]
    return upfirdn2d(x, f, up=up, padding=p, flip_filter=flip_filter, gain=gain * upx * upy)


def downsample2d(x, f, down=2, padding=0, flip_filter=False, gain=1.0):
    """Downsample NHWC images with FIR filter (reference upfirdn2d.py:354)."""
    downx, downy = parse_scaling(down)
    px0, px1, py0, py1 = parse_padding(padding)
    fw, fh = _filter_size(f)
    p = [
        px0 + (fw - downx + 1) // 2,
        px1 + (fw - downx) // 2,
        py0 + (fh - downy + 1) // 2,
        py1 + (fh - downy) // 2,
    ]
    return upfirdn2d(x, f, down=down, padding=p, flip_filter=flip_filter, gain=gain)


def _filter_size(f: Filter):
    if f is None:
        return 1, 1
    fw = int(f.shape[-1])
    fh = int(f.shape[0])
    return fw, fh
