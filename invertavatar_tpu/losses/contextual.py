"""Contextual (CX) loss family (reference encoder_inversion/criteria/cx_loss.py
and criteria/contextual_loss/functional.py) — unused by the shipped configs;
provided for inventory completeness.

Functional math follows cx_loss.py (which clamps the relative distance to
±10; the duplicate in contextual_loss/functional.py omits the clamp — select
with `clamp_relative`). Feature tensors are NHWC.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..models.encoders.irse import Conv2d


def compute_meshgrid(shape) -> jnp.ndarray:
    """cx_loss.py:9-18 -> [N, H, W, 2] (row, col) grid features."""
    N, H, W, _ = shape
    rows = jnp.arange(H, dtype=jnp.float32) / (H + 1)
    cols = jnp.arange(W, dtype=jnp.float32) / (W + 1)
    rr, cc = jnp.meshgrid(rows, cols, indexing="ij")
    grid = jnp.stack([rr, cc], axis=-1)
    return jnp.broadcast_to(grid[None], (N, H, W, 2))


def compute_l2_distance(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """cx_loss.py:21-34: pairwise squared-L2 -> [N, HW(x), HW(y)]."""
    N = x.shape[0]
    x_vec = x.reshape(N, -1, x.shape[-1])  # [N, HW, C]
    y_vec = y.reshape(N, -1, y.shape[-1])
    prec = jax.lax.Precision.HIGHEST
    x_s = jnp.sum(jnp.square(x_vec), axis=-1)  # [N, HW]
    y_s = jnp.sum(jnp.square(y_vec), axis=-1)
    A = jnp.matmul(y_vec, jnp.swapaxes(x_vec, 1, 2), precision=prec)  # [N, HWy, HWx]
    dist = y_s[:, :, None] - 2 * A + x_s[:, None, :]
    # reference returns dist.transpose(1,2) -> [N, HWx, HWy]
    return jnp.clip(jnp.swapaxes(dist, 1, 2), 0.0, None)


def compute_l1_distance(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """functional.py:158-169: |Σ_c x - Σ_c y| pairwise -> [N, HWx, HWy]."""
    N = x.shape[0]
    xs = jnp.sum(x.reshape(N, -1, x.shape[-1]), axis=-1)  # [N, HWx]
    ys = jnp.sum(y.reshape(N, -1, y.shape[-1]), axis=-1)
    return jnp.abs(xs[:, :, None] - ys[:, None, :])


def compute_cosine_distance(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """cx_loss.py:58-80: y-mean-shifted cosine distance -> [N, HWx, HWy]."""
    y_mu = jnp.mean(y, axis=(0, 1, 2), keepdims=True)
    xc = x - y_mu
    yc = y - y_mu
    xn = xc / jnp.maximum(jnp.linalg.norm(xc, axis=-1, keepdims=True), 1e-12)
    yn = yc / jnp.maximum(jnp.linalg.norm(yc, axis=-1, keepdims=True), 1e-12)
    N = x.shape[0]
    xv = xn.reshape(N, -1, x.shape[-1])
    yv = yn.reshape(N, -1, y.shape[-1])
    sim = jnp.matmul(xv, jnp.swapaxes(yv, 1, 2), precision=jax.lax.Precision.HIGHEST)
    return 1.0 - sim


def compute_relative_distance(dist_raw: jnp.ndarray, clamp: bool = True) -> jnp.ndarray:
    """cx_loss.py:37-42 (clamped); functional.py:125-128 (clamp=False)."""
    dist_min = jnp.min(dist_raw, axis=2, keepdims=True)
    dist_tilde = dist_raw / (dist_min + 1e-5)
    return jnp.clip(dist_tilde, -10.0, 10.0) if clamp else dist_tilde


def compute_cx(dist_tilde: jnp.ndarray, band_width: float) -> jnp.ndarray:
    """Eq (3)/(4): similarity softmax over the y axis."""
    w = jnp.exp((1.0 - dist_tilde) / band_width)
    return w / jnp.sum(w, axis=2, keepdims=True)


def contextual_loss(x, y, band_width: float = 0.5, loss_type: str = "cosine",
                    clamp_relative: bool = True) -> jnp.ndarray:
    """CX loss (cx_loss.py:138-177 / functional.py:10-55), NHWC features."""
    if loss_type == "cosine":
        dist_raw = compute_cosine_distance(x, y)
    elif loss_type == "l1":
        dist_raw = compute_l1_distance(x, y)
    else:
        dist_raw = compute_l2_distance(x, y)
    dist_tilde = compute_relative_distance(dist_raw, clamp=clamp_relative)
    cx = compute_cx(dist_tilde, band_width)
    cx = jnp.mean(jnp.max(cx, axis=1), axis=1)  # Eq (1)
    return jnp.mean(-jnp.log(cx + 1e-5))  # Eq (5)


def contextual_bilateral_loss(x, y, weight_sp: float = 0.1, band_width: float = 1.0,
                              loss_type: str = "cosine") -> jnp.ndarray:
    """CoBi loss (cx_loss.py:80-135): spatial + feature CX blend."""
    grid = compute_meshgrid(x.shape)
    dist_sp = compute_l2_distance(grid, grid)
    cx_sp = compute_cx(compute_relative_distance(dist_sp), band_width)

    if loss_type == "cosine":
        dist_raw = compute_cosine_distance(x, y)
    elif loss_type == "l1":
        dist_raw = compute_l1_distance(x, y)
    else:
        dist_raw = compute_l2_distance(x, y)
    cx_feat = compute_cx(compute_relative_distance(dist_raw), band_width)

    cx_combine = (1.0 - weight_sp) * cx_feat + weight_sp * cx_sp
    k_max = jnp.max(cx_combine, axis=2, keepdims=True)
    cx = jnp.mean(k_max, axis=1)
    return jnp.mean(-jnp.log(cx + 1e-5))


class _VGG19Slice(nn.Module):
    """torchvision vgg19 `features[:18]` (conv up to relu3_4), torch names
    `slice1.{idx}` so the pretrained state dict imports directly
    (cx_loss.py:183-196 VGG19)."""

    @nn.compact
    def __call__(self, x):
        cfg = [(0, 3, 64), (2, 64, 64), ("pool",), (5, 64, 128), (7, 128, 128),
               ("pool",), (10, 128, 256), (12, 256, 256), (14, 256, 256), (16, 256, 256)]

        class _Seq(nn.Module):
            @nn.compact
            def __call__(self, x):
                for entry in cfg:
                    if entry[0] == "pool":
                        x = nn.max_pool(x, (2, 2), strides=(2, 2))
                    else:
                        idx, cin, cout = entry
                        x = Conv2d(cin, cout, 3, padding=1, name=str(idx))(x)
                        x = jax.nn.relu(x)
                return x

        return _Seq(name="slice1")(x)


class CXLoss(nn.Module):
    """cx_loss.py:199-232: VGG19-relu3_4 features + CX (no input normalization,
    matching the reference's commented-out mean/std)."""

    band_width: float = 0.5

    def setup(self):
        self.vgg_model = _VGG19Slice()

    def __call__(self, x, y):
        from ..ops.resize import resize_bilinear

        if x.shape[1] > 256:
            x = resize_bilinear(x, (256, 256))
            y = resize_bilinear(y, (256, 256))
        fx = self.vgg_model(x)
        fy = self.vgg_model(y)
        return contextual_loss(fx, fy, self.band_width)
