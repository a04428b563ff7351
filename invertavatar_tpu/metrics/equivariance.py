"""Equivariance metrics EQ-T / EQ-T_frac / EQ-R (reference metrics/equivariance.py)
for the StyleGAN3 generator family. Host-driven utilities (run eagerly with
concrete translation/rotation values, like the reference's sampling loop);
image layout NHWC.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.grid_sample import grid_sample
from ..ops.upfirdn2d import filter2d, upsample2d


def sinc(x):
    y = jnp.abs(x * np.pi)
    z = jnp.sin(y) / jnp.clip(y, 1e-30, None)
    return jnp.where(y < 1e-30, jnp.ones_like(z), z)


def lanczos_window(x, a):
    x = jnp.abs(x) / a
    return jnp.where(x < 1, sinc(x), jnp.zeros_like(x))


def rotation_matrix(angle: float) -> np.ndarray:
    c, s = np.cos(angle), np.sin(angle)
    return np.array([[c, s, 0.0], [-s, c, 0.0], [0.0, 0.0, 1.0]], np.float32)


def _filter2d(x, f, padding):
    """torch_utils.upfirdn2d.filter2d with explicit [x0, x1, y0, y1] padding."""
    return filter2d(x, jnp.asarray(f, jnp.float32), padding=list(padding))


def apply_integer_translation(x, tx, ty):
    """equivariance.py:46-63. x [N, H, W, C]; tx/ty in image fractions."""
    N, H, W, C = x.shape
    ix = int(np.rint(float(tx) * W))
    iy = int(np.rint(float(ty) * H))
    z = np.zeros(x.shape, np.float32)
    m = np.zeros(x.shape, np.float32)
    if abs(ix) < W and abs(iy) < H:
        src = np.asarray(x)[:, max(-iy, 0) : H + min(-iy, 0), max(-ix, 0) : W + min(-ix, 0)]
        z[:, max(iy, 0) : H + min(iy, 0), max(ix, 0) : W + min(ix, 0)] = src
        m[:, max(iy, 0) : H + min(iy, 0), max(ix, 0) : W + min(ix, 0)] = 1
    return jnp.asarray(z), jnp.asarray(m)


def apply_fractional_translation(x, tx, ty, a: int = 3):
    """equivariance.py:65-97: Lanczos-windowed sinc resampling shift."""
    N, H, W, C = x.shape
    txp = float(tx) * W
    typ = float(ty) * H
    ix, iy = int(np.floor(txp)), int(np.floor(typ))
    fx, fy = txp - ix, typ - iy
    b = a - 1

    z = np.zeros(x.shape, np.float32)
    zx0, zy0 = max(ix - b, 0), max(iy - b, 0)
    zx1, zy1 = min(ix + a, 0) + W, min(iy + a, 0) + H
    if zx0 < zx1 and zy0 < zy1:
        taps = np.arange(a * 2) - b
        filt_x = np.asarray(sinc(jnp.asarray(taps - fx)) * sinc(jnp.asarray((taps - fx) / a)))
        filt_y = np.asarray(sinc(jnp.asarray(taps - fy)) * sinc(jnp.asarray((taps - fy) / a)))
        y = _filter2d(x, (filt_x / filt_x.sum())[None, :], (b, a, 0, 0))
        y = _filter2d(y, (filt_y / filt_y.sum())[:, None], (0, 0, b, a))
        y = np.asarray(y)[
            :, max(b - iy, 0) : H + b + a + min(-iy - a, 0),
            max(b - ix, 0) : W + b + a + min(-ix - a, 0),
        ]
        z[:, zy0:zy1, zx0:zx1] = y
    m = np.zeros(x.shape, np.float32)
    mx0, my0 = max(ix + a, 0), max(iy + a, 0)
    mx1, my1 = min(ix - b, 0) + W, min(iy - b, 0) + H
    if mx0 < mx1 and my0 < my1:
        m[:, my0:my1, mx0:mx1] = 1
    return jnp.asarray(z), jnp.asarray(m)


def construct_affine_bandlimit_filter(mat, a=3, amax=16, aflt=64, up=4,
                                      cutoff_in=1.0, cutoff_out=1.0) -> jnp.ndarray:
    """equivariance.py:100-131 (FFT-composed oriented sinc·Lanczos filter)."""
    mat = np.asarray(mat, np.float32)
    taps = np.roll((np.arange(aflt * up * 2 - 1) + 1) / up - aflt, 1 - aflt * up)
    yi, xi = np.meshgrid(taps, taps, indexing="ij")
    out = np.stack([xi, yi], axis=2) @ mat[:2, :2].T
    xo, yo = out[..., 0], out[..., 1]

    fi = np.asarray(sinc(jnp.asarray(xi * cutoff_in)) * sinc(jnp.asarray(yi * cutoff_in)))
    fo = np.asarray(sinc(jnp.asarray(xo * cutoff_out)) * sinc(jnp.asarray(yo * cutoff_out)))
    f = np.fft.ifftn(np.fft.fftn(fi) * np.fft.fftn(fo)).real

    wi = np.asarray(lanczos_window(jnp.asarray(xi), a) * lanczos_window(jnp.asarray(yi), a))
    wo = np.asarray(lanczos_window(jnp.asarray(xo), a) * lanczos_window(jnp.asarray(yo), a))
    w = np.fft.ifftn(np.fft.fftn(wi) * np.fft.fftn(wo)).real

    f = f * w
    c = (aflt - amax) * up
    f = np.roll(f, (aflt * up - 1, aflt * up - 1), axis=(0, 1))[c:-c, c:-c]
    f = np.pad(f, ((0, 1), (0, 1))).reshape(amax * 2, up, amax * 2, up)
    f = f / f.sum(axis=(0, 2), keepdims=True) / (up**2)
    f = f.reshape(amax * 2 * up, amax * 2 * up)[:-1, :-1]
    return jnp.asarray(f, jnp.float32)


def _affine_grid(theta: np.ndarray, N: int, H: int, W: int) -> jnp.ndarray:
    """torch affine_grid(align_corners=False) equivalent -> [N, H, W, 2] xy."""
    xs = (2 * np.arange(W) + 1) / W - 1
    ys = (2 * np.arange(H) + 1) / H - 1
    gy, gx = np.meshgrid(ys, xs, indexing="ij")
    ones = np.ones_like(gx)
    pts = np.stack([gx, gy, ones], axis=-1)  # [H, W, 3]
    out = pts @ theta.T  # [H, W, 2]
    return jnp.broadcast_to(jnp.asarray(out, jnp.float32)[None], (N, H, W, 2))


def _grid_sample_nearest(img, grid):
    B, H, W, C = img.shape
    gx = (grid[..., 0] + 1) * (W * 0.5) - 0.5
    gy = (grid[..., 1] + 1) * (H * 0.5) - 0.5
    xi = jnp.round(gx).astype(jnp.int32)
    yi = jnp.round(gy).astype(jnp.int32)
    valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
    flat = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
    vals = jnp.take_along_axis(img.reshape(B, H * W, C), flat.reshape(B, -1, 1), axis=1)
    return vals.reshape(B, *grid.shape[1:3], C) * valid[..., None]


def apply_affine_transformation(x, mat, up=4, **filter_kwargs):
    """equivariance.py:136-166."""
    N, H, W, C = x.shape
    mat = np.asarray(mat, np.float32)
    f = np.asarray(construct_affine_bandlimit_filter(mat, up=up, **filter_kwargs))
    p = f.shape[0] // 2

    theta = np.linalg.inv(mat)
    theta[:2, 2] *= 2
    theta[0, 2] += 1 / up / W
    theta[1, 2] += 1 / up / H
    theta[0, :] *= W / (W + p / up * 2)
    theta[1, :] *= H / (H + p / up * 2)
    g = _affine_grid(theta[:2, :3], N, H, W)

    y = upsample2d(x, jnp.asarray(f), up=up, padding=p)
    z = grid_sample(y, g)
    m = np.zeros(y.shape, np.float32)
    c = p * 2 + 1
    m[:, c:-c, c:-c] = 1
    m = _grid_sample_nearest(jnp.asarray(m), g)
    return z, m


def apply_fractional_rotation(x, angle, a=3, **filter_kwargs):
    mat = rotation_matrix(float(angle))
    return apply_affine_transformation(x, mat, a=a, amax=a * 2, **filter_kwargs)


def apply_fractional_pseudo_rotation(x, angle, a=3, **filter_kwargs):
    mat = rotation_matrix(-float(angle))
    f = np.asarray(construct_affine_bandlimit_filter(mat, a=a, amax=a * 2, up=1, **filter_kwargs))
    y = _filter2d(x, f, (0, 0, 0, 0))
    m = np.zeros(np.asarray(y).shape, np.float32)
    c = f.shape[0] // 2
    m[:, c:-c, c:-c] = 1
    return y, jnp.asarray(m)


def compute_equivariance_metrics(
    synthesis_fn: Callable,  # (ws, transform [3,3]) -> images [N, H, W, C]
    mapping_fn: Callable,  # (z, c) -> ws
    z_dim: int,
    c_sampler: Callable,
    img_resolution: int,
    num_samples: int = 200,
    batch_size: int = 4,
    translate_max: float = 0.125,
    rotate_max: float = 1.0,
    compute_eqt_int: bool = False,
    compute_eqt_frac: bool = False,
    compute_eqr: bool = False,
    seed: int = 0,
):
    """equivariance.py:194-270: PSNR between transformed-input renders and
    transformed reference renders."""
    assert compute_eqt_int or compute_eqt_frac or compute_eqr
    rng = np.random.RandomState(seed)
    I = np.eye(3, dtype=np.float32)
    sums = None
    for _ in range(0, num_samples, batch_size):
        z = rng.randn(batch_size, z_dim).astype(np.float32)
        c = np.asarray(c_sampler(batch_size, rng))
        ws = mapping_fn(z, c)
        orig = synthesis_fn(ws, I)
        s = []
        if compute_eqt_int:
            t = (rng.rand(2) * 2 - 1) * translate_max
            t = np.round(t * img_resolution) / img_resolution
            M = I.copy()
            M[:2, 2] = -t
            img = synthesis_fn(ws, M)
            ref, mask = apply_integer_translation(orig, t[0], t[1])
            s += [jnp.square(ref - img) * mask, mask]
        if compute_eqt_frac:
            t = (rng.rand(2) * 2 - 1) * translate_max
            M = I.copy()
            M[:2, 2] = -t
            img = synthesis_fn(ws, M)
            ref, mask = apply_fractional_translation(orig, t[0], t[1])
            s += [jnp.square(ref - img) * mask, mask]
        if compute_eqr:
            angle = (rng.rand() * 2 - 1) * (rotate_max * np.pi)
            img = synthesis_fn(ws, rotation_matrix(-angle))
            ref, ref_mask = apply_fractional_rotation(orig, angle)
            pseudo, pseudo_mask = apply_fractional_pseudo_rotation(img, angle)
            mask = ref_mask * pseudo_mask
            s += [jnp.square(ref - pseudo) * mask, mask]
        s = np.asarray([float(jnp.sum(v.astype(jnp.float64))) for v in s])
        sums = s if sums is None else sums + s
    mses = sums[0::2] / sums[1::2]
    psnrs = np.log10(2) * 20 - np.log10(mses) * 10
    return tuple(psnrs) if len(psnrs) > 1 else float(psnrs[0])
