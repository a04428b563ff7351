"""ADA augmentation pipeline (reference training/augment.py:124-441), TPU-native.

Full pipeline: pixel blitting (xflip / rot90 / integer translation), general
geometric transforms (iso/aniso scale, rotation, fractional translation)
executed as one inverse-homography warp with sym6 wavelet up/down-filtering,
color transforms as a single 4×4 homogeneous matrix, sym2 filter-bank
image-space amplification, additive noise and cutout. Probabilities are gated
per-sample by the shared adaptive `p`.

jit design notes:
  * the reference pads geometrically-warped images by a data-dependent margin
    (augment.py:278-291); static shapes require a fixed margin — `max_margin`
    (default width//2 + filter pad) covers the reference's clamped worst case
    for standard ADA strengths.
  * `debug_percentile` replaces all random draws exactly like the reference,
    which makes cross-framework parity testable.

Layout: NHWC, channels 3 or 6 (the dual-discriminator pair).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import scipy.signal
import scipy.special

from ..ops.grid_sample import grid_sample
from ..ops.upfirdn2d import downsample2d, setup_filter, upsample2d

WAVELETS = {
    "sym2": [-0.12940952255092145, 0.22414386804185735, 0.836516303737469, 0.48296291314469025],
    "sym6": [
        0.015404109327027373, 0.0034907120842174702, -0.11799011114819057, -0.048311742585633,
        0.4910559419267466, 0.787641141030194, 0.3379294217276218, -0.07263752278646252,
        -0.021060292512300564, 0.04472490177066578, 0.0017677118642428036, -0.007800708325034148,
    ],
}


def _translate2d(tx, ty):
    B = tx.shape[0] if hasattr(tx, "shape") and getattr(tx, "ndim", 0) else 1
    tx = jnp.broadcast_to(jnp.asarray(tx, jnp.float32), (B,))
    ty = jnp.broadcast_to(jnp.asarray(ty, jnp.float32), (B,))
    z = jnp.zeros_like(tx)
    o = jnp.ones_like(tx)
    return jnp.stack(
        [o, z, tx, z, o, ty, z, z, o], axis=-1
    ).reshape(-1, 3, 3)


def _scale2d(sx, sy):
    sx = jnp.atleast_1d(jnp.asarray(sx, jnp.float32))
    sy = jnp.broadcast_to(jnp.asarray(sy, jnp.float32), sx.shape)
    z = jnp.zeros_like(sx)
    o = jnp.ones_like(sx)
    return jnp.stack([sx, z, z, z, sy, z, z, z, o], axis=-1).reshape(-1, 3, 3)


def _rotate2d(theta):
    theta = jnp.atleast_1d(jnp.asarray(theta, jnp.float32))
    c, s = jnp.cos(theta), jnp.sin(theta)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    return jnp.stack([c, -s, z, s, c, z, z, z, o], axis=-1).reshape(-1, 3, 3)


def _rotate3d(v, theta):
    vx, vy, vz = v[0], v[1], v[2]
    s, c = jnp.sin(theta), jnp.cos(theta)
    cc = 1 - c
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    rows = [
        vx * vx * cc + c, vx * vy * cc - vz * s, vx * vz * cc + vy * s, z,
        vy * vx * cc + vz * s, vy * vy * cc + c, vy * vz * cc - vx * s, z,
        vz * vx * cc - vy * s, vz * vy * cc + vx * s, vz * vz * cc + c, z,
        z, z, z, o,
    ]
    return jnp.stack(rows, axis=-1).reshape(-1, 4, 4)


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    xflip: float = 0.0
    rotate90: float = 0.0
    xint: float = 0.0
    xint_max: float = 0.125
    scale: float = 0.0
    rotate: float = 0.0
    aniso: float = 0.0
    xfrac: float = 0.0
    scale_std: float = 0.2
    rotate_max: float = 1.0
    aniso_std: float = 0.2
    xfrac_std: float = 0.125
    brightness: float = 0.0
    contrast: float = 0.0
    lumaflip: float = 0.0
    hue: float = 0.0
    saturation: float = 0.0
    brightness_std: float = 0.2
    contrast_std: float = 0.5
    hue_max: float = 1.0
    saturation_std: float = 1.0
    imgfilter: float = 0.0
    imgfilter_bands: Sequence[float] = (1.0, 1.0, 1.0, 1.0)
    imgfilter_std: float = 1.0
    noise: float = 0.0
    cutout: float = 0.0
    noise_std: float = 0.1
    cutout_size: float = 0.5


def _filter_bank() -> np.ndarray:
    """sym2 bandpass filter bank (augment.py:177-186)."""
    Hz_lo = np.asarray(WAVELETS["sym2"])
    Hz_hi = Hz_lo * ((-1) ** np.arange(Hz_lo.size))
    Hz_lo2 = np.convolve(Hz_lo, Hz_lo[::-1]) / 2
    Hz_hi2 = np.convolve(Hz_hi, Hz_hi[::-1]) / 2
    Hz_fbank = np.eye(4, 1)
    for i in range(1, Hz_fbank.shape[0]):
        Hz_fbank = np.dstack([Hz_fbank, np.zeros_like(Hz_fbank)]).reshape(Hz_fbank.shape[0], -1)[:, :-1]
        Hz_fbank = scipy.signal.convolve(Hz_fbank, [Hz_lo2])
        Hz_fbank[i, (Hz_fbank.shape[1] - Hz_hi2.size) // 2 : (Hz_fbank.shape[1] + Hz_hi2.size) // 2] += Hz_hi2
    return Hz_fbank.astype(np.float32)


class AugmentPipe:
    """Stateless functional pipe; the adaptive probability `p` is an argument."""

    def __init__(self, cfg: AugmentConfig, max_margin: Optional[int] = None):
        self.cfg = cfg
        self.Hz_geom = setup_filter(WAVELETS["sym6"])
        self.Hz_fbank = jnp.asarray(_filter_bank())
        self.max_margin = max_margin

    def __call__(self, images: jnp.ndarray, p: jnp.ndarray, rng: jax.Array,
                 debug_percentile: Optional[float] = None):
        cfg = self.cfg
        B, H, W, C = images.shape
        keys = list(jax.random.split(rng, 32))
        key = iter(keys).__next__

        def draw(shape, kind="uniform"):
            if kind == "uniform":
                return jax.random.uniform(key(), shape)
            return jax.random.normal(key(), shape)

        def gate(prob, val, default):
            take = draw(val.shape[: 1] + (1,) * (val.ndim - 1)) < prob * p
            return jnp.where(take, val, default)

        dp = debug_percentile

        # ---- geometric: build inverse homography G_inv (pixel_out -> pixel_in)
        G = jnp.tile(jnp.eye(3)[None], (B, 1, 1))
        use_geom = False
        if cfg.xflip > 0:
            i = jnp.floor(draw((B,)) * 2)
            i = gate(cfg.xflip, i, jnp.zeros_like(i))
            if dp is not None:
                i = jnp.full_like(i, np.floor(dp * 2))
            G = G @ _scale2d(1 / (1 - 2 * i), 1.0)
            use_geom = True
        if cfg.rotate90 > 0:
            i = jnp.floor(draw((B,)) * 4)
            i = gate(cfg.rotate90, i, jnp.zeros_like(i))
            if dp is not None:
                i = jnp.full_like(i, np.floor(dp * 4))
            G = G @ _rotate2d(np.pi / 2 * i)
            use_geom = True
        if cfg.xint > 0:
            t = (draw((B, 2)) * 2 - 1) * cfg.xint_max
            t = gate(cfg.xint, t, jnp.zeros_like(t))
            if dp is not None:
                t = jnp.full_like(t, (dp * 2 - 1) * cfg.xint_max)
            G = G @ _translate2d(-jnp.round(t[:, 0] * W), -jnp.round(t[:, 1] * H))
            use_geom = True
        if cfg.scale > 0:
            s = jnp.exp2(draw((B,), "normal") * cfg.scale_std)
            s = gate(cfg.scale, s, jnp.ones_like(s))
            if dp is not None:
                s = jnp.full_like(s, np.exp2(float(scipy.special.erfinv(dp * 2 - 1)) * cfg.scale_std))
            G = G @ _scale2d(1 / s, 1 / s)
            use_geom = True
        p_rot = 1 - jnp.sqrt(jnp.clip(1 - cfg.rotate * p, 0, 1))
        if cfg.rotate > 0:
            theta = (draw((B,)) * 2 - 1) * np.pi * cfg.rotate_max
            take = draw((B,)) < p_rot
            theta = jnp.where(take, theta, 0.0)
            if dp is not None:
                theta = jnp.full_like(theta, (dp * 2 - 1) * np.pi * cfg.rotate_max)
            G = G @ _rotate2d(theta)
            use_geom = True
        if cfg.aniso > 0:
            s = jnp.exp2(draw((B,), "normal") * cfg.aniso_std)
            s = gate(cfg.aniso, s, jnp.ones_like(s))
            if dp is not None:
                s = jnp.full_like(s, np.exp2(float(scipy.special.erfinv(dp * 2 - 1)) * cfg.aniso_std))
            G = G @ _scale2d(1 / s, s)
            use_geom = True
        if cfg.rotate > 0:
            theta = (draw((B,)) * 2 - 1) * np.pi * cfg.rotate_max
            take = draw((B,)) < p_rot
            theta = jnp.where(take, theta, 0.0)
            if dp is not None:
                theta = jnp.zeros_like(theta)
            G = G @ _rotate2d(theta)
        if cfg.xfrac > 0:
            t = draw((B, 2), "normal") * cfg.xfrac_std
            t = gate(cfg.xfrac, t, jnp.zeros_like(t))
            if dp is not None:
                t = jnp.full_like(t, float(scipy.special.erfinv(dp * 2 - 1)) * cfg.xfrac_std)
            G = G @ _translate2d(-t[:, 0] * W, -t[:, 1] * H)
            use_geom = True

        if use_geom:
            images = self._execute_geom(images, G)

        # ---- color transform C (color_in -> color_out)
        Cm = jnp.tile(jnp.eye(4)[None], (B, 1, 1))
        use_color = False
        v_luma = jnp.asarray(np.asarray([1, 1, 1, 0]) / np.sqrt(3), jnp.float32)
        if cfg.brightness > 0:
            b = draw((B,), "normal") * cfg.brightness_std
            b = gate(cfg.brightness, b, jnp.zeros_like(b))
            if dp is not None:
                b = jnp.full_like(b, float(scipy.special.erfinv(dp * 2 - 1)) * cfg.brightness_std)
            T = jnp.tile(jnp.eye(4)[None], (B, 1, 1))
            T = T.at[:, 0, 3].set(b).at[:, 1, 3].set(b).at[:, 2, 3].set(b)
            Cm = T @ Cm
            use_color = True
        if cfg.contrast > 0:
            c = jnp.exp2(draw((B,), "normal") * cfg.contrast_std)
            c = gate(cfg.contrast, c, jnp.ones_like(c))
            if dp is not None:
                c = jnp.full_like(c, np.exp2(float(scipy.special.erfinv(dp * 2 - 1)) * cfg.contrast_std))
            S = jnp.tile(jnp.eye(4)[None], (B, 1, 1))
            S = S.at[:, 0, 0].set(c).at[:, 1, 1].set(c).at[:, 2, 2].set(c)
            Cm = S @ Cm
            use_color = True
        if cfg.lumaflip > 0:
            i = jnp.floor(draw((B, 1, 1)) * 2)
            i = gate(cfg.lumaflip, i, jnp.zeros_like(i))
            if dp is not None:
                i = jnp.full_like(i, np.floor(dp * 2))
            vv = jnp.outer(v_luma, v_luma)
            Cm = (jnp.eye(4)[None] - 2 * vv[None] * i) @ Cm
            use_color = True
        if cfg.hue > 0 and C > 1:
            theta = (draw((B,)) * 2 - 1) * np.pi * cfg.hue_max
            theta = gate(cfg.hue, theta, jnp.zeros_like(theta))
            if dp is not None:
                theta = jnp.full_like(theta, (dp * 2 - 1) * np.pi * cfg.hue_max)
            Cm = _rotate3d(v_luma, theta) @ Cm
            use_color = True
        if cfg.saturation > 0 and C > 1:
            s = jnp.exp2(draw((B, 1, 1), "normal") * cfg.saturation_std)
            s = gate(cfg.saturation, s, jnp.ones_like(s))
            if dp is not None:
                s = jnp.full_like(s, np.exp2(float(scipy.special.erfinv(dp * 2 - 1)) * cfg.saturation_std))
            vv = jnp.outer(v_luma, v_luma)[None]
            Cm = (vv + (jnp.eye(4)[None] - vv) * s) @ Cm
            use_color = True

        if use_color:
            flat = images.reshape(B, H * W, C)
            if C == 3:
                flat = jnp.einsum("bij,bpj->bpi", Cm[:, :3, :3], flat) + Cm[:, None, :3, 3]
            elif C == 6:
                a = jnp.einsum("bij,bpj->bpi", Cm[:, :3, :3], flat[..., :3]) + Cm[:, None, :3, 3]
                b = jnp.einsum("bij,bpj->bpi", Cm[:, :3, :3], flat[..., 3:]) + Cm[:, None, :3, 3]
                flat = jnp.concatenate([a, b], axis=-1)
            elif C == 1:
                Cr = jnp.mean(Cm[:, :3, :], axis=1, keepdims=True)
                flat = flat * jnp.sum(Cr[:, :, :3], axis=2)[..., None] + Cr[:, :, 3:]
            images = flat.reshape(B, H, W, C)

        # ---- image-space filtering (augment.py:389-416)
        if cfg.imgfilter > 0:
            num_bands = self.Hz_fbank.shape[0]
            expected_power = jnp.asarray(np.array([10, 1, 1, 1]) / 13, jnp.float32)
            g = jnp.ones((B, num_bands))
            for i, band_strength in enumerate(cfg.imgfilter_bands):
                t_i = jnp.exp2(draw((B,), "normal") * cfg.imgfilter_std)
                take = draw((B,)) < cfg.imgfilter * p * band_strength
                t_i = jnp.where(take, t_i, 1.0)
                if dp is not None:
                    t_i = (
                        jnp.full_like(t_i, np.exp2(float(scipy.special.erfinv(dp * 2 - 1)) * cfg.imgfilter_std))
                        if band_strength > 0
                        else jnp.ones_like(t_i)
                    )
                t = jnp.ones((B, num_bands)).at[:, i].set(t_i)
                t = t / jnp.sqrt(jnp.sum(expected_power * jnp.square(t), axis=-1, keepdims=True))
                g = g * t
            Hz_prime = g @ self.Hz_fbank  # [B, taps]
            taps = Hz_prime.shape[1]
            pad = taps // 2
            imgs = jnp.pad(images, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
            # separable per-sample filter: fold batch into channels, depthwise conv
            x = jnp.transpose(imgs, (1, 2, 0, 3)).reshape(1, imgs.shape[1], imgs.shape[2], B * C)
            k_ch = jnp.repeat(Hz_prime, C, axis=0)  # [B*C, taps]; channel = b*C + c
            kx = jnp.transpose(k_ch)[None, :, None, :]  # [1, taps, 1, B*C]
            ky = jnp.transpose(k_ch)[:, None, None, :]  # [taps, 1, 1, B*C]
            precision = jax.lax.Precision.HIGHEST
            x = jax.lax.conv_general_dilated(
                x, kx, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=B * C, precision=precision,
            )
            x = jax.lax.conv_general_dilated(
                x, ky, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=B * C, precision=precision,
            )
            images = jnp.transpose(x.reshape(x.shape[1], x.shape[2], B, C), (2, 0, 1, 3))

        # ---- corruptions
        if cfg.noise > 0:
            sigma = jnp.abs(draw((B, 1, 1, 1), "normal")) * cfg.noise_std
            sigma = gate(cfg.noise, sigma, jnp.zeros_like(sigma))
            if dp is not None:
                sigma = jnp.full_like(sigma, float(scipy.special.erfinv(dp)) * cfg.noise_std)
            images = images + draw((B, H, W, C), "normal") * sigma
        if cfg.cutout > 0:
            size = jnp.full((B, 2), cfg.cutout_size)
            take = draw((B, 1)) < cfg.cutout * p
            size = jnp.where(take, size, 0.0)
            center = draw((B, 2))
            if dp is not None:
                size = jnp.full_like(size, cfg.cutout_size)
                center = jnp.full_like(center, dp)
            cx = (jnp.arange(W) + 0.5) / W
            cy = (jnp.arange(H) + 0.5) / H
            mask_x = jnp.abs(cx[None, None, :] - center[:, 0, None, None]) >= size[:, 0, None, None] / 2
            mask_y = jnp.abs(cy[None, :, None] - center[:, 1, None, None]) >= size[:, 1, None, None] / 2
            mask = jnp.logical_or(mask_x, mask_y).astype(images.dtype)
            images = images * mask[..., None]
        return images

    def _execute_geom(self, images, G_inv):
        """Warp with wavelet up/down-filtering (augment.py:272-309), static margin."""
        B, H, W, C = images.shape
        Hz_pad = self.Hz_geom.shape[0] // 4
        m = self.max_margin if self.max_margin is not None else W // 2
        m = int(min(m + Hz_pad * 2, W - 1))
        images = jnp.pad(images, ((0, 0), (m, m), (m, m), (0, 0)), mode="reflect")

        # upsample ×2 with sym6
        images = upsample2d(images, self.Hz_geom, up=2)

        # compose pixel-space mapping exactly like the reference: symmetric
        # margins make the origin shift zero; account for the ×2 upsample.
        G = _scale2d(2.0, 2.0) @ G_inv @ _scale2d(0.5, 0.5)
        G = _translate2d(-0.5, -0.5) @ G @ _translate2d(0.5, 0.5)

        # normalized-coords homography between output canvas and padded input
        Hs, Ws = images.shape[1], images.shape[2]  # upsampled padded size
        out_h, out_w = (H + Hz_pad * 2) * 2, (W + Hz_pad * 2) * 2
        A = _scale2d(2.0 / Ws, 2.0 / Hs) @ G @ _scale2d(out_w / 2.0, out_h / 2.0)

        ys, xs = jnp.meshgrid(
            (jnp.arange(out_h) + 0.5) * 2.0 / out_h - 1.0,
            (jnp.arange(out_w) + 0.5) * 2.0 / out_w - 1.0,
            indexing="ij",
        )
        ones = jnp.ones_like(xs)
        pts = jnp.stack([xs, ys, ones], axis=-1).reshape(-1, 3)  # [P, 3] normalized out
        # map: out_norm -> out_px -> in_px -> in_norm
        src = jnp.einsum("bij,pj->bpi", A, pts)
        grid = src[..., :2]
        images = grid_sample(images, grid).reshape(B, out_h, out_w, C)

        images = downsample2d(
            images, self.Hz_geom, down=2, padding=-Hz_pad * 2, flip_filter=True
        )
        # the output canvas is sized so downsampling lands exactly on H×W
        assert images.shape[1] == H and images.shape[2] == W, images.shape
        return images
