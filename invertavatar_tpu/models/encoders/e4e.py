"""e4e W+ encoder (reference encoder_inversion/models/e4e.py:22-134).

IR-SE-50 trunk with FPN laterals and 14 GradualStyleBlock heads: w0 from the
deepest feature plus per-style deltas, coarse/middle/fine split at 3/7.
Module names mirror the torch Sequential layout for checkpoint import.
"""

from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..layers import FullyConnectedLayer
from .irse import Conv2d, Linear, _Body, _InputLayer


def trunk_layers(inp_ch: int, taps: Tuple[int, ...], x, train: bool,
                 num_layers: int = 50):
    """Instantiate input_layer + body in the caller's scope (torch child names).

    `num_layers=8` builds the 4-block tiny trunk (one bottleneck per stage —
    same stage-end channels 64/128/256/512 and strides as IR-SE-50, so every
    decoder that consumes the taps is unchanged). Test/dryrun-only: the
    multichip dryrun's compile cost on the driver's 1-core host is dominated
    by the fixed-width IR-SE-50 trunks, which don't shrink with channel_base
    (docs/dryrun_cold_time.json). Tap ids stay in the 50-layout numbering —
    they are remapped to the tiny layout's stage-end blocks internally."""
    x = _InputLayer(inp_ch, name="input_layer")(x, train=train)
    if num_layers == 50:
        return _Body(50, tuple(taps), name="body")(x, train=train)
    # stage membership in the 50-layout: 0-2 / 3-6 / 7-20 / 21-23
    def stage_of(i):
        return 0 if i <= 2 else 1 if i <= 6 else 2 if i <= 20 else 3
    mapped = tuple(sorted({stage_of(t) for t in taps}))
    xf, feats8 = _Body(num_layers, mapped, name="body")(x, train=train)
    feats = {t: feats8[stage_of(t)] for t in taps}
    return xf, feats


def upsample_add(x, y):
    """Bilinear align_corners=True upsample of x to y's size, then add (e4e.py:49-66)."""
    B, H, W, C = y.shape
    h, w = x.shape[1], x.shape[2]
    out = jax.image.scale_and_translate(
        x.astype(jnp.float32),
        (B, H, W, C),
        (1, 2),
        scale=jnp.array([(H - 1) / (h - 1), (W - 1) / (w - 1)], jnp.float32),
        translation=jnp.zeros(2, jnp.float32),
        method="linear",
        antialias=False,
    )
    return out.astype(y.dtype) + y


class _StyleConvs(nn.Module):
    """convs Sequential of GradualStyleBlock: stride-2 conv + LeakyReLU pairs."""

    in_c: int
    out_c: int
    num_pools: int

    @nn.compact
    def __call__(self, x):
        ch = self.in_c
        for p in range(self.num_pools):
            x = Conv2d(ch, self.out_c, kernel=3, stride=2, padding=1, name=str(2 * p))(x)
            x = jnp.where(x >= 0, x, 0.01 * x)  # nn.LeakyReLU() default slope
            ch = self.out_c
        return x


class GradualStyleBlock(nn.Module):
    in_c: int
    out_c: int
    spatial: int

    @nn.compact
    def __call__(self, x):
        num_pools = int(np.log2(self.spatial))
        x = _StyleConvs(self.in_c, self.out_c, num_pools, name="convs")(x)
        x = x.reshape(x.shape[0], self.out_c)
        return FullyConnectedLayer(self.out_c, self.out_c, name="linear")(x)


class _Styles(nn.Module):
    style_count: int
    coarse_ind: int
    middle_ind: int

    @nn.compact
    def __call__(self, feats: List):
        out = []
        for i, f in enumerate(feats):
            spatial = 16 if i < self.coarse_ind else 32 if i < self.middle_ind else 64
            out.append(GradualStyleBlock(512, 512, spatial, name=str(i))(f))
        return out


class Encoder4Editing(nn.Module):
    """Full e4e encoder -> ws [B, n_styles, 512] (e4e.py:69-130)."""

    n_styles: int = 14
    inp_ch: int = 3
    coarse_ind: int = 3
    middle_ind: int = 7
    trunk_layers_n: int = 50  # 8 = tiny trunk (test/dryrun-only)

    @nn.compact
    def __call__(self, x, train: bool = False):
        _, feats = trunk_layers(self.inp_ch, (6, 20, 23), x, train,
                                num_layers=self.trunk_layers_n)
        c1, c2, c3 = feats[6], feats[20], feats[23]

        p2 = upsample_add(c3, Conv2d(256, 512, kernel=1, stride=1, padding=0, name="latlayer1")(c2))
        p1 = upsample_add(p2, Conv2d(128, 512, kernel=1, stride=1, padding=0, name="latlayer2")(c1))

        per_style = [
            c3 if i == 0 else (c3 if i < self.coarse_ind else p2 if i < self.middle_ind else p1)
            for i in range(self.n_styles)
        ]
        deltas = _Styles(self.n_styles, self.coarse_ind, self.middle_ind, name="styles")(per_style)
        w0 = deltas[0]
        ws = [w0] + [w0 + d for d in deltas[1:]]
        return jnp.stack(ws, axis=1)


class E4E(nn.Module):
    """e4e wrapper: encoder + latent_avg buffer (e4e.py:137-203). The frozen
    generator is composed functionally at the pipeline level, not stored here."""

    n_styles: int = 14
    inp_ch: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.shape[1] != 256:
            # AdaptiveAvgPool2d((256, 256)) on 512² = 2×2 mean pooling
            x = jax.lax.reduce_window(
                x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            ) / 4.0
        codes = Encoder4Editing(self.n_styles, self.inp_ch, name="encoder")(x, train=train)
        latent_avg = self.variable(
            "buffers", "latent_avg", lambda: jnp.zeros((1, 512), jnp.float32)
        )
        return codes + latent_avg.value[None]


class _MLP(nn.Module):
    style_dim: int
    n_mlp: int

    @nn.compact
    def __call__(self, w):
        idx = 0
        for _ in range(self.n_mlp - 1):
            w = Linear(self.style_dim, self.style_dim, name=str(idx))(w)
            idx += 1  # LeakyReLU occupies the next Sequential slot
            w = jnp.where(w >= 0, w, 0.2 * w)
            idx += 1
        return Linear(512, 1, name=str(idx))(w)


class LatentCodesDiscriminator(nn.Module):
    """4-layer MLP on w (e4e.py:222-239)."""

    style_dim: int = 512
    n_mlp: int = 4

    @nn.compact
    def __call__(self, w):
        return _MLP(self.style_dim, self.n_mlp, name="mlp")(w)


class LatentCodesPool:
    """Replay buffer of generated w codes for the latent discriminator
    (e4e.py:241-291). Host-side training utility (not jitted — it holds
    python state across steps like the reference)."""

    def __init__(self, pool_size: int):
        import random

        self.pool_size = pool_size
        self._random = random
        self.num_ws = 0
        self.ws = []

    def query(self, ws):
        import numpy as np

        if self.pool_size == 0:
            return ws
        out = []
        for w in np.asarray(ws):
            if w.ndim == 2:  # (n_latent, 512): pick one style row as candidate
                w = w[self._random.randint(0, len(w) - 1)]
            self._handle(w, out)
        return np.stack(out, 0)

    def _handle(self, w, out):
        if self.num_ws < self.pool_size:
            self.num_ws += 1
            self.ws.append(w)
            out.append(w)
        elif self._random.uniform(0, 1) > 0.5:
            rid = self._random.randint(0, self.pool_size - 1)
            out.append(self.ws[rid].copy())
            self.ws[rid] = w
        else:
            out.append(w)
