"""LPIPS perceptual metric (reference encoder_inversion/criteria/lpips/).

Architecture-faithful JAX port of the v0.1 criterion: a frozen feature trunk
(AlexNet or VGG16 `.features`), channel-unit-normalized activations at the
standard tap points, squared differences weighted by learned 1×1 'lin' convs,
spatially averaged and summed over taps (lpips.py:29-35, networks.py:36-97).

Weights (torchvision trunk + lin heads) are not bundled (zero-egress build);
import them from the user's torch checkpoints via
`invertavatar_tpu.utils.torch_import.convert_state_dict`. Tests validate the
math against a torch-side oracle with random weights.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..models.encoders.irse import Conv2d

# z-score constants (networks.py:41-44)
_MEAN = (-0.030, -0.088, -0.188)
_STD = (0.458, 0.448, 0.450)


def _normalize_activation(x, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    return x / (norm + eps)


def _max_pool(x, k=3, s=2):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1), "VALID"
    )


class _AlexFeatures(nn.Module):
    """torchvision alexnet.features; taps after ReLU 1-5 (networks.py:77-85).
    Child names mirror torchvision Sequential indices."""

    @nn.compact
    def __call__(self, x):
        taps = []
        x = Conv2d(3, 64, kernel=11, stride=4, padding=2, name="0")(x)
        x = jax.nn.relu(x)
        taps.append(_normalize_activation(x))  # layer idx 2 in lpips counting
        x = _max_pool(x)
        x = Conv2d(64, 192, kernel=5, stride=1, padding=2, name="3")(x)
        x = jax.nn.relu(x)
        taps.append(_normalize_activation(x))
        x = _max_pool(x)
        x = Conv2d(192, 384, kernel=3, stride=1, padding=1, name="6")(x)
        x = jax.nn.relu(x)
        taps.append(_normalize_activation(x))
        x = Conv2d(384, 256, kernel=3, stride=1, padding=1, name="8")(x)
        x = jax.nn.relu(x)
        taps.append(_normalize_activation(x))
        x = Conv2d(256, 256, kernel=3, stride=1, padding=1, name="10")(x)
        x = jax.nn.relu(x)
        taps.append(_normalize_activation(x))
        return taps


class _VGG16Features(nn.Module):
    """torchvision vgg16.features; taps at relu1_2..relu5_3 (networks.py:88-97)."""

    @nn.compact
    def __call__(self, x):
        cfg = [  # (conv indices per stage), pool after each stage
            [(0, 3, 64), (2, 64, 64)],
            [(5, 64, 128), (7, 128, 128)],
            [(10, 128, 256), (12, 256, 256), (14, 256, 256)],
            [(17, 256, 512), (19, 512, 512), (21, 512, 512)],
            [(24, 512, 512), (26, 512, 512), (28, 512, 512)],
        ]
        taps = []
        for stage_i, stage in enumerate(cfg):
            for idx, cin, cout in stage:
                x = Conv2d(cin, cout, kernel=3, stride=1, padding=1, name=str(idx))(x)
                x = jax.nn.relu(x)
            taps.append(_normalize_activation(x))
            if stage_i < 4:
                x = _max_pool(x, k=2, s=2)
        return taps


class _LinHead(nn.Module):
    """nn.Sequential(Identity, Conv2d(nc, 1, 1, bias=False)) — child '1'."""

    nc: int

    @nn.compact
    def __call__(self, d):
        return Conv2d(self.nc, 1, kernel=1, padding=0, use_bias=False, name="1")(d)


class _LinLayers(nn.Module):
    n_channels: Tuple[int, ...]

    @nn.compact
    def __call__(self, diffs: List):
        out = []
        for i, (d, nc) in enumerate(zip(diffs, self.n_channels)):
            out.append(_LinHead(nc, name=str(i))(d))
        return out


class LPIPS(nn.Module):
    """LPIPS(x, y) -> scalar (mean over batch), NHWC inputs in [-1, 1]."""

    net_type: str = "alex"

    @nn.compact
    def __call__(self, x, y):
        mean = jnp.asarray(_MEAN)
        std = jnp.asarray(_STD)
        x = (x - mean) / std
        y = (y - mean) / std
        if self.net_type == "alex":
            net = _AlexFeatures(name="net")
            n_channels = (64, 192, 384, 256, 256)
        elif self.net_type == "vgg":
            net = _VGG16Features(name="net")
            n_channels = (64, 128, 256, 512, 512)
        else:
            raise ValueError(self.net_type)
        fx = net(x)
        fy = net(y)
        diffs = [jnp.square(a - b) for a, b in zip(fx, fy)]
        heads = _LinLayers(n_channels, name="lin")(diffs)
        res = [jnp.mean(h, axis=(1, 2, 3)) for h in heads]  # mean over H, W (+ch 1)
        return jnp.mean(jnp.sum(jnp.stack(res, axis=0), axis=0))
