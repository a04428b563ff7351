"""MoCo-v2 feature-similarity loss (reference encoder_inversion/criteria/moco_loss.py)
— unused by the shipped configs; provided for inventory completeness.

The backbone is a torchvision-layout ResNet-50 trunk (through the global
average pool, fc removed — moco_loss.py:24-38) with torch parameter names
(`conv1`, `bn1`, `layer{1..4}.{i}.conv{1..3}/bn{1..3}/downsample.{0,1}`) so the
published MoCo checkpoint imports via `utils.torch_import` after the reference's
`module.encoder_q.` prefix strip. NHWC throughout.
"""

from __future__ import annotations

from typing import Callable, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..models.encoders.irse import BatchNorm, Conv2d
from ..ops.resize import resize_bilinear


def _max_pool_3x3s2p1(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )


class Bottleneck(nn.Module):
    """torchvision Bottleneck (expansion 4); `dilation` matches torchvision's
    replace_stride_with_dilation used by the DeepLab backbones."""

    in_ch: int
    planes: int
    stride: int = 1
    has_downsample: bool = False
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = Conv2d(self.in_ch, self.planes, 1, padding=0, use_bias=False, name="conv1")(x)
        out = jax.nn.relu(BatchNorm(self.planes, name="bn1")(out, train))
        out = Conv2d(self.planes, self.planes, 3, stride=self.stride, padding=self.dilation,
                     dilation=self.dilation, use_bias=False, name="conv2")(out)
        out = jax.nn.relu(BatchNorm(self.planes, name="bn2")(out, train))
        out = Conv2d(self.planes, self.planes * 4, 1, padding=0, use_bias=False, name="conv3")(out)
        out = BatchNorm(self.planes * 4, name="bn3")(out, train)
        if self.has_downsample:
            class _Down(nn.Module):
                in_ch: int
                out_ch: int
                stride: int

                @nn.compact
                def __call__(self, x, train=False):
                    x = Conv2d(self.in_ch, self.out_ch, 1, stride=self.stride, padding=0,
                               use_bias=False, name="0")(x)
                    return BatchNorm(self.out_ch, name="1")(x, train)

            identity = _Down(self.in_ch, self.planes * 4, self.stride, name="downsample")(x, train)
        else:
            identity = x
        return jax.nn.relu(out + identity)


class _Layer(nn.Module):
    in_ch: int
    planes: int
    blocks: int
    stride: int
    first_dilation: int = 1  # torchvision replace_stride_with_dilation semantics
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Bottleneck(self.in_ch, self.planes, stride=self.stride,
                       has_downsample=True, dilation=self.first_dilation, name="0")(x, train)
        for i in range(1, self.blocks):
            x = Bottleneck(self.planes * 4, self.planes, dilation=self.dilation,
                           name=str(i))(x, train)
        return x


class ResNet50Trunk(nn.Module):
    """torchvision resnet50 minus the fc head -> [B, 2048] pooled features."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv2d(3, 64, 7, stride=2, padding=3, use_bias=False, name="conv1")(x)
        x = jax.nn.relu(BatchNorm(64, name="bn1")(x, train))
        x = _max_pool_3x3s2p1(x)
        x = _Layer(64, 64, 3, 1, name="layer1")(x, train)
        x = _Layer(256, 128, 4, 2, name="layer2")(x, train)
        x = _Layer(512, 256, 6, 2, name="layer3")(x, train)
        x = _Layer(1024, 512, 3, 2, name="layer4")(x, train)
        return jnp.mean(x, axis=(1, 2))  # adaptive avg pool to 1x1


class MocoLoss(nn.Module):
    """moco_loss.py:40-67: normalized-feature cosine alignment.

    Returns (loss, sim_improvement) — the per-sample sim logs of the reference
    are host-side diagnostics and are dropped.
    """

    def setup(self):
        self.model = ResNet50Trunk()

    def extract_feats(self, x):
        x = resize_bilinear(x, (224, 224))
        f = self.model(x)
        return f / jnp.maximum(jnp.linalg.norm(f, axis=1, keepdims=True), 1e-12)

    def __call__(self, y_hat, y, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x_f = self.extract_feats(x)
        y_f = jax.lax.stop_gradient(self.extract_feats(y))
        yh_f = self.extract_feats(y_hat)
        diff_target = jnp.sum(yh_f * y_f, axis=1)
        diff_views = jnp.sum(y_f * x_f, axis=1)
        loss = jnp.mean(1.0 - diff_target)
        sim_improvement = jnp.mean(diff_target - diff_views)
        return loss, sim_improvement
