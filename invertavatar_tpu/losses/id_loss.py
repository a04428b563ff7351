"""ArcFace identity loss (reference encoder_inversion/criteria/id_loss.py:8-38
+ models/model_irse.py Backbone).

IR-SE-50 at 112²: crop [35:223, 32:220] of the 256² image, adaptive-pool to
112², embed to a unit 512-vector, loss = 1 − ⟨feat_x, feat_y⟩. Weights import
from the published `model_ir_se50.pth` via the torch state-dict converter
(torch names mirrored).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..models.encoders.e4e import trunk_layers
from ..models.encoders.irse import BatchNorm, Linear
from ..models.encoders.unet_encoders import adaptive_avg_pool


class _BN1d(nn.Module):
    """torch.nn.BatchNorm1d (inference path; the loss net is frozen)."""

    features: int

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.features,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        r_mean = self.variable("batch_stats", "running_mean", lambda: jnp.zeros((self.features,), jnp.float32))
        r_var = self.variable("batch_stats", "running_var", lambda: jnp.ones((self.features,), jnp.float32))
        inv = jax.lax.rsqrt(r_var.value + 1e-5) * w
        return (x - r_mean.value) * inv + b


class _OutputLayer(nn.Module):
    """Sequential(BN2d, Dropout, Flatten, Linear(512·7·7, 512), BN1d)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = BatchNorm(512, name="0")(x, train=train)
        # dropout ('1') is identity at eval; the loss net is always frozen
        # flatten in torch NCHW order so the linear weight imports directly
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
        x = Linear(512 * 7 * 7, 512, name="3")(x)
        return _BN1d(512, name="4")(x)


class ArcFaceBackbone(nn.Module):
    """model_irse.Backbone(112, 50, 'ir_se') -> unit embeddings [B, 512]."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        xf, _ = trunk_layers(3, (), x, train)
        x = _OutputLayer(name="output_layer")(xf, train=train)
        return x / jnp.linalg.norm(x, axis=1, keepdims=True)


def extract_feats(backbone_apply, x):
    """Crop + pool to 112² then embed (id_loss.py:18-22). x: [B, 256, 256, 3]."""
    x = x[:, 35:223, 32:220, :]
    # AdaptiveAvgPool2d((112, 112)) on a 188² crop uses variable-size windows;
    # an antialiased bilinear resize is the standard close approximation.
    x = jax.image.resize(x, (x.shape[0], 112, 112, x.shape[-1]), method="linear")
    return backbone_apply(x)


def id_loss(backbone_apply, x, y):
    """1 − cosine similarity, averaged over the batch (id_loss.py:24-38)."""
    fx = extract_feats(backbone_apply, x)
    fy = extract_feats(backbone_apply, y)
    return jnp.mean(1.0 - jnp.sum(fx * fy, axis=1))
