"""IR-SE ResNet-50 trunk primitives (reference encoder_inversion/models/helpers.py).

The torch modules are Sequential-heavy; the flax module tree mirrors the torch
names level-by-level (Sequential children are named '0', '1', ...) so
checkpoints import purely by name (ArcFace ir_se50 weights, e4e/uvnet trunks).
BatchNorm is implemented natively with torch's parameter names (weight/bias +
running_mean/running_var in the 'batch_stats' collection).

Layout: NHWC.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def torch_conv(x, w, b=None, stride=1, padding=1, dilation=1, groups=1):
    """Plain torch-conv semantics (correlation, symmetric int padding), NHWC/HWIO."""
    precision = jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
    y = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        rhs_dilation=(dilation, dilation),
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


class Conv2d(nn.Module):
    """torch.nn.Conv2d equivalent (weight HWIO, fp32 params)."""

    in_ch: int
    out_ch: int
    kernel: int = 3
    stride: int = 1
    padding: int = 1
    use_bias: bool = True
    dilation: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "weight",
            nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform", in_axis=(0, 1, 2)),
            (self.kernel, self.kernel, self.in_ch // self.groups, self.out_ch),
            jnp.float32,
        )
        b = (
            self.param("bias", nn.initializers.zeros, (self.out_ch,), jnp.float32)
            if self.use_bias
            else None
        )
        return torch_conv(x, w, b, stride=self.stride, padding=self.padding,
                          dilation=self.dilation, groups=self.groups)


class Linear(nn.Module):
    """torch.nn.Linear (weight imported as [in, out])."""

    in_f: int
    out_f: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "weight",
            nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
            (self.in_f, self.out_f),
            jnp.float32,
        )
        precision = jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
        y = jnp.matmul(x, w.astype(x.dtype), precision=precision)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_f,), jnp.float32)
            y = y + b.astype(y.dtype)
        return y


class PReLU(nn.Module):
    """Per-channel PReLU (torch.nn.PReLU(C)); weight init 0.25."""

    channels: int

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.constant(0.25), (self.channels,), jnp.float32)
        w = w.astype(x.dtype)
        return jnp.where(x >= 0, x, x * w)


class BatchNorm(nn.Module):
    """torch.nn.BatchNorm2d over NHWC (eps 1e-5, momentum 0.1), torch param names."""

    channels: int
    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = self.param("weight", nn.initializers.ones, (self.channels,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.channels,), jnp.float32)
        r_mean = self.variable(
            "batch_stats", "running_mean", lambda: jnp.zeros((self.channels,), jnp.float32)
        )
        r_var = self.variable(
            "batch_stats", "running_var", lambda: jnp.ones((self.channels,), jnp.float32)
        )
        if train:
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x.astype(jnp.float32), axis=axes)
            var = jnp.var(x.astype(jnp.float32), axis=axes)
            if not self.is_initializing():
                n = x.size // self.channels
                unbiased = var * n / max(n - 1, 1)
                r_mean.value = (1 - self.momentum) * r_mean.value + self.momentum * mean
                r_var.value = (1 - self.momentum) * r_var.value + self.momentum * unbiased
        else:
            mean, var = r_mean.value, r_var.value
        inv = jax.lax.rsqrt(var + self.eps) * w
        return ((x.astype(jnp.float32) - mean) * inv + b).astype(x.dtype)


class SEModule(nn.Module):
    """Squeeze-excite (helpers.py:62-79); fc1/fc2 are 1×1 convs without bias."""

    channels: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = Conv2d(self.channels, self.channels // self.reduction, kernel=1, padding=0,
                   use_bias=False, name="fc1")(s)
        s = jax.nn.relu(s)
        s = Conv2d(self.channels // self.reduction, self.channels, kernel=1, padding=0,
                   use_bias=False, name="fc2")(s)
        s = jax.nn.sigmoid(s)
        return x * s


class _ShortcutLayer(nn.Module):
    in_ch: int
    depth: int
    stride: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv2d(self.in_ch, self.depth, kernel=1, stride=self.stride, padding=0,
                   use_bias=False, name="0")(x)
        return BatchNorm(self.depth, name="1")(x, train=train)


class _ResLayerIRSE(nn.Module):
    in_ch: int
    depth: int
    stride: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = BatchNorm(self.in_ch, name="0")(x, train=train)
        x = Conv2d(self.in_ch, self.depth, kernel=3, stride=1, padding=1,
                   use_bias=False, name="1")(x)
        x = PReLU(self.depth, name="2")(x)
        x = Conv2d(self.depth, self.depth, kernel=3, stride=self.stride, padding=1,
                   use_bias=False, name="3")(x)
        x = BatchNorm(self.depth, name="4")(x, train=train)
        return SEModule(self.depth, 16, name="5")(x)


class BottleneckIRSE(nn.Module):
    """bottleneck_IR_SE (helpers.py:102-125)."""

    in_ch: int
    depth: int
    stride: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.in_ch == self.depth:
            shortcut = x[:, :: self.stride, :: self.stride, :]  # MaxPool2d(1, stride)
        else:
            shortcut = _ShortcutLayer(self.in_ch, self.depth, self.stride,
                                      name="shortcut_layer")(x, train=train)
        res = _ResLayerIRSE(self.in_ch, self.depth, self.stride, name="res_layer")(x, train=train)
        return res + shortcut


def get_blocks(num_layers: int = 50) -> List[Tuple[int, int, int]]:
    """(in_ch, depth, stride) per bottleneck (helpers.py:30-58)."""
    cfg = {
        # 8: TEST/DRYRUN-ONLY tiny trunk — one bottleneck per stage, same
        # stage-end channels/strides as IR-SE-50 (see e4e.trunk_layers)
        8: [(64, 64, 1), (64, 128, 1), (128, 256, 1), (256, 512, 1)],
        50: [(64, 64, 3), (64, 128, 4), (128, 256, 14), (256, 512, 3)],
        100: [(64, 64, 3), (64, 128, 13), (128, 256, 30), (256, 512, 3)],
        152: [(64, 64, 3), (64, 128, 8), (128, 256, 36), (256, 512, 3)],
    }[num_layers]
    out = []
    for in_ch, depth, units in cfg:
        out.append((in_ch, depth, 2))
        out.extend((depth, depth, 1) for _ in range(units - 1))
    return out


class _InputLayer(nn.Module):
    inp_ch: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv2d(self.inp_ch, 64, kernel=3, stride=1, padding=1, use_bias=False, name="0")(x)
        x = BatchNorm(64, name="1")(x, train=train)
        return PReLU(64, name="2")(x)


class _Body(nn.Module):
    num_layers: int
    taps: Tuple[int, ...]

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = {}
        for i, (in_ch, depth, stride) in enumerate(get_blocks(self.num_layers)):
            x = BottleneckIRSE(in_ch, depth, stride, name=str(i))(x, train=train)
            if i in self.taps:
                feats[i] = x
        return x, feats


class IRSETrunk(nn.Module):
    """input_layer + 24 IR-SE bottlenecks with configurable feature taps.

    Returns (final, {tap_index: feature}). Reference taps: e4e uses {6, 20, 23}
    (e4e.py:110-117), the U-Net encoders use {2, 6, 20, 21} (unet_encoders.py:144).
    """

    inp_ch: int = 3
    num_layers: int = 50
    taps: Tuple[int, ...] = (6, 20, 23)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _InputLayer(self.inp_ch, name="input_layer")(x, train=train)
        return _Body(self.num_layers, tuple(self.taps), name="body")(x, train=train)
