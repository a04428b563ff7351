"""StyleGAN2 primitive layers, TPU-native (flax.linen, NHWC, HWIO weights).

Behavioral counterpart of the reference's shipped module library
`training_avatar_texture/networks_stylegan2_new.py` (the `_new` variant used by
triplane_v20). Key design departures from the CUDA implementation:

  * Modulated conv runs in the "unfused" formulation — modulate activations,
    one shared batched convolution on the MXU, demodulate outputs
    (`networks_stylegan2_new.py:69-80` non-fused path). The reference's fused
    per-sample grouped conv exists only because cuDNN favors it; on TPU a
    batch-grouped conv would shatter MXU tiling.
  * Params are stored fp32; compute dtype is a module knob (bf16 for speed —
    bf16 has fp32's exponent range so the reference's fp16 pre-normalization
    `networks_stylegan2_new.py:54-56` is unnecessary, while the ±256 clamp is
    kept for checkpoint-parity of activations).
  * Weight layout is HWIO ([kh, kw, in, out]); FC weights are [in, out].
    The checkpoint importer transposes from torch's OIHW / [out, in].
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.bias_act import activation_funcs, bias_act
from ..ops.conv2d_resample import conv2d_resample
from ..ops.upfirdn2d import setup_filter
from ..utils.misc import assert_shape

Dtype = Any


def _matmul(x, w):
    precision = jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
    return jnp.matmul(x, w, precision=precision)


class FullyConnectedLayer(nn.Module):
    """Equalized-lr fully connected layer (reference networks_stylegan2_new.py:96-130)."""

    in_features: int
    out_features: int
    use_bias: bool = True
    activation: str = "linear"
    lr_multiplier: float = 1.0
    bias_init: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Optional[jnp.ndarray], return_params: bool = False):
        # torch init: randn / lr_multiplier, runtime gain lr_multiplier/sqrt(in).
        w = self.param(
            "weight",
            nn.initializers.normal(stddev=1.0 / self.lr_multiplier),
            (self.in_features, self.out_features),
            jnp.float32,
        )
        weight_gain = self.lr_multiplier / math.sqrt(self.in_features)
        b = None
        if self.use_bias:
            b = self.param(
                "bias",
                nn.initializers.constant(self.bias_init),
                (self.out_features,),
                jnp.float32,
            )
        if return_params:
            # effective (gain-folded) weights, e.g. for fused Pallas decoders
            return w * weight_gain, (b * self.lr_multiplier if b is not None else None)
        x = _matmul(x.astype(self.dtype), (w * weight_gain).astype(self.dtype))
        if b is not None:
            b = (b * self.lr_multiplier).astype(self.dtype)
        return bias_act(x, b, act=self.activation)


class Conv2dLayer(nn.Module):
    """Equalized-lr conv with optional FIR resampling (reference networks_stylegan2_new.py:135-188)."""

    in_channels: int
    out_channels: int
    kernel_size: int
    use_bias: bool = True
    activation: str = "linear"
    up: int = 1
    down: int = 1
    resample_filter: Sequence[int] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = None
    trainable: bool = True  # freezing is handled via optimizer masks; kept for API parity
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, gain: float = 1.0) -> jnp.ndarray:
        k = self.kernel_size
        w = self.param(
            "weight",
            nn.initializers.normal(stddev=1.0),
            (k, k, self.in_channels, self.out_channels),
            jnp.float32,
        )
        weight_gain = 1.0 / math.sqrt(self.in_channels * k * k)
        f = setup_filter(self.resample_filter)
        x = conv2d_resample(
            x.astype(self.dtype),
            (w * weight_gain).astype(self.dtype),
            f=f,
            up=self.up,
            down=self.down,
            padding=k // 2,
            flip_weight=(self.up == 1),
        )
        b = None
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channels,), jnp.float32)
        act_gain = activation_funcs[self.activation].def_gain * gain
        act_clamp = self.conv_clamp * gain if self.conv_clamp is not None else None
        return bias_act(x, b, act=self.activation, gain=act_gain, clamp=act_clamp)


def modulated_conv2d(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    styles: jnp.ndarray,
    noise: Optional[jnp.ndarray] = None,
    up: int = 1,
    down: int = 1,
    padding: int = 0,
    resample_filter: Optional[jnp.ndarray] = None,
    demodulate: bool = True,
    flip_weight: bool = True,
) -> jnp.ndarray:
    """Style-modulated conv (reference networks_stylegan2_new.py:34-91, unfused path).

    Args:
        x: `[B, H, W, Cin]` activations.
        weight: `[kh, kw, Cin, Cout]`.
        styles: `[B, Cin]` modulation from the affine layer.
        noise: optional additive noise, broadcastable to the output.
    """
    B = x.shape[0]
    kh, kw, in_ch, out_ch = weight.shape
    assert_shape(styles, [B, in_ch])

    # Modulate activations instead of weights: one shared conv over the batch.
    x = x * styles.astype(x.dtype)[:, None, None, :]
    x = conv2d_resample(
        x,
        weight.astype(x.dtype),
        f=resample_filter,
        up=up,
        down=down,
        padding=padding,
        flip_weight=flip_weight,
    )
    if demodulate:
        # dcoefs[b,o] = rsqrt(sum_{i,k} (w[o,i,k] * s[b,i])^2 + 1e-8)
        w2 = jnp.sum(jnp.square(weight.astype(jnp.float32)), axis=(0, 1))  # [Cin, Cout]
        d = jax.lax.rsqrt(_matmul(jnp.square(styles.astype(jnp.float32)), w2) + 1e-8)  # [B, Cout]
        if noise is not None:
            x = x * d.astype(x.dtype)[:, None, None, :] + noise.astype(x.dtype)
        else:
            x = x * d.astype(x.dtype)[:, None, None, :]
    elif noise is not None:
        x = x + noise.astype(x.dtype)
    return x


class SynthesisLayer(nn.Module):
    """Modulated conv + noise + bias_act (reference networks_stylegan2_new.py:276-340)."""

    in_channels: int
    out_channels: int
    w_dim: int
    resolution: int
    kernel_size: int = 3
    up: int = 1
    use_noise: bool = True
    activation: str = "lrelu"
    resample_filter: Sequence[int] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        w: jnp.ndarray,
        noise_mode: str = "random",
        gain: float = 1.0,
    ) -> jnp.ndarray:
        assert noise_mode in ("random", "const", "none")
        in_res = self.resolution // self.up
        assert_shape(x, [None, in_res, in_res, self.in_channels])

        affine = FullyConnectedLayer(
            self.w_dim, self.in_channels, bias_init=1.0, dtype=jnp.float32, name="affine"
        )
        styles = affine(w)

        weight = self.param(
            "weight",
            nn.initializers.normal(stddev=1.0),
            (self.kernel_size, self.kernel_size, self.in_channels, self.out_channels),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,), jnp.float32)

        noise = None
        if self.use_noise:
            noise_strength = self.param("noise_strength", nn.initializers.zeros, (), jnp.float32)
            noise_const = self.variable(
                "buffers",
                "noise_const",
                lambda: jax.random.normal(
                    self.make_rng("buffers"), (self.resolution, self.resolution), jnp.float32
                ),
            )
            if noise_mode == "random":
                noise = (
                    jax.random.normal(
                        self.make_rng("noise"), (x.shape[0], self.resolution, self.resolution, 1)
                    )
                    * noise_strength
                )
            elif noise_mode == "const":
                noise = noise_const.value[None, :, :, None] * noise_strength

        f = setup_filter(self.resample_filter)
        x = modulated_conv2d(
            x.astype(self.dtype),
            weight,
            styles,
            noise=noise,
            up=self.up,
            padding=self.kernel_size // 2,
            resample_filter=f,
            flip_weight=(self.up == 1),
        )
        act_gain = activation_funcs[self.activation].def_gain * gain
        act_clamp = self.conv_clamp * gain if self.conv_clamp is not None else None
        return bias_act(x, bias, act=self.activation, gain=act_gain, clamp=act_clamp)


class ToRGBLayer(nn.Module):
    """Modulated 1×1 conv without demodulation (reference networks_stylegan2_new.py:345-360)."""

    in_channels: int
    out_channels: int
    w_dim: int
    kernel_size: int = 1
    conv_clamp: Optional[float] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
        affine = FullyConnectedLayer(
            self.w_dim, self.in_channels, bias_init=1.0, dtype=jnp.float32, name="affine"
        )
        weight_gain = 1.0 / math.sqrt(self.in_channels * self.kernel_size**2)
        styles = affine(w) * weight_gain
        weight = self.param(
            "weight",
            nn.initializers.normal(stddev=1.0),
            (self.kernel_size, self.kernel_size, self.in_channels, self.out_channels),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,), jnp.float32)
        x = modulated_conv2d(x.astype(self.dtype), weight, styles, demodulate=False)
        return bias_act(x, bias, clamp=self.conv_clamp)


def normalize_2nd_moment(x: jnp.ndarray, axis: int = -1, eps: float = 1e-8) -> jnp.ndarray:
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=axis, keepdims=True) + eps)
