"""StyleGAN3 (alias-free) generator, TPU-native.

Behavioral counterpart of reference `training_avatar_texture/networks_stylegan3.py`
(:27-520): Fourier-feature input with learned rotation/translation, modulated
1×1/3×3 convs with input-magnitude EMA, and per-layer Kaiser/jinc low-pass
filters around the leaky ReLU (`ops/filtered_lrelu`). No shipped InvertAvatar
entry point uses it (SURVEY §2.1) — provided for model-inventory completeness.

Filter design and the layer frequency schedule are host-side numpy/scipy at
module-construction time (static), so everything under jit is pure conv math.
Layout: NHWC.
"""

from __future__ import annotations

import math
from typing import Any, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import scipy.signal
import scipy.special

from ..ops.conv2d_resample import conv2d_resample
from ..ops.filtered_lrelu import filtered_lrelu
from ..utils.misc import assert_shape
from .layers import FullyConnectedLayer
from .mapping import MappingNetwork


def design_lowpass_filter(numtaps: int, cutoff: float, width: float, fs: float,
                          radial: bool = False) -> Optional[np.ndarray]:
    """Kaiser separable / jinc radial low-pass (networks_stylegan3.py:366-387)."""
    assert numtaps >= 1
    if numtaps == 1:
        return None
    if not radial:
        return scipy.signal.firwin(numtaps=numtaps, cutoff=cutoff, width=width, fs=fs).astype(np.float32)
    x = (np.arange(numtaps) - (numtaps - 1) / 2) / fs
    r = np.hypot(*np.meshgrid(x, x))
    f = scipy.special.j1(2 * cutoff * (np.pi * r)) / (np.pi * r)
    beta = scipy.signal.kaiser_beta(scipy.signal.kaiser_atten(numtaps, width / (fs / 2)))
    w = np.kaiser(numtaps, beta)
    f *= np.outer(w, w)
    f /= np.sum(f)
    return f.astype(np.float32)


def sg3_modulated_conv2d(x, weight, styles, input_gain=None, demodulate=True, padding=0):
    """SG3 modconv (networks_stylegan3.py:27-66) in the unfused activation form.

    x `[B,H,W,Cin]`, weight `[kh,kw,Cin,Cout]`, styles `[B,Cin]`.
    """
    kh, kw, cin, cout = weight.shape
    if demodulate:
        weight = weight * jax.lax.rsqrt(jnp.mean(jnp.square(weight), axis=(0, 1, 2), keepdims=True))
        styles = styles * jax.lax.rsqrt(jnp.mean(jnp.square(styles)))
    s_in = styles
    if input_gain is not None:
        s_in = s_in * input_gain
    x = x * s_in.astype(x.dtype)[:, None, None, :]
    x = conv2d_resample(x, weight, padding=padding, flip_weight=True)
    if demodulate:
        w2 = jnp.sum(jnp.square(weight.astype(jnp.float32)), axis=(0, 1))  # [Cin, Cout]
        prec = jax.lax.Precision.HIGHEST
        d = jax.lax.rsqrt(jnp.matmul(jnp.square(styles.astype(jnp.float32)), w2, precision=prec) + 1e-8)
        x = x * d.astype(x.dtype)[:, None, None, :]
    return x


class SynthesisInput(nn.Module):
    """Fourier-feature input with learned transform (networks_stylegan3.py:171-252)."""

    w_dim: int
    channels: int
    size: int
    sampling_rate: float
    bandwidth: float

    @nn.compact
    def __call__(self, w):
        freqs_init = self.variable(
            "buffers", "freqs",
            lambda: _disc_freqs(self.make_rng("buffers") if self.has_rng("buffers") else jax.random.PRNGKey(0),
                                self.channels, self.bandwidth),
        )
        phases_init = self.variable(
            "buffers", "phases",
            lambda: jax.random.uniform(
                self.make_rng("buffers") if self.has_rng("buffers") else jax.random.PRNGKey(1),
                (self.channels,)) - 0.5,
        )
        transform = self.variable("buffers", "transform", lambda: jnp.eye(3))
        weight = self.param("weight", nn.initializers.normal(1.0), (self.channels, self.channels), jnp.float32)
        affine = FullyConnectedLayer(self.w_dim, 4, bias_init=0.0, name="affine")
        # weight_init=0, bias=[1,0,0,0]: emulate via zero weight + explicit bias add
        t = affine(w)
        t = t + jnp.asarray([1.0, 0.0, 0.0, 0.0])
        t = t / jnp.linalg.norm(t[:, :2], axis=1, keepdims=True)

        B = w.shape[0]
        m_r = jnp.tile(jnp.eye(3)[None], (B, 1, 1))
        m_r = m_r.at[:, 0, 0].set(t[:, 0]).at[:, 0, 1].set(-t[:, 1])
        m_r = m_r.at[:, 1, 0].set(t[:, 1]).at[:, 1, 1].set(t[:, 0])
        m_t = jnp.tile(jnp.eye(3)[None], (B, 1, 1))
        m_t = m_t.at[:, 0, 2].set(-t[:, 2]).at[:, 1, 2].set(-t[:, 3])
        transforms = m_r @ m_t @ transform.value[None]

        freqs = freqs_init.value[None] @ transforms[:, :2, :2]
        phases = phases_init.value[None] + (freqs_init.value[None] @ transforms[:, :2, 2:])[..., 0]
        amplitudes = jnp.clip(
            1 - (jnp.linalg.norm(freqs, axis=2) - self.bandwidth)
            / (self.sampling_rate / 2 - self.bandwidth),
            0, 1,
        )

        # sampling grid (affine_grid semantics, align_corners=False)
        half = 0.5 * self.size / self.sampling_rate
        coords = (jnp.arange(self.size) + 0.5) / self.size * 2 - 1
        gx, gy = jnp.meshgrid(coords * half, coords * half, indexing="xy")
        grid = jnp.stack([gx, gy], axis=-1)  # [H, W, 2]

        x = jnp.einsum("hwj,bcj->bhwc", grid, freqs) + phases[:, None, None, :]
        x = jnp.sin(x * (2 * np.pi)) * amplitudes[:, None, None, :]
        x = x @ (weight / math.sqrt(self.channels)).T
        return x  # [B, size, size, C]


def _disc_freqs(key, channels, bandwidth):
    freqs = jax.random.normal(key, (channels, 2))
    radii = jnp.linalg.norm(freqs, axis=1, keepdims=True)
    freqs = freqs / (radii * jnp.exp(jnp.square(radii)) ** 0.25)
    return freqs * bandwidth


class SG3SynthesisLayer(nn.Module):
    """Modconv + filtered lrelu with designed filters (networks_stylegan3.py:255-364)."""

    w_dim: int
    is_torgb: bool
    is_critically_sampled: bool
    in_channels: int
    out_channels: int
    in_size: int
    out_size: int
    in_sampling_rate: float
    out_sampling_rate: float
    in_cutoff: float
    out_cutoff: float
    in_half_width: float
    out_half_width: float
    conv_kernel: int = 3
    filter_size: int = 6
    lrelu_upsampling: int = 2
    use_radial_filters: bool = False
    conv_clamp: Optional[float] = 256.0
    magnitude_ema_beta: float = 0.999

    @nn.compact
    def __call__(self, x, w, update_emas: bool = False):
        k = 1 if self.is_torgb else self.conv_kernel
        tmp_rate = max(self.in_sampling_rate, self.out_sampling_rate) * (
            1 if self.is_torgb else self.lrelu_upsampling
        )
        up_factor = int(round(tmp_rate / self.in_sampling_rate))
        down_factor = int(round(tmp_rate / self.out_sampling_rate))
        up_taps = self.filter_size * up_factor if up_factor > 1 and not self.is_torgb else 1
        down_taps = self.filter_size * down_factor if down_factor > 1 and not self.is_torgb else 1
        down_radial = self.use_radial_filters and not self.is_critically_sampled

        fu = design_lowpass_filter(up_taps, self.in_cutoff, self.in_half_width * 2, tmp_rate)
        fd = design_lowpass_filter(
            down_taps, self.out_cutoff, self.out_half_width * 2, tmp_rate, radial=down_radial
        )
        fu = jnp.asarray(fu) if fu is not None else None
        fd = jnp.asarray(fd) if fd is not None else None

        pad_total = (self.out_size - 1) * down_factor + 1
        pad_total -= (self.in_size + k - 1) * up_factor
        pad_total += up_taps + down_taps - 2
        pad_lo = (pad_total + up_factor) // 2
        pad_hi = pad_total - pad_lo
        padding = [int(pad_lo), int(pad_hi), int(pad_lo), int(pad_hi)]

        affine = FullyConnectedLayer(self.w_dim, self.in_channels, bias_init=1.0, name="affine")
        weight = self.param(
            "weight", nn.initializers.normal(1.0), (k, k, self.in_channels, self.out_channels), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,), jnp.float32)
        magnitude_ema = self.variable("buffers", "magnitude_ema", lambda: jnp.ones((), jnp.float32))

        if update_emas:
            cur = jnp.mean(jnp.square(jax.lax.stop_gradient(x).astype(jnp.float32)))
            magnitude_ema.value = cur + self.magnitude_ema_beta * (magnitude_ema.value - cur)
        input_gain = jax.lax.rsqrt(magnitude_ema.value)

        styles = affine(w)
        if self.is_torgb:
            styles = styles * (1 / math.sqrt(self.in_channels * k**2))
        x = sg3_modulated_conv2d(
            x, weight, styles, input_gain=input_gain, demodulate=not self.is_torgb, padding=k - 1
        )
        gain = 1.0 if self.is_torgb else math.sqrt(2.0)
        slope = 1.0 if self.is_torgb else 0.2
        x = filtered_lrelu(
            x, fu, fd, bias, up=up_factor, down=down_factor, padding=padding,
            gain=gain, slope=slope, clamp=self.conv_clamp,
        )
        assert_shape(x, [None, self.out_size, self.out_size, self.out_channels])
        return x


class SG3SynthesisNetwork(nn.Module):
    """Frequency-scheduled layer stack (networks_stylegan3.py:401-489)."""

    w_dim: int
    img_resolution: int
    img_channels: int
    channel_base: int = 32768
    channel_max: int = 512
    num_layers: int = 14
    num_critical: int = 2
    first_cutoff: float = 2.0
    first_stopband: float = 2**2.1
    last_stopband_rel: float = 2**0.3
    margin_size: int = 10
    output_scale: float = 0.25
    num_fp16_res: int = 4

    @property
    def num_ws(self):
        return self.num_layers + 2

    def _schedule(self):
        last_cutoff = self.img_resolution / 2
        last_stopband = last_cutoff * self.last_stopband_rel
        exponents = np.minimum(
            np.arange(self.num_layers + 1) / (self.num_layers - self.num_critical), 1
        )
        cutoffs = self.first_cutoff * (last_cutoff / self.first_cutoff) ** exponents
        stopbands = self.first_stopband * (last_stopband / self.first_stopband) ** exponents
        sampling_rates = np.exp2(np.ceil(np.log2(np.minimum(stopbands * 2, self.img_resolution))))
        half_widths = np.maximum(stopbands, sampling_rates / 2) - cutoffs
        sizes = sampling_rates + self.margin_size * 2
        sizes[-2:] = self.img_resolution
        channels = np.rint(np.minimum((self.channel_base / 2) / cutoffs, self.channel_max))
        channels[-1] = self.img_channels
        return cutoffs, sampling_rates, half_widths, sizes.astype(int), channels.astype(int)

    @nn.compact
    def __call__(self, ws, update_emas: bool = False):
        assert_shape(ws, [None, self.num_ws, self.w_dim])
        ws = ws.astype(jnp.float32)
        cutoffs, rates, half_widths, sizes, channels = self._schedule()

        x = SynthesisInput(
            w_dim=self.w_dim, channels=int(channels[0]), size=int(sizes[0]),
            sampling_rate=float(rates[0]), bandwidth=float(cutoffs[0]), name="input",
        )(ws[:, 0])
        for idx in range(self.num_layers + 1):
            prev = max(idx - 1, 0)
            layer = SG3SynthesisLayer(
                w_dim=self.w_dim,
                is_torgb=(idx == self.num_layers),
                is_critically_sampled=(idx >= self.num_layers - self.num_critical),
                in_channels=int(channels[prev]),
                out_channels=int(channels[idx]),
                in_size=int(sizes[prev]),
                out_size=int(sizes[idx]),
                in_sampling_rate=float(rates[prev]),
                out_sampling_rate=float(rates[idx]),
                in_cutoff=float(cutoffs[prev]),
                out_cutoff=float(cutoffs[idx]),
                in_half_width=float(half_widths[prev]),
                out_half_width=float(half_widths[idx]),
                name=f"L{idx}_{int(sizes[idx])}_{int(channels[idx])}",
            )
            x = layer(x, ws[:, idx + 1], update_emas=update_emas)
        if self.output_scale != 1:
            x = x * self.output_scale
        return x.astype(jnp.float32)


class SG3Generator(nn.Module):
    """Mapping + alias-free synthesis (networks_stylegan3.py:492-517)."""

    z_dim: int
    c_dim: int
    w_dim: int
    img_resolution: int
    img_channels: int
    map_num_layers: int = 2
    num_layers: int = 14
    channel_base: int = 32768
    channel_max: int = 512

    def setup(self):
        self.synthesis = SG3SynthesisNetwork(
            w_dim=self.w_dim, img_resolution=self.img_resolution, img_channels=self.img_channels,
            channel_base=self.channel_base, channel_max=self.channel_max, num_layers=self.num_layers,
        )
        self.mapping = MappingNetwork(
            z_dim=self.z_dim, c_dim=self.c_dim, w_dim=self.w_dim,
            num_ws=self.synthesis.num_ws, num_layers=self.map_num_layers,
        )

    def __call__(self, z, c, truncation_psi=1.0, truncation_cutoff=None, update_emas=False):
        ws = self.mapping(z, c, truncation_psi=truncation_psi, truncation_cutoff=truncation_cutoff,
                          update_emas=update_emas)
        return self.synthesis(ws, update_emas=update_emas)
