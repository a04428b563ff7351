"""StyleGAN2 discriminators, TPU-native.

Behavioral counterparts of reference `networks_stylegan2_new.py:589-829`
(DiscriminatorBlock / MinibatchStdLayer / DiscriminatorEpilogue / Discriminator)
and `training_avatar_texture/dual_discriminator.py:87-182` (filtered_resizing,
DualDiscriminator — the shipped GAN critic that concatenates the 512² RGB with
the bilinearly-upsampled raw neural render).

Notes:
  * The minibatch-std group (4) is computed per data shard, exactly matching the
    reference's per-GPU semantics under data parallelism (SURVEY.md §2.3).
  * `freeze_layers` is expressed through optimizer masks, not buffer vs param.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.resize import resize_bilinear
from ..ops.upfirdn2d import downsample2d, setup_filter
from ..utils.misc import assert_shape
from .layers import Conv2dLayer, FullyConnectedLayer
from .mapping import MappingNetwork


class DiscriminatorBlock(nn.Module):
    in_channels: int
    tmp_channels: int
    out_channels: int
    resolution: int
    img_channels: int
    architecture: str = "resnet"
    activation: str = "lrelu"
    resample_filter: Sequence[int] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = None
    use_fp16: bool = False
    dtype_fp16: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, img, force_fp32: bool = False):
        dtype = self.dtype_fp16 if (self.use_fp16 and not force_fp32) else jnp.float32
        if x is not None:
            assert_shape(x, [None, self.resolution, self.resolution, self.in_channels])
            x = x.astype(dtype)

        if self.in_channels == 0 or self.architecture == "skip":
            assert_shape(img, [None, self.resolution, self.resolution, self.img_channels])
            img = img.astype(dtype)
            y = Conv2dLayer(
                self.img_channels, self.tmp_channels, kernel_size=1,
                activation=self.activation, conv_clamp=self.conv_clamp, dtype=dtype, name="fromrgb",
            )(img)
            x = x + y if x is not None else y
            img = (
                downsample2d(img, setup_filter(self.resample_filter))
                if self.architecture == "skip"
                else None
            )

        conv0 = Conv2dLayer(
            self.tmp_channels, self.tmp_channels, kernel_size=3,
            activation=self.activation, conv_clamp=self.conv_clamp, dtype=dtype, name="conv0",
        )
        conv1 = Conv2dLayer(
            self.tmp_channels, self.out_channels, kernel_size=3, down=2,
            activation=self.activation, resample_filter=self.resample_filter,
            conv_clamp=self.conv_clamp, dtype=dtype, name="conv1",
        )
        if self.architecture == "resnet":
            skip = Conv2dLayer(
                self.tmp_channels, self.out_channels, kernel_size=1, use_bias=False, down=2,
                resample_filter=self.resample_filter, dtype=dtype, name="skip",
            )
            y = skip(x, gain=math.sqrt(0.5))
            x = conv0(x)
            x = conv1(x, gain=math.sqrt(0.5))
            x = y + x
        else:
            x = conv0(x)
            x = conv1(x)
        assert x.dtype == dtype
        return x, img


class MinibatchStdLayer(nn.Module):
    group_size: Optional[int] = 4
    num_channels: int = 1

    @nn.compact
    def __call__(self, x):
        N, H, W, C = x.shape
        G = min(self.group_size, N) if self.group_size is not None else N
        F = self.num_channels
        c = C // F
        y = x.astype(jnp.float32).reshape(G, -1, H, W, F, c)
        y = y - jnp.mean(y, axis=0)
        y = jnp.mean(jnp.square(y), axis=0)
        y = jnp.sqrt(y + 1e-8)
        y = jnp.mean(y, axis=(1, 2, 4))  # [n, F]
        y = y.reshape(-1, 1, 1, F)
        y = jnp.tile(y, (G, H, W, 1)).astype(x.dtype)
        return jnp.concatenate([x, y], axis=-1)


class DiscriminatorEpilogue(nn.Module):
    in_channels: int
    cmap_dim: int
    resolution: int
    img_channels: int
    architecture: str = "resnet"
    mbstd_group_size: Optional[int] = 4
    mbstd_num_channels: int = 1
    activation: str = "lrelu"
    conv_clamp: Optional[float] = None

    @nn.compact
    def __call__(self, x, img, cmap):
        assert_shape(x, [None, self.resolution, self.resolution, self.in_channels])
        x = x.astype(jnp.float32)
        if self.architecture == "skip":
            x = x + Conv2dLayer(
                self.img_channels, self.in_channels, kernel_size=1,
                activation=self.activation, name="fromrgb",
            )(img.astype(jnp.float32))
        if self.mbstd_num_channels > 0:
            x = MinibatchStdLayer(self.mbstd_group_size, self.mbstd_num_channels, name="mbstd")(x)
        x = Conv2dLayer(
            self.in_channels + self.mbstd_num_channels, self.in_channels, kernel_size=3,
            activation=self.activation, conv_clamp=self.conv_clamp, name="conv",
        )(x)
        # torch flattens NCHW; transpose so the fc weight layout matches on import.
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
        x = FullyConnectedLayer(
            self.in_channels * self.resolution**2, self.in_channels,
            activation=self.activation, name="fc",
        )(x)
        x = FullyConnectedLayer(
            self.in_channels, 1 if self.cmap_dim == 0 else self.cmap_dim, name="out"
        )(x)
        if self.cmap_dim > 0:
            assert_shape(cmap, [None, self.cmap_dim])
            x = jnp.sum(x * cmap, axis=1, keepdims=True) * (1.0 / math.sqrt(self.cmap_dim))
        return x


class _DiscriminatorCore(nn.Module):
    """Shared block pyramid + epilogue (reference Discriminator :589-720 body)."""

    c_dim: int
    img_resolution: int
    img_channels: int
    architecture: str = "resnet"
    channel_base: int = 32768
    channel_max: int = 512
    num_fp16_res: int = 4
    conv_clamp: Optional[float] = 256.0
    cmap_dim: Optional[int] = None
    disc_c_noise: float = 0.0
    mbstd_group_size: Optional[int] = 4

    @property
    def block_resolutions(self):
        log2 = int(np.log2(self.img_resolution))
        return [2**i for i in range(log2, 2, -1)]

    def _channels(self, res):
        return min(self.channel_base // res, self.channel_max)

    def _cmap_dim(self):
        cmap_dim = self.cmap_dim if self.cmap_dim is not None else self._channels(4)
        return 0 if self.c_dim == 0 else cmap_dim

    @nn.compact
    def _score(self, img, c, force_fp32: bool = False):
        log2 = int(np.log2(self.img_resolution))
        fp16_resolution = max(2 ** (log2 + 1 - self.num_fp16_res), 8)
        x = None
        for res in self.block_resolutions:
            x, img = DiscriminatorBlock(
                in_channels=self._channels(res) if res < self.img_resolution else 0,
                tmp_channels=self._channels(res),
                out_channels=self._channels(res // 2),
                resolution=res,
                img_channels=self.img_channels,
                architecture=self.architecture,
                conv_clamp=self.conv_clamp,
                use_fp16=(res >= fp16_resolution),
                name=f"b{res}",
            )(x, img, force_fp32=force_fp32)

        cmap = None
        if self.c_dim > 0:
            cmap = MappingNetwork(
                z_dim=0, c_dim=self.c_dim, w_dim=self._cmap_dim(), num_ws=None,
                w_avg_beta=None, name="mapping",
            )(None, c)
        x = DiscriminatorEpilogue(
            in_channels=self._channels(4),
            cmap_dim=self._cmap_dim(),
            resolution=4,
            img_channels=self.img_channels,
            architecture=self.architecture,
            conv_clamp=self.conv_clamp,
            mbstd_group_size=self.mbstd_group_size,
            name="b4",
        )(x, img, cmap)
        return x


class Discriminator(_DiscriminatorCore):
    """Single-image StyleGAN2 discriminator (reference networks_stylegan2_new.py:660)."""

    def __call__(self, img, c, force_fp32: bool = False):
        return self._score(img, c, force_fp32=force_fp32)


class DualDiscriminator(_DiscriminatorCore):
    """EG3D dual discriminator (reference dual_discriminator.py:107-182): scores
    [image(512²) ‖ antialias-upsampled image_raw] with pose conditioning via cmap.

    `img_channels` is the full pyramid input count (the reference passes
    `training_set.num_channels * 2` at construction, training_loop.py:227-231).
    """

    def __call__(self, img: Dict[str, jnp.ndarray], c, force_fp32: bool = False):
        image = img["image"]  # [B, R, R, 3]
        image_raw = resize_bilinear(
            img["image_raw"], (image.shape[1], image.shape[2]), antialias=True
        )
        x = jnp.concatenate([image, image_raw], axis=-1)
        if self.c_dim > 0 and c is not None:
            c = c[:, : self.c_dim]
            if self.disc_c_noise > 0:
                noise = jax.random.normal(self.make_rng("noise"), c.shape, c.dtype)
                c = c + noise * jnp.std(c, axis=0) * self.disc_c_noise
        return self._score(x, c, force_fp32=force_fp32)


class SingleDiscriminator(_DiscriminatorCore):
    """Scores only the 512² RGB (reference dual_discriminator.py:22-79)."""

    def __call__(self, img: Dict[str, jnp.ndarray], c, force_fp32: bool = False):
        return self._score(img["image"], c, force_fp32=force_fp32)


class DummyDualDiscriminator(_DiscriminatorCore):
    """Dual discriminator whose raw branch fades out over training
    (reference dual_discriminator.py:187-252). `raw_fade` is passed in rather
    than mutated module state (jit-friendly)."""

    def __call__(self, img: Dict[str, jnp.ndarray], c, raw_fade: float = 1.0,
                 force_fp32: bool = False):
        image = img["image"]
        image_raw = resize_bilinear(
            img["image_raw"], (image.shape[1], image.shape[2]), antialias=True
        ) * raw_fade
        x = jnp.concatenate([image, image_raw], axis=-1)
        return self._score(x, c, force_fp32=force_fp32)


class VideoDiscriminator(nn.Module):
    """Pairwise temporal discriminator (reference dual_discriminator.py:260-352):
    scores a frame pair ‖ time-delta channel, conditioned on both cameras.
    Present in the reference but not in shipped configs (SURVEY §2.2)."""

    c_dim: int
    img_resolution: int
    img_channels: int  # per-frame; pyramid input = 2×this + 1 time channel
    channel_base: int = 32768
    channel_max: int = 512
    num_fp16_res: int = 4
    conv_clamp: Optional[float] = 256.0
    cmap_dim: Optional[int] = None
    disc_c_noise: float = 0.0

    @nn.compact
    def __call__(self, img: Dict[str, jnp.ndarray], Ts, c, force_fp32: bool = False):
        # img['image']: [B*T, H, W, C]; Ts: [B, T]; c: [B, T, c_dim+]
        T = Ts.shape[1]
        BT, H, W, C = img["image"].shape
        B = BT // T
        frames = img["image"].reshape(B, T, H, W, C)
        stacked = jnp.concatenate([frames[:, t] for t in range(T)], axis=-1)
        dt = (Ts[:, 1] - Ts[:, 0]).reshape(B, 1, 1, 1)
        x = jnp.concatenate([stacked, jnp.broadcast_to(dt, (B, H, W, 1))], axis=-1)
        if H != self.img_resolution:
            x = resize_bilinear(x, (self.img_resolution, self.img_resolution), antialias=True)
        c = c[..., : self.c_dim].reshape(B, -1)
        if self.disc_c_noise > 0:
            noise = jax.random.normal(self.make_rng("noise"), c.shape, c.dtype)
            c = c + noise * jnp.std(c, axis=0) * self.disc_c_noise
        core = _DiscriminatorCore(
            c_dim=self.c_dim * T,
            img_resolution=self.img_resolution,
            img_channels=self.img_channels * T + 1,
            channel_base=self.channel_base,
            channel_max=self.channel_max,
            num_fp16_res=self.num_fp16_res,
            conv_clamp=self.conv_clamp,
            cmap_dim=self.cmap_dim,
            name="core",
        )
        return core._score(x, c, force_fp32=force_fp32)


def construct_log_spaced_freqs(max_num_frames: int, skip_small_t_freqs: int = 0) -> np.ndarray:
    """Reference dual_discriminator.py:541-548."""
    time_resolution = 2 ** np.ceil(np.log2(max_num_frames))
    num_fourier_feats = int(np.ceil(np.log2(time_resolution)))
    powers = 2.0 ** np.arange(num_fourier_feats)
    powers = powers[: len(powers) - skip_small_t_freqs]
    return (powers[None].astype(np.float32) * np.pi) / time_resolution  # [1, nf]


class FixedTimeEncoder(nn.Module):
    """Log-spaced Fourier time features (reference dual_discriminator.py:468-494)."""

    max_num_frames: int
    skip_small_t_freqs: int = 0

    @property
    def dim(self) -> int:
        return construct_log_spaced_freqs(self.max_num_frames, self.skip_small_t_freqs).shape[1] * 2

    @nn.compact
    def __call__(self, t):
        coefs = self.variable(
            "buffers", "fourier_coefs",
            lambda: jnp.asarray(construct_log_spaced_freqs(self.max_num_frames, self.skip_small_t_freqs)),
        ).value
        raw = coefs * t.reshape(-1).astype(jnp.float32)[:, None]
        return jnp.concatenate([jnp.sin(raw), jnp.cos(raw)], axis=1)


class TemporalDifferenceEncoder(nn.Module):
    """Frame-gap embedding (reference dual_discriminator.py:497-538):
    learned gap-index embedding ‖ Fourier features of the gap."""

    max_num_frames: int = 32
    num_frames_per_video: int = 2
    sampling_type: str = "random"
    d: int = 256

    @property
    def dim(self) -> int:
        if self.num_frames_per_video == 1:
            return 1
        per = self.d + FixedTimeEncoder(self.max_num_frames).dim
        return per if self.sampling_type == "uniform" else per * (self.num_frames_per_video - 1)

    @nn.compact
    def __call__(self, t):
        B = t.shape[0]
        if self.num_frames_per_video == 1:
            return jnp.zeros((B, 1), jnp.float32)
        if self.sampling_type == "uniform":
            t_diffs = (t[:, 1] - t[:, 0]).reshape(-1)
        else:
            t_diffs = (t[:, 1:] - t[:, :-1]).reshape(-1)
        class _Embedding(nn.Module):
            n: int
            d: int

            @nn.compact
            def __call__(self, idx):
                # stored transposed [d, n]: the torch importer transposes every
                # 2-D "weight" with Linear semantics, and this layout makes the
                # round trip land correctly (torch nn.Embedding weight is [n, d])
                w = self.param("weight", nn.initializers.normal(1.0), (self.d, self.n), jnp.float32)
                return w[:, idx].T

        const_embs = _Embedding(self.max_num_frames, self.d, name="const_embed")(
            jnp.round(t_diffs.astype(jnp.float32)).astype(jnp.int32)
        )
        fourier = FixedTimeEncoder(self.max_num_frames, name="time_encoder")(t_diffs[:, None])
        return jnp.concatenate([const_embs, fourier], axis=1).reshape(B, -1)


class FusionVideoDiscriminator(nn.Module):
    """Video discriminator fusing frame features mid-pyramid (reference
    dual_discriminator.py:353-461): frames run separately down to `concat_res`
    where their (width-reduced) features concatenate along channels; camera
    labels of all frames + the TemporalDifferenceEncoder gap embedding feed
    the cmap projection. Present in the reference but not in shipped configs."""

    c_dim: int
    img_resolution: int
    img_channels: int
    architecture: str = "resnet"
    channel_base: int = 32768
    channel_max: int = 512
    num_fp16_res: int = 4
    conv_clamp: Optional[float] = 256.0
    cmap_dim: Optional[int] = None
    disc_c_noise: float = 0.0
    concat_res: int = 16
    num_frames_div_factor: int = 2
    num_frames_per_video: int = 2
    max_num_frames: int = 32

    @nn.compact
    def __call__(self, img: Dict[str, jnp.ndarray], Ts, c, force_fp32: bool = False):
        log2 = int(np.log2(self.img_resolution))
        block_resolutions = [2**i for i in range(log2, 2, -1)]
        channels = lambda res: min(self.channel_base // res, self.channel_max)
        fp16_resolution = max(2 ** (log2 + 1 - self.num_fp16_res), 8)
        cmap_dim = self.cmap_dim if self.cmap_dim is not None else channels(4)
        if self.c_dim == 0:
            cmap_dim = 0

        T = Ts.shape[1]
        x_img = img["image"]  # [B*T, H, W, C]
        if x_img.shape[1] != self.img_resolution:
            x_img = resize_bilinear(
                x_img, (self.img_resolution, self.img_resolution), antialias=True
            )

        time_enc = TemporalDifferenceEncoder(
            self.max_num_frames, self.num_frames_per_video, name="time_encoder"
        )
        cc = c[..., : self.c_dim].reshape(c.shape[0], -1)
        t_embs = time_enc(Ts)
        cc = jnp.concatenate([cc, t_embs], axis=1)
        if self.disc_c_noise > 0:
            noise = jax.random.normal(self.make_rng("noise"), cc.shape, cc.dtype)
            cc = cc + noise * jnp.std(cc, axis=0) * self.disc_c_noise

        x = None
        cur = x_img
        for res in block_resolutions:
            in_ch = channels(res) if res < self.img_resolution else 0
            out_ch = channels(res // 2)
            if res // 2 == self.concat_res:
                out_ch = out_ch // self.num_frames_div_factor
            if res == self.concat_res:
                in_ch = (in_ch // self.num_frames_div_factor) * self.num_frames_per_video
                # concat frame features along channels [(b t), h, w, c] -> [b, h, w, t*c]
                BT, hh, ww, ch = x.shape
                x = x.reshape(BT // T, T, hh, ww, ch)
                x = jnp.concatenate([x[:, t] for t in range(T)], axis=-1)
                cur = None
            x, cur = DiscriminatorBlock(
                in_channels=in_ch,
                tmp_channels=channels(res),
                out_channels=out_ch,
                resolution=res,
                img_channels=self.img_channels,
                architecture=self.architecture,
                conv_clamp=self.conv_clamp,
                use_fp16=(res >= fp16_resolution),
                name=f"b{res}",
            )(x, cur, force_fp32=force_fp32)

        cmap = None
        if self.c_dim > 0:
            cmap = MappingNetwork(
                z_dim=0,
                c_dim=self.c_dim * self.num_frames_per_video + time_enc.dim,
                w_dim=cmap_dim, num_ws=None, w_avg_beta=None, name="mapping",
            )(None, cc)
        return DiscriminatorEpilogue(
            in_channels=channels(4), cmap_dim=cmap_dim, resolution=4,
            img_channels=self.img_channels, architecture=self.architecture,
            conv_clamp=self.conv_clamp, name="b4",
        )(x, cur, cmap)


def filtered_resizing(image, size: int, filter_mode: str = "antialiased"):
    """Reference dual_discriminator.py:87-103 resize modes (NHWC)."""
    if filter_mode == "antialiased":
        return resize_bilinear(image, (size, size), antialias=True)
    if filter_mode == "none":
        return resize_bilinear(image, (size, size), antialias=False)
    if isinstance(filter_mode, float):
        assert 0 < filter_mode < 1
        filtered = resize_bilinear(image, (size, size), antialias=True)
        aliased = resize_bilinear(image, (size, size), antialias=False)
        return (1 - filter_mode) * aliased + filter_mode * filtered
    raise ValueError(f"unsupported filter_mode {filter_mode}")
