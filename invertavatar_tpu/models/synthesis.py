"""StyleGAN2 synthesis network with the v20 extensions, TPU-native.

Behavioral counterpart of reference `training_avatar_texture/networks_stylegan2_new.py`
(SynthesisBlock :365-470, SynthesisNetwork :474-554, Generator :558-585) — the
shipped backbone of triplane_v20, which adds three extensions over vanilla
StyleGAN2:
  1. `return_list` multi-resolution feature taps [img_lo, x_lo, ..., x_hi, img_hi]
  2. `cond_list` face-copy alpha blending injected at each pyramid level
  3. CS-SFT `feat_conditions` — per-resolution (scale, shift) applied to half
     the channels between conv0 and conv1

Mixed precision: the reference's per-resolution fp16 toggle becomes a bf16
compute dtype for the N highest resolutions (`num_fp16_res`); ToRGB outputs
accumulate in fp32 exactly like the reference.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.upfirdn2d import setup_filter, upsample2d
from ..utils.misc import assert_shape
from .layers import Conv2dLayer, SynthesisLayer, ToRGBLayer
from .mapping import MappingNetwork


class SynthesisBlock(nn.Module):
    """One resolution level: (conv0 up) + conv1 + skip-arch ToRGB accumulation."""

    in_channels: int
    out_channels: int
    w_dim: int
    resolution: int
    img_channels: int
    is_last: bool
    architecture: str = "skip"
    resample_filter: Sequence[int] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = 256.0
    use_fp16: bool = False  # on TPU: compute in bfloat16
    no_upsample: bool = False  # SynthesisBlockNoUp variant (superresolution.py:157)
    dtype_fp16: Any = jnp.bfloat16

    @property
    def num_conv(self) -> int:
        return 1 if self.in_channels == 0 else 2

    @property
    def num_torgb(self) -> int:
        return 1 if (self.is_last or self.architecture == "skip") else 0

    @nn.compact
    def __call__(
        self,
        x: Optional[jnp.ndarray],
        img: Optional[jnp.ndarray],
        ws: jnp.ndarray,
        condition: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        force_fp32: bool = False,
        noise_mode: str = "random",
    ):
        assert self.architecture in ("orig", "skip", "resnet")
        assert_shape(ws, [None, self.num_conv + self.num_torgb, self.w_dim])
        dtype = self.dtype_fp16 if (self.use_fp16 and not force_fp32) else jnp.float32
        up = 1 if self.no_upsample else 2
        w_idx = 0

        def next_w():
            nonlocal w_idx
            w = ws[:, w_idx]
            w_idx += 1
            return w

        if self.in_channels == 0:
            const = self.param(
                "const",
                nn.initializers.normal(stddev=1.0),
                (self.resolution, self.resolution, self.out_channels),
                jnp.float32,
            )
            x = jnp.broadcast_to(
                const.astype(dtype)[None],
                (ws.shape[0], self.resolution, self.resolution, self.out_channels),
            )
            x = SynthesisLayer(
                self.out_channels,
                self.out_channels,
                w_dim=self.w_dim,
                resolution=self.resolution,
                conv_clamp=self.conv_clamp,
                resample_filter=self.resample_filter,
                dtype=dtype,
                name="conv1",
            )(x, next_w(), noise_mode=noise_mode)
        else:
            in_res = self.resolution if self.no_upsample else self.resolution // 2
            assert_shape(x, [None, in_res, in_res, self.in_channels])
            x = x.astype(dtype)
            conv0 = SynthesisLayer(
                self.in_channels,
                self.out_channels,
                w_dim=self.w_dim,
                resolution=self.resolution,
                up=up,
                conv_clamp=self.conv_clamp,
                resample_filter=self.resample_filter,
                dtype=dtype,
                name="conv0",
            )
            conv1 = SynthesisLayer(
                self.out_channels,
                self.out_channels,
                w_dim=self.w_dim,
                resolution=self.resolution,
                conv_clamp=self.conv_clamp,
                resample_filter=self.resample_filter,
                dtype=dtype,
                name="conv1",
            )
            if self.architecture == "resnet":
                skip = Conv2dLayer(
                    self.in_channels,
                    self.out_channels,
                    kernel_size=1,
                    use_bias=False,
                    up=up,
                    resample_filter=self.resample_filter,
                    dtype=dtype,
                    name="skip",
                )
                y = skip(x, gain=math.sqrt(0.5))
                x = conv0(x, next_w(), noise_mode=noise_mode)
                x = conv1(x, next_w(), noise_mode=noise_mode, gain=math.sqrt(0.5))
                x = y + x
            else:
                x = conv0(x, next_w(), noise_mode=noise_mode)
                if condition is not None:
                    # CS-SFT (networks_stylegan2_new.py:448-452): modulate the
                    # second half of the channels with (scale, shift).
                    half = x.shape[-1] // 2
                    scale, shift = condition
                    x_same, x_sft = x[..., :half], x[..., half:]
                    x_sft = x_sft * scale.astype(x.dtype) + shift.astype(x.dtype)
                    x = jnp.concatenate([x_same, x_sft], axis=-1)
                x = conv1(x, next_w(), noise_mode=noise_mode)

        if img is not None and not self.no_upsample:
            in_res = self.resolution // 2
            assert_shape(img, [None, in_res, in_res, self.img_channels])
            f = setup_filter(self.resample_filter)
            img = upsample2d(img, f)

        if self.is_last or self.architecture == "skip":
            y = ToRGBLayer(
                self.out_channels,
                self.img_channels,
                w_dim=self.w_dim,
                conv_clamp=self.conv_clamp,
                dtype=dtype,
                name="torgb",
            )(x, next_w())
            y = y.astype(jnp.float32)
            img = img + y if img is not None else y

        assert x.dtype == dtype
        assert img is None or img.dtype == jnp.float32
        return x, img


class SynthesisNetwork(nn.Module):
    """Full pyramid 4 → img_resolution with the v20 taps/conditioning
    (reference networks_stylegan2_new.py:474-554)."""

    w_dim: int
    img_resolution: int
    img_channels: int
    channel_base: int = 32768
    channel_max: int = 512
    num_fp16_res: int = 4
    conv_clamp: Optional[float] = 256.0
    architecture: str = "skip"

    @property
    def block_resolutions(self) -> List[int]:
        log2 = int(np.log2(self.img_resolution))
        return [2**i for i in range(2, log2 + 1)]

    @property
    def channels_dict(self) -> Dict[int, int]:
        return {res: min(self.channel_base // res, self.channel_max) for res in self.block_resolutions}

    @property
    def num_ws(self) -> int:
        n = 0
        for res in self.block_resolutions:
            n += 1 if res == 4 else 2
            if res == self.img_resolution:
                n += 1
        return n

    @nn.compact
    def __call__(
        self,
        ws: jnp.ndarray,
        cond_list: Optional[List[jnp.ndarray]] = None,
        return_list: bool = False,
        feat_conditions: Optional[Dict[int, Tuple[jnp.ndarray, jnp.ndarray]]] = None,
        out_res: Tuple[int, ...] = (32, 256),
        noise_mode: str = "random",
        force_fp32: bool = False,
    ):
        assert_shape(ws, [None, self.num_ws, self.w_dim])
        ws = ws.astype(jnp.float32)
        log2 = int(np.log2(self.img_resolution))
        fp16_resolution = max(2 ** (log2 + 1 - self.num_fp16_res), 8)

        # Per-block w slices: block sees num_conv+num_torgb ws, index advances
        # by num_conv (torgb reuses the next block's first w — StyleGAN2 idiom).
        block_ws = []
        w_idx = 0
        for res in self.block_resolutions:
            num_conv = 1 if res == 4 else 2
            num_torgb = 1 if res == self.img_resolution else 0
            # skip-arch: every block has a torgb consuming one extra w
            take = num_conv + (1 if self.architecture == "skip" else num_torgb)
            block_ws.append(jax.lax.slice_in_dim(ws, w_idx, w_idx + take, axis=1))
            w_idx += num_conv

        x = img = None
        x_list: List[jnp.ndarray] = []
        start_layer = int(np.log2(out_res[0])) - 2
        end_layer = (log2 - 2) if len(out_res) == 1 else (int(np.log2(out_res[1])) - 2)
        for _index, (res, cur_ws) in enumerate(zip(self.block_resolutions, block_ws)):
            cond_feat = None
            if feat_conditions is not None and res in feat_conditions:
                cond_feat = feat_conditions[res]
            block = SynthesisBlock(
                in_channels=self.channels_dict[res // 2] if res > 4 else 0,
                out_channels=self.channels_dict[res],
                w_dim=self.w_dim,
                resolution=res,
                img_channels=self.img_channels,
                is_last=(res == self.img_resolution),
                architecture=self.architecture,
                conv_clamp=self.conv_clamp,
                use_fp16=(res >= fp16_resolution),
                name=f"b{res}",
            )
            x, img = block(x, img, cur_ws, condition=cond_feat, noise_mode=noise_mode, force_fp32=force_fp32)
            if _index >= start_layer:
                if return_list:
                    if _index == start_layer:
                        x_list.append(img)
                    x_list.append(x)
                if cond_list is not None:
                    if _index == start_layer:
                        # face-copy blend into the low-res image tap (:536-540)
                        c0, a0 = cond_list[0][..., :-1], cond_list[0][..., -1:]
                        img = c0 * a0 + img * (1 - a0)
                    if _index < end_layer:
                        cond = cond_list[1 + _index - start_layer]
                        c, a = cond[..., :-1], cond[..., -1:]
                        x = (c * a + x.astype(jnp.float32) * (1 - a)).astype(x.dtype)
        if return_list:
            x_list.append(img)
            return x_list
        return img


class Generator(nn.Module):
    """Mapping + synthesis wrapper (reference networks_stylegan2_new.py:558-585)."""

    z_dim: int
    c_dim: int
    w_dim: int
    img_resolution: int
    img_channels: int
    mapping_ws: int = -1  # override #ws produced by mapping (triplane_v20.py:54)
    channel_base: int = 32768
    channel_max: int = 512
    num_fp16_res: int = 4
    conv_clamp: Optional[float] = 256.0
    map_num_layers: int = 8
    map_lr_multiplier: float = 0.01
    map_w_avg_beta: Optional[float] = 0.998

    def setup(self):
        self.synthesis = SynthesisNetwork(
            w_dim=self.w_dim,
            img_resolution=self.img_resolution,
            img_channels=self.img_channels,
            channel_base=self.channel_base,
            channel_max=self.channel_max,
            num_fp16_res=self.num_fp16_res,
            conv_clamp=self.conv_clamp,
        )
        num_ws = self.mapping_ws if self.mapping_ws != -1 else self.synthesis.num_ws
        self.mapping = MappingNetwork(
            z_dim=self.z_dim,
            c_dim=self.c_dim,
            w_dim=self.w_dim,
            num_ws=num_ws,
            num_layers=self.map_num_layers,
            lr_multiplier=self.map_lr_multiplier,
            w_avg_beta=self.map_w_avg_beta,
        )

    @property
    def num_ws(self) -> int:
        return self.synthesis.num_ws

    def __call__(self, z, c, truncation_psi=1.0, truncation_cutoff=None, update_emas=False, **synth_kwargs):
        ws = self.mapping(z, c, truncation_psi=truncation_psi, truncation_cutoff=truncation_cutoff, update_emas=update_emas)
        return self.synthesis(ws, **synth_kwargs)
