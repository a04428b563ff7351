"""Style-U-Net conditional synthesis family.

Behavioral counterpart of reference `encoder_inversion/models/networks_styleunet.py`:
an EncoderResBlock pyramid ingests the condition image, fusion convs inject the
multi-scale features into a DecoderBlock pyramid (optionally ConvGRU-recurrent
over T frames) that emits the multi-resolution feature list consumed by
`synthesis_withTexture`-style pipelines. `CondSynthesisNetworkWithGRU` is the
variant still imported by the shipped uvnet (networks_styleunet.py:1119-1257);
the plain variant covers `CondSynthesisNetwork` (:686). Superseded for the
shipped models by `unet_encoders` (SURVEY §2.2) — provided for inventory and
legacy-checkpoint compatibility.

Layout: NHWC; torch-matching module names for weight import.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

import jax

from ...ops.upfirdn2d import downsample2d, setup_filter, upsample2d
from ..layers import Conv2dLayer


class _StyleGRUGate(nn.Module):
    """Sequential('0' equalized Conv2dLayer) + fixed activation — the styleunet
    ConvGRU uses StyleGAN convs, unlike unet_encoders' plain nn.Conv2d gates
    (networks_styleunet.py:848-888)."""

    in_ch: int
    out_ch: int

    @nn.compact
    def __call__(self, x):
        return Conv2dLayer(self.in_ch, self.out_ch, 3, activation="linear", name="0")(x)


class StyleConvGRU(nn.Module):
    """ConvGRU with equalized-lr gates (networks_styleunet.py:848-888)."""

    channels: int

    @nn.compact
    def __call__(self, x, h=None):
        ih = _StyleGRUGate(self.channels * 2, self.channels * 2, name="ih")
        hh = _StyleGRUGate(self.channels * 2, self.channels, name="hh")

        def cell(x_t, h_t):
            rz = jax.nn.sigmoid(ih(jnp.concatenate([x_t, h_t], axis=-1)))
            r, z = jnp.split(rz, 2, axis=-1)
            c = jnp.tanh(hh(jnp.concatenate([x_t, r * h_t], axis=-1)))
            return (1 - z) * h_t + z * c

        if x.ndim == 4:
            h = jnp.zeros_like(x) if h is None else h
            out = cell(x, h)
            return out, out
        B, T = x.shape[:2]
        if h is None:
            h = jnp.zeros(x.shape[:1] + x.shape[2:], x.dtype)
        if self.is_initializing():
            out = cell(x[:, 0], h)
            return out, out
        import jax as _jax

        def step(h_t, x_t):
            o = cell(x_t, h_t)
            return o, 0.0

        # unroll: conv-in-rolled-scan hits a ~90x slower XLA:CPU path (see
        # unet_encoders.ConvGRU); T is small and static
        h_final, _ = _jax.lax.scan(step, h, jnp.moveaxis(x, 1, 0), unroll=True)
        return h_final, h_final


class EncoderResBlock(nn.Module):
    """fromrgb + 2 convs with optional pre-downsample (networks_styleunet.py)."""

    img_channel: int
    in_channel: int
    out_channel: int
    downsample: bool = True

    @nn.compact
    def __call__(self, inp, skip=None):
        f = setup_filter((1, 3, 3, 1))
        if self.downsample:
            inp = downsample2d(inp, f)
        out = Conv2dLayer(self.img_channel, self.in_channel, 1, activation="lrelu", name="fromrgb")(inp)
        if skip is not None:
            out = out + skip
        out = Conv2dLayer(self.in_channel, self.in_channel, 3, activation="lrelu", name="conv1")(out)
        out = Conv2dLayer(self.in_channel, self.out_channel, 3, down=2, activation="lrelu", name="conv2")(out)
        return inp, out


class DecoderBlock(nn.Module):
    """2 up-convs + lrelu ToRGB skip accumulation."""

    img_channel: int
    in_channel: int
    out_channel: int

    @nn.compact
    def __call__(self, x, img):
        x = Conv2dLayer(self.in_channel, self.out_channel, 3, up=2, activation="lrelu", name="conv0")(x)
        x = Conv2dLayer(self.out_channel, self.out_channel, 3, activation="lrelu", name="conv1")(x)
        if img is not None:
            img = upsample2d(img, setup_filter((1, 3, 3, 1)))
        y = Conv2dLayer(self.out_channel, self.img_channel, 1, activation="lrelu", name="torgb")(x)
        img = img + y if img is not None else y
        return x, img


class RecurrentDecoderBlock(nn.Module):
    """DecoderBlock + ConvGRU over the frame axis (networks_styleunet.py)."""

    img_channel: int
    in_channel: int
    out_channel: int

    @nn.compact
    def __call__(self, x, img, T: int, r=None):
        x = Conv2dLayer(self.in_channel, self.out_channel, 3, up=2, activation="lrelu", name="conv0")(x)
        x = Conv2dLayer(self.out_channel, self.out_channel, 3, activation="lrelu", name="conv1")(x)
        BT = x.shape[0]
        x_time = x.reshape(BT // T, T, *x.shape[1:])
        x_time, r = StyleConvGRU(self.out_channel, name="gru")(x_time, r)
        if img is not None:
            img = upsample2d(img, setup_filter((1, 3, 3, 1)))
        y = Conv2dLayer(self.out_channel, self.img_channel, 1, activation="lrelu", name="torgb")(x_time)
        img = img + y if img is not None else y
        return x_time, img, r


class _EncoderList(nn.Module):
    specs: Tuple[Tuple[int, int, int, bool], ...]  # (img_ch, in_ch, out_ch, downsample)

    @nn.compact
    def __call__(self, x_in):
        conds = []
        cond_out = None
        for i, (img_ch, in_ch, out_ch, down) in enumerate(self.specs):
            x_in, cond_out = EncoderResBlock(img_ch, in_ch, out_ch, downsample=down, name=str(i))(
                x_in, cond_out
            )
            conds.append(cond_out)
        return conds


class _FusionList(nn.Module):
    specs: Tuple[Tuple[int, int], ...]  # (in_ch, out_ch)

    @nn.compact
    def __call__(self, i: int, x):
        in_ch, out_ch = self.specs[i]
        return Conv2dLayer(in_ch, out_ch, 3, activation="linear", name=str(i))(x)


class CondSynthesisNetworkWithGRU(nn.Module):
    """Recurrent style-U-Net (networks_styleunet.py:1119-1257)."""

    img_resolution: int
    img_channels: int
    cond_channels: int = 3
    in_size: int = 64
    final_size: int = 4
    channel_base: int = 32768
    channel_max: int = 512
    num_cond_res: int = 64

    def _channels(self, res):
        return min(self.channel_base // res, self.channel_max)

    @nn.compact
    def __call__(self, x_cond, r_list=None, fix_encoder: bool = False, return_list: bool = False):
        """x_cond [B, T, H, W, C]; returns (img | feature list, r_list)."""
        assert x_cond.ndim == 5
        B, T = x_cond.shape[:2]
        x_in = x_cond.reshape(B * T, *x_cond.shape[2:])

        log2 = int(np.log2(self.img_resolution))
        flog2 = int(np.log2(self.final_size))
        block_res = [2**i for i in range(flog2 + 1, log2 + 1)]
        enc_res = [2**i for i in range(int(np.log2(self.in_size)), flog2 - 1, -1)]

        enc_specs = tuple(
            (self.cond_channels, self._channels(res), self._channels(res // 2), res < self.in_size)
            for res in enc_res[:-1]
        )
        conds = _EncoderList(enc_specs, name="encoder")(x_in)
        if fix_encoder:
            import jax

            conds = [jax.lax.stop_gradient(c) for c in conds]
        conds = conds[::-1]

        fusion_specs = []
        for i, res in enumerate(enc_res[::-1]):
            ch = self._channels(res)
            fusion_specs.append((ch if res <= self.final_size else ch * 2, ch))
        fusion = _FusionList(tuple(fusion_specs), name="fusion")

        if r_list is None:
            r_list = [None] * len(block_res)
        new_r = list(r_list)
        x = img = None
        x_list = []
        start_layer = int(np.log2(32)) - flog2 - 1
        for _index, res in enumerate(block_res):
            if 2 ** (_index + flog2) < self.num_cond_res:
                if res == block_res[0]:
                    x = fusion(_index, conds[_index])
                else:
                    x = fusion(_index, jnp.concatenate([x, conds[_index]], axis=-1))
            block = RecurrentDecoderBlock(
                self.img_channels,
                self._channels(res // 2),
                self._channels(res),
                name=f"b{res}",
            )
            x, img, new_r[_index] = block(x, img, T, r_list[_index])
            if _index >= start_layer and return_list:
                if _index == start_layer:
                    x_list.append(img)
                x_list.append(x)
            x = jnp.repeat(x, T, axis=0)
        if return_list:
            x_list.append(img)
            return x_list, new_r
        return img, new_r


class CondSynthesisNetwork(nn.Module):
    """Non-recurrent variant (networks_styleunet.py:686): same pyramid with
    plain decoder blocks; input is a single condition image [B, H, W, C].
    `residual_arch` adds the condition image back onto the output (:773-776)."""

    img_resolution: int
    img_channels: int
    cond_channels: int = 3
    in_size: int = 64
    final_size: int = 4
    channel_base: int = 32768
    channel_max: int = 512
    num_cond_res: int = 64
    residual_arch: bool = False

    def _channels(self, res):
        return min(self.channel_base // res, self.channel_max)

    @nn.compact
    def __call__(self, x_cond, return_list: bool = False):
        assert x_cond.ndim == 4
        log2 = int(np.log2(self.img_resolution))
        flog2 = int(np.log2(self.final_size))
        block_res = [2**i for i in range(flog2 + 1, log2 + 1)]
        enc_res = [2**i for i in range(int(np.log2(self.in_size)), flog2 - 1, -1)]

        enc_specs = tuple(
            (self.cond_channels, self._channels(res), self._channels(res // 2), res < self.in_size)
            for res in enc_res[:-1]
        )
        conds = _EncoderList(enc_specs, name="encoder")(x_cond)[::-1]

        fusion_specs = []
        for res in enc_res[::-1]:
            ch = self._channels(res)
            fusion_specs.append((ch if res <= self.final_size else ch * 2, ch))
        fusion = _FusionList(tuple(fusion_specs), name="fusion")

        x = img = None
        x_list = []
        start_layer = int(np.log2(32)) - flog2 - 1
        for _index, res in enumerate(block_res):
            if 2 ** (_index + flog2) < self.num_cond_res:
                if res == block_res[0]:
                    x = fusion(_index, conds[_index])
                else:
                    x = fusion(_index, jnp.concatenate([x, conds[_index]], axis=-1))
            x, img = DecoderBlock(
                self.img_channels, self._channels(res // 2), self._channels(res), name=f"b{res}"
            )(x, img)
            if _index >= start_layer and return_list:
                if _index == start_layer:
                    x_list.append(img)
                x_list.append(x)
        if self.residual_arch:
            assert img.shape[-1] == x_cond.shape[-1]
            from ...ops.resize import resize_bilinear

            res_in = (
                x_cond
                if x_cond.shape[1:3] == img.shape[1:3]
                else resize_bilinear(x_cond, img.shape[1:3], antialias=True)
            )
            img = img + res_in
        if return_list:
            x_list.append(img)
            return x_list
        return img


class DecoderBlockNew(nn.Module):
    """DecoderBlock_new (networks_styleunet.py:153-192): condition features
    concatenated between conv0 and conv1; torgb only for 'skip' blocks."""

    img_channel: int
    in_channel: int
    out_channel: int
    cond_channel: int = 0
    architecture: str = "skip"
    use_gru: bool = False

    @nn.compact
    def __call__(self, x, img, cond=None, T: int = 0, r=None):
        x = Conv2dLayer(self.in_channel, self.out_channel, 3, up=2, activation="lrelu", name="conv0")(x)
        if self.cond_channel > 0:
            x = jnp.concatenate([x, cond], axis=-1)
        x = Conv2dLayer(self.out_channel + self.cond_channel, self.out_channel, 3,
                        activation="lrelu", name="conv1")(x)
        if self.use_gru:
            x_time = x.reshape(x.shape[0] // T, T, *x.shape[1:])
            x, r = StyleConvGRU(self.out_channel, name="gru")(x_time, r)
        if img is not None:
            img = upsample2d(img, setup_filter((1, 3, 3, 1)))
        if self.architecture == "skip":
            y = Conv2dLayer(self.out_channel, self.img_channel, 1, activation="lrelu", name="torgb")(x)
            img = img + y if img is not None else y
        if self.use_gru:
            return x, img, r
        return x, img


class CondSynthesisNetworkNew(nn.Module):
    """CondSynthesisNetwork_new (networks_styleunet.py:889-971): no fusion
    convs — the encoder feature at each resolution concatenates between the
    decoder block's convs; only the 32² block carries a ToRGB skip."""

    img_resolution: int
    img_channels: int
    cond_channels: int = 3
    in_size: int = 64
    final_size: int = 4
    channel_base: int = 32768
    channel_max: int = 512
    num_cond_res: int = 64

    def _channels(self, res):
        return min(self.channel_base // res, self.channel_max)

    @nn.compact
    def __call__(self, x_cond, return_list: bool = False):
        assert x_cond.ndim == 4
        log2 = int(np.log2(self.img_resolution))
        flog2 = int(np.log2(self.final_size))
        block_res = [2**i for i in range(flog2 + 1, log2 + 1)]
        enc_res = [2**i for i in range(int(np.log2(self.in_size)), flog2 - 1, -1)]

        enc_specs = tuple(
            (self.cond_channels, self._channels(res), self._channels(res // 2), res < self.in_size)
            for res in enc_res[:-1]
        )
        conds = _EncoderList(enc_specs, name="encoder")(x_cond)
        cond_list = ([None] + conds)[::-1]

        x = cond_list[0]
        img = None
        x_list = []
        start_layer = int(np.log2(32)) - flog2 - 1
        for _index, res in enumerate(block_res):
            cond = cond_list[_index + 1]
            x_out = DecoderBlockNew(
                self.img_channels,
                self._channels(res // 2),
                self._channels(res),
                cond_channel=self._channels(res) if res < self.img_resolution else 0,
                architecture="skip" if res == 32 else "orig",
                name=f"b{res}",
            )(x, img, cond)
            x, img = x_out
            if _index >= start_layer and return_list:
                if _index == start_layer:
                    x_list.append(img)
                x_list.append(x)
        if return_list:
            x_list.append(img)
            return x_list
        return img


class ConvFusionDecoderBlock(nn.Module):
    """ConvFusionDecoderBlock (networks_styleunet.py:195-229): fuses the T
    frames' features with one conv over the stacked channels."""

    img_channel: int
    in_channel: int
    out_channel: int
    T: int = 4

    @nn.compact
    def __call__(self, x, img, T: int, r=None):
        x = Conv2dLayer(self.in_channel, self.out_channel, 3, up=2, activation="lrelu", name="conv0")(x)
        x = Conv2dLayer(self.out_channel, self.out_channel, 3, activation="lrelu", name="conv1")(x)
        BT = x.shape[0]
        x_time = x.reshape(BT // T, T, *x.shape[1:])
        # [B, T, H, W, C] -> [B, H, W, T*C]: torch flatten(1,2) groups (T, C)
        # channel-major, so transpose T next to C before merging
        x_time = jnp.transpose(x_time, (0, 2, 3, 1, 4)).reshape(
            BT // T, x.shape[1], x.shape[2], T * x.shape[3]
        )
        x_time = Conv2dLayer(self.out_channel * T, self.out_channel, 3,
                             activation="lrelu", name="conv_fusion")(x_time)
        if img is not None:
            img = upsample2d(img, setup_filter((1, 3, 3, 1)))
        y = Conv2dLayer(self.out_channel, self.img_channel, 1, activation="lrelu", name="torgb")(x_time)
        img = img + y if img is not None else y
        return x_time, img, r


class CondSynthesisNetworkWithConvFusion(nn.Module):
    """CondSynthesisNetwork_withConvFusion (networks_styleunet.py:1257-1390):
    the recurrent GRU replaced by a per-level conv over the T stacked frames."""

    img_resolution: int
    img_channels: int
    cond_channels: int = 3
    in_size: int = 64
    final_size: int = 4
    channel_base: int = 32768
    channel_max: int = 512
    num_cond_res: int = 64

    def _channels(self, res):
        return min(self.channel_base // res, self.channel_max)

    @nn.compact
    def __call__(self, x_cond, r_list=None, fix_encoder: bool = False, return_list: bool = False):
        assert x_cond.ndim == 5
        B, T = x_cond.shape[:2]
        x_in = x_cond.reshape(B * T, *x_cond.shape[2:])

        log2 = int(np.log2(self.img_resolution))
        flog2 = int(np.log2(self.final_size))
        block_res = [2**i for i in range(flog2 + 1, log2 + 1)]
        enc_res = [2**i for i in range(int(np.log2(self.in_size)), flog2 - 1, -1)]

        enc_specs = tuple(
            (self.cond_channels, self._channels(res), self._channels(res // 2), res < self.in_size)
            for res in enc_res[:-1]
        )
        conds = _EncoderList(enc_specs, name="encoder")(x_in)
        if fix_encoder:
            conds = [jax.lax.stop_gradient(c) for c in conds]
        conds = conds[::-1]

        fusion_specs = tuple(
            (self._channels(res) * (2 if res > self.final_size else 1), self._channels(res))
            for res in enc_res[::-1]
        )
        fusion = _FusionList(fusion_specs, name="fusion")

        if r_list is None:
            r_list = [None] * len(block_res)
        new_r = list(r_list)
        x = img = None
        x_list = []
        start_layer = int(np.log2(32)) - flog2 - 1
        for _index, res in enumerate(block_res):
            if 2 ** (_index + flog2) < self.num_cond_res:
                if _index == 0:
                    x = fusion(0, conds[0])
                else:
                    x = fusion(_index, jnp.concatenate([x, conds[_index]], axis=-1))
            x, img, new_r[_index] = ConvFusionDecoderBlock(
                self.img_channels, self._channels(res // 2), self._channels(res),
                name=f"b{res}",
            )(x, img, T, r_list[_index])
            if _index >= start_layer and return_list:
                if _index == start_layer:
                    x_list.append(img)
                x_list.append(x)
            x = jnp.repeat(x, T, axis=0)
        if return_list:
            x_list.append(img)
            return x_list, new_r
        return img, new_r


class DecoderBlockSFT(nn.Module):
    """DecoderBlock_SFT (networks_styleunet.py:267-312): GRU between the two
    convs, (scale, shift) SFT heads on the output."""

    img_channel: int
    in_channel: int
    out_channel: int
    architecture: str = "orig"
    use_gru: bool = False
    out_sft: bool = False

    @nn.compact
    def __call__(self, x, img, T=None, r=None):
        x = Conv2dLayer(self.in_channel, self.out_channel, 3, up=2, activation="lrelu", name="conv0")(x)
        if self.use_gru:
            x_time = x.reshape(x.shape[0] // T, T, *x.shape[1:])
            x, r = StyleConvGRU(self.out_channel, name="gru")(x_time, r)
        x = Conv2dLayer(self.out_channel, self.out_channel, 3, activation="lrelu", name="conv1")(x)
        if img is not None:
            img = upsample2d(img, setup_filter((1, 3, 3, 1)))
        if self.architecture == "skip":
            y = Conv2dLayer(self.out_channel, self.img_channel, 1, activation="lrelu", name="torgb")(x)
            img = img + y if img is not None else y
        sft = None
        if self.out_sft:
            half = self.out_channel // 2
            scale = Conv2dLayer(self.out_channel, half, 3, activation="linear", name="condition_scale")(x)
            shift = Conv2dLayer(self.out_channel, half, 3, activation="linear", name="condition_shift")(x)
            sft = (scale, shift)
        return x, sft, img, r


class CondSynthesisNetworkSFT(nn.Module):
    """CondSynthesisNetwork_SFT (networks_styleunet.py:974-1117): emits a
    per-resolution {(scale, shift)} dict for the generator's CS-SFT hook
    instead of images. The reference's non-GRU branch is broken (it re-expands
    an already-[B*T] tensor); only the shipped `use_gru=True` path is
    implemented."""

    img_resolution: int
    img_channels: int
    cond_channels: int = 3
    in_size: int = 64
    final_size: int = 4
    channel_base: int = 32768
    channel_max: int = 512
    num_cond_res: int = 64
    out_start_res: int = 16

    def _channels(self, res):
        return min(self.channel_base // res, self.channel_max)

    @nn.compact
    def __call__(self, x_cond, r_list=None):
        assert x_cond.ndim == 5, "use_gru path expects [B, T, H, W, C] clips"
        B, T = x_cond.shape[:2]
        x_in = x_cond.reshape(B * T, *x_cond.shape[2:])

        log2 = int(np.log2(self.img_resolution))
        flog2 = int(np.log2(self.final_size))
        block_res = [2**i for i in range(flog2 + 1, log2 + 1)]
        enc_res = [2**i for i in range(int(np.log2(self.in_size)), flog2 - 1, -1)]

        enc_specs = tuple(
            (self.cond_channels, self._channels(res), self._channels(res // 2), res < self.in_size)
            for res in enc_res[:-1]
        )
        conds = _EncoderList(enc_specs, name="encoder")(x_in)[::-1]

        fusion_specs = tuple(
            (self._channels(res) * (2 if res > self.final_size else 1), self._channels(res))
            for res in enc_res[::-1]
        )
        fusion = _FusionList(fusion_specs, name="fusion")

        if r_list is None:
            r_list = [None] * len(block_res)
        new_r = list(r_list)
        x = img = None
        out = {}
        start_layer = int(np.log2(self.out_start_res)) - flog2 - 1
        for _index, res in enumerate(block_res):
            if 2 ** (_index + flog2) < self.num_cond_res:
                if _index == 0:
                    x = fusion(0, conds[0])
                else:
                    x = fusion(_index, jnp.concatenate([x, conds[_index]], axis=-1))
            x, sft, img, new_r[_index] = DecoderBlockSFT(
                self.img_channels, self._channels(res // 2), self._channels(res),
                architecture="orig", use_gru=True,
                out_sft=(res >= self.out_start_res), name=f"b{res}",
            )(x, img, T, r_list[_index])
            if _index >= start_layer:
                out[res] = sft
            x = jnp.repeat(x, T, axis=0)
        return out, new_r


class PlainSynthesisNetwork(nn.Module):
    """networks_styleunet.py:788-846 SynthesisNetwork: decoder-only pyramid
    seeded by external (x, img) features at `final_size` — the upsampling tail
    used when encoder features come from elsewhere."""

    img_resolution: int
    img_channels: int
    final_size: int = 4
    channel_base: int = 32768
    channel_max: int = 512

    def _channels(self, res):
        return min(self.channel_base // res, self.channel_max)

    @nn.compact
    def __call__(self, x, img, return_list: bool = False):
        assert x.shape[1] == img.shape[1] == self.final_size
        log2 = int(np.log2(self.img_resolution))
        flog2 = int(np.log2(self.final_size))
        block_res = [2**i for i in range(flog2 + 1, log2 + 1)]

        x_list = []
        start_out_res = 32
        if start_out_res == self.final_size:
            x_list.append(img)
            x_list.append(x)
        start_layer = int(np.log2(start_out_res)) - flog2 - 1
        for _index, res in enumerate(block_res):
            x, img = DecoderBlock(
                self.img_channels, self._channels(res // 2), self._channels(res),
                name=f"b{res}",
            )(x, img)
            if _index >= start_layer and return_list:
                if _index == start_layer:
                    x_list.append(img)
                x_list.append(x)
        if return_list:
            x_list.append(img)
            return x_list
        return img
