"""ConvGRU U-Net offset encoders (reference encoder_inversion/models/unet_encoders.py).

Two IR-SE-50 U-Nets predicting offsets on top of the e4e inversion:
  * `TriPlanefeatEncoder` ("texture_unet"): 7-ch UV-space input → additive
    offsets for the texture feature list at res 32/32/64/128 (:101-246)
  * `TriPlaneSFTfeatEncoder` ("triplane_unet"): 6-ch image-space input →
    per-resolution CS-SFT (scale, shift) dicts for the static backbone (:249-362)

Both aggregate evidence over T frames via ConvGRU gates in the decoder
(`recurrent_Up`). The time rollout is a `lax.scan` (sequential by construction;
the per-frame trunk is batched over B·T — SURVEY §5 long-context note).
Module names mirror torch for checkpoint import. Layout: NHWC.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .e4e import trunk_layers
from .irse import BatchNorm, Conv2d, PReLU


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """torch.nn.PixelShuffle semantics on NHWC."""
    if r == 1:
        return x
    B, H, W, C = x.shape
    x = x.reshape(B, H, W, C // (r * r), r, r)
    x = jnp.transpose(x, (0, 1, 4, 2, 5, 3))
    return x.reshape(B, H * r, W * r, C // (r * r))


def adaptive_avg_pool(x: jnp.ndarray, res: int) -> jnp.ndarray:
    """AdaptiveAvgPool2d((res, res)) for integer downscale factors."""
    H = x.shape[1]
    if H == res:
        return x
    assert H % res == 0, (H, res)
    k = H // res
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k, k, 1), (1, k, k, 1), "VALID"
    ) / float(k * k)


class _GRUGate(nn.Module):
    """Sequential('0' conv) + fixed activation."""

    in_ch: int
    out_ch: int

    @nn.compact
    def __call__(self, x):
        return Conv2d(self.in_ch, self.out_ch, kernel=3, stride=1, padding=1, name="0")(x)


class ConvGRU(nn.Module):
    """Conv gated recurrence over feature maps (unet_encoders.py:8-49)."""

    channels: int

    @nn.compact
    def __call__(self, x, h: Optional[jnp.ndarray] = None, seq2seq: bool = False):
        """x: [B, T, H, W, C] (time series) or [B, H, W, C] (single frame)."""
        ih = _GRUGate(self.channels * 2, self.channels * 2, name="ih")
        hh = _GRUGate(self.channels * 2, self.channels, name="hh")

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
            # trace the cell once outside scan so params materialize
            out = cell(x[:, 0], h)
            return (jnp.repeat(out[:, None], T, 1) if seq2seq else out), out

        def step(h_t, x_t):
            o = cell(x_t, h_t)
            return o, (o if seq2seq else 0.0)

        # unroll: T is small and static everywhere (<=6 per multi-T chunk,
        # 4-frame ar_forward chunks), and XLA:CPU executes convolutions inside
        # a rolled scan body via a catastrophically slow non-Eigen path
        # (~90x: 248s vs 1.4s for one T=2 GRU backward at 96ch/128^2).
        # Unrolling also lets XLA fuse gates across steps on TPU.
        h_final, outs = jax.lax.scan(step, h, jnp.moveaxis(x, 1, 0), unroll=True)
        if seq2seq:
            return jnp.moveaxis(outs, 0, 1), h_final
        return h_final, h_final


class DoubleConv(nn.Module):
    """BN + 2×(conv+PReLU) + PReLU (unet_encoders.py:53-69); child 'double_conv'."""

    in_ch: int
    out_ch: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        dc = _DoubleConvSeq(self.in_ch, self.out_ch, name="double_conv")
        return dc(x, train=train)


class _DoubleConvSeq(nn.Module):
    in_ch: int
    out_ch: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = BatchNorm(self.in_ch, name="0")(x, train=train)
        x = Conv2d(self.in_ch, self.out_ch, kernel=3, stride=1, padding=1, name="1")(x)
        x = PReLU(self.out_ch, name="2")(x)
        x = Conv2d(self.out_ch, self.out_ch, kernel=3, stride=1, padding=1, name="3")(x)
        x = PReLU(self.out_ch, name="4")(x)
        return PReLU(self.out_ch, name="5")(x)


class RecurrentUp(nn.Module):
    """PixelShuffle + DoubleConv + ConvGRU (unet_encoders.py:87-101)."""

    in_ch: int
    out_ch: int
    upscale: int = 2

    @nn.compact
    def __call__(self, x1, x2, T: int, r=None, seq2seq: bool = False, train: bool = False):
        x1 = pixel_shuffle(x1, self.upscale)
        x = DoubleConv(self.in_ch, self.out_ch, name="conv")(
            jnp.concatenate([x2, x1], axis=-1), train=train
        )
        BT = x.shape[0]
        x = x.reshape(BT // T, T, *x.shape[1:])
        return ConvGRU(self.out_ch, name="conv_gru")(x, r, seq2seq)


class Up(nn.Module):
    """Non-recurrent variant (unet_encoders.py:72-84)."""

    in_ch: int
    out_ch: int
    upscale: int = 2

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        x1 = pixel_shuffle(x1, self.upscale)
        return DoubleConv(self.in_ch, self.out_ch, name="conv")(
            jnp.concatenate([x2, x1], axis=-1), train=train
        )


def _expand_T(x: jnp.ndarray, T: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B*T, H, W, C] (torch unsqueeze/expand/flatten idiom)."""
    return jnp.repeat(x, T, axis=0)


def _fit_res(x: jnp.ndarray, res: int) -> jnp.ndarray:
    """Pool down to `res` (the reference AdaptiveAvgPool2d path) or resize up
    (only reachable with shrunken test generators)."""
    if x.shape[1] == res:
        return x
    if x.shape[1] > res:
        return adaptive_avg_pool(x, res)
    from ...ops.resize import resize_bilinear

    return resize_bilinear(x, (res, res))


class TriPlanefeatEncoder(nn.Module):
    """texture_unet (unet_encoders.py:101-246). Input [B, T, 256, 256, 7] (UV
    space: uv_gttex 3 + uv_delta 3 + mask 1); output 4 offset maps + GRU states."""

    inp_ch: int = 7
    res: Optional[int] = 256
    use_gru: bool = True
    # offset channels for the texture taps [img32, x32, x64, x128] — the
    # flagship generator widths (unet_encoders.py:131-134); configurable so
    # tiny test generators can be driven end-to-end
    out_channels: Tuple[int, int, int, int] = (32, 512, 512, 256)
    trunk_layers_n: int = 50  # 8 = tiny trunk (test/dryrun-only)

    @nn.compact
    def __call__(self, x, r_list=None, train: bool = False):
        assert x.ndim == 5, "expected [B, T, H, W, C]"
        B, T = x.shape[:2]
        x = x.reshape(B * T, *x.shape[2:])
        if self.res is not None:
            x = _fit_res(x, self.res)
        xf, feats = trunk_layers(self.inp_ch, (2, 6, 20, 21), x, train,
                                 num_layers=self.trunk_layers_n)
        c0, c1, c2, c3 = feats[2], feats[6], feats[20], feats[21]

        oc = self.out_channels
        if r_list is None:
            r_list = [None] * 4
        new_r = [None] * 4
        out = []
        if self.use_gru:
            tp, new_r[0] = RecurrentUp(1024, 512, upscale=1, name="up1")(xf, c3, T, r_list[0], train=train)
            tp, new_r[1] = RecurrentUp(384, 384, name="up2")(_expand_T(tp, T), c2, T, r_list[1], train=train)
            out.append(Conv2d(384, oc[0], kernel=1, padding=0, name="outconv0")(tp))
            out.append(Conv2d(384, oc[1], kernel=1, padding=0, name="outconv1")(tp))
            tp, new_r[2] = RecurrentUp(224, 256, name="up3")(_expand_T(tp, T), c1, T, r_list[2], train=train)
            out.append(Conv2d(256, oc[2], kernel=1, padding=0, name="outconv2")(tp))
            tp, new_r[3] = RecurrentUp(128, 96, name="up4")(_expand_T(tp, T), c0, T, r_list[3], train=train)
            out.append(Conv2d(96, oc[3], kernel=1, padding=0, name="outconv3")(tp))
            return out, new_r
        else:
            tp = Up(1024, 512, upscale=1, name="up1")(xf, c3, train=train)
            tp = Up(384, 384, name="up2")(tp, c2, train=train)
            out.append(Conv2d(384, oc[0], kernel=1, padding=0, name="outconv0")(tp))
            out.append(Conv2d(384, oc[1], kernel=1, padding=0, name="outconv1")(tp))
            tp = Up(224, 256, name="up3")(tp, c1, train=train)
            out.append(Conv2d(256, oc[2], kernel=1, padding=0, name="outconv2")(tp))
            tp = Up(128, 96, name="up4")(tp, c0, train=train)
            out.append(Conv2d(96, oc[3], kernel=1, padding=0, name="outconv3")(tp))
            return out, None


class _CondHead(nn.Module):
    """Sequential(conv, LeakyReLU(0.2), conv) condition head."""

    in_ch: int
    out_ch: int

    @nn.compact
    def __call__(self, x):
        x = Conv2d(self.in_ch, self.in_ch, kernel=3, stride=1, padding=1, name="0")(x)
        x = jnp.where(x >= 0, x, 0.2 * x)
        return Conv2d(self.in_ch, self.out_ch, kernel=3, stride=1, padding=1, name="2")(x)


class _FinalHead(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = Conv2d(24, 96, kernel=3, stride=1, padding=1, name="0")(x)
        x = PReLU(96, name="1")(x)
        x = Conv2d(96, 96, kernel=3, stride=1, padding=1, name="2")(x)
        return PReLU(96, name="3")(x)


class TriPlaneSFTfeatEncoder(nn.Module):
    """triplane_unet (unet_encoders.py:249-362). Input [B, T, 256, 256, 6]
    (image 3 + Δimage 3); output {res: (scale, shift)} for CS-SFT injection."""

    inp_ch: int = 6
    res: Optional[int] = 256
    use_gru: bool = True
    sft_half: bool = True
    # generator channel scheme the (scale, shift) widths follow — flagship
    # defaults; configurable for tiny test generators
    channel_base: int = 32768
    channel_max: int = 512
    trunk_layers_n: int = 50  # 8 = tiny trunk (test/dryrun-only)

    @nn.compact
    def __call__(self, x, r_list=None, train: bool = False):
        assert x.ndim == 5
        B, T = x.shape[:2]
        x = x.reshape(B * T, *x.shape[2:])
        if self.res is not None:
            x = _fit_res(x, self.res)
        xf, feats = trunk_layers(self.inp_ch, (2, 6, 20, 21), x, train,
                                 num_layers=self.trunk_layers_n)
        c0, c1, c2, c3 = feats[2], feats[6], feats[20], feats[21]

        body_out = {16: 512, 32: 384, 64: 256, 128: 96, 256: 96}
        channels_dict = {
            r: min(self.channel_base // r, self.channel_max) for r in (16, 32, 64, 128, 256)
        }

        def heads(res, tp):
            out_ch = channels_dict[res] // 2 if self.sft_half else channels_dict[res]
            scale = _CondHead(body_out[res], out_ch, name=f"condition_scale{res}")(tp)
            shift = _CondHead(body_out[res], out_ch, name=f"condition_shift{res}")(tp)
            return (scale, shift)

        if r_list is None:
            r_list = [None] * 4
        new_r = [None] * 4
        cond: Dict[int, Tuple[jnp.ndarray, jnp.ndarray]] = {}
        if self.use_gru:
            tp, new_r[0] = RecurrentUp(1024, 512, upscale=1, name="up1")(xf, c3, T, r_list[0], train=train)
            cond[16] = heads(16, tp)
            tp, new_r[1] = RecurrentUp(384, 384, name="up2")(_expand_T(tp, T), c2, T, r_list[1], train=train)
            cond[32] = heads(32, tp)
            tp, new_r[2] = RecurrentUp(224, 256, name="up3")(_expand_T(tp, T), c1, T, r_list[2], train=train)
            cond[64] = heads(64, tp)
            tp, new_r[3] = RecurrentUp(128, 96, name="up4")(_expand_T(tp, T), c0, T, r_list[3], train=train)
            cond[128] = heads(128, tp)
            tp = _FinalHead(name="final_head")(pixel_shuffle(tp, 2))
            cond[256] = heads(256, tp)
            return cond, new_r
        else:
            tp = Up(1024, 512, upscale=1, name="up1")(xf, c3, train=train)
            cond[16] = heads(16, tp)
            tp = Up(384, 384, name="up2")(tp, c2, train=train)
            cond[32] = heads(32, tp)
            tp = Up(224, 256, name="up3")(tp, c1, train=train)
            cond[64] = heads(64, tp)
            tp = Up(128, 96, name="up4")(tp, c0, train=train)
            cond[128] = heads(128, tp)
            tp = _FinalHead(name="final_head")(pixel_shuffle(tp, 2))
            cond[256] = heads(256, tp)
            return cond, None
