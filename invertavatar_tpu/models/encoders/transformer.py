"""SegFormer (MixViT) components + one-shot Segformer U-Net decoders.

Behavioral counterparts of reference `encoder_inversion/models/mmseg/
mix_transformer.py` (Mlp+DWConv :18-53, spatial-reduction Attention :56-116,
Block :118-156, OverlapPatchEmbed :158-199, transformer_block :455-474) and
`encoder_inversion/models/unet_transformer.py` (UpLayer :527-547,
TriPlanefeat_SegformerDecoder :255-340, TriPlaneSFTfeat_SegformerDecoder
:342-452) — the improved one-shot inversion nets (uvnet_new.py).

Module names mirror torch for checkpoint import. Layout: NHWC; attention
tokens are [B, N, C].
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .e4e import trunk_layers
from .irse import Conv2d, Linear, PReLU
from .unet_encoders import DoubleConv, _CondHead, _FinalHead, adaptive_avg_pool, pixel_shuffle


class LayerNorm(nn.Module):
    """torch.nn.LayerNorm over the last dim (weight/bias names, eps 1e-5)."""

    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.dim,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.eps) * w + b


class Mlp(nn.Module):
    """MixFFN: fc1 → dwconv → GELU → fc2 (mix_transformer.py:18-53)."""

    in_features: int
    hidden_features: int

    @nn.compact
    def __call__(self, x, H, W):
        x = Linear(self.in_features, self.hidden_features, name="fc1")(x)
        x = _DWConvWrap(self.hidden_features, name="dwconv")(x, H, W)
        x = jax.nn.gelu(x, approximate=False)
        return Linear(self.hidden_features, self.in_features, name="fc2")(x)


class _DepthwiseConv3x3(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, img):
        w = self.param(
            "weight", nn.initializers.normal(stddev=0.1), (3, 3, 1, self.dim), jnp.float32
        )
        b = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        precision = jax.lax.Precision.HIGHEST if img.dtype == jnp.float32 else None
        return jax.lax.conv_general_dilated(
            img, w.astype(img.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.dim, precision=precision,
        ) + b


class _DWConvWrap(nn.Module):
    """torch DWConv module (mix_transformer.py:373-384): child conv named 'dwconv'."""

    dim: int

    @nn.compact
    def __call__(self, x, H, W):
        B, N, C = x.shape
        img = x.reshape(B, H, W, C)
        img = _DepthwiseConv3x3(self.dim, name="dwconv")(img)
        return img.reshape(B, N, C)


class Attention(nn.Module):
    """Spatial-reduction attention (mix_transformer.py:56-116)."""

    dim: int
    num_heads: int = 8
    qkv_bias: bool = False
    sr_ratio: int = 1

    @nn.compact
    def __call__(self, x, H, W):
        B, N, C = x.shape
        hd = C // self.num_heads
        scale = hd**-0.5
        q = Linear(self.dim, self.dim, use_bias=self.qkv_bias, name="q")(x)
        q = q.reshape(B, N, self.num_heads, hd).transpose(0, 2, 1, 3)

        if self.sr_ratio > 1:
            img = x.reshape(B, H, W, C)
            img = Conv2d(self.dim, self.dim, kernel=self.sr_ratio, stride=self.sr_ratio,
                         padding=0, name="sr")(img)
            x_kv = img.reshape(B, -1, C)
            x_kv = LayerNorm(self.dim, eps=1e-5, name="norm")(x_kv)
        else:
            x_kv = x
        kv = Linear(self.dim, self.dim * 2, use_bias=self.qkv_bias, name="kv")(x_kv)
        kv = kv.reshape(B, -1, 2, self.num_heads, hd).transpose(2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]

        precision = jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
        attn = jnp.matmul(q, k.transpose(0, 1, 3, 2), precision=precision) * scale
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.matmul(attn, v, precision=precision)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        return Linear(self.dim, self.dim, name="proj")(out)


class Block(nn.Module):
    """Pre-norm transformer block (mix_transformer.py:118-156); drop_path is
    identity at inference (the one-shot nets are trained with drop_path=0)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    sr_ratio: int = 1

    @nn.compact
    def __call__(self, x, H, W):
        x = x + Attention(self.dim, self.num_heads, self.qkv_bias, self.sr_ratio, name="attn")(
            LayerNorm(self.dim, name="norm1")(x), H, W
        )
        x = x + Mlp(self.dim, int(self.dim * self.mlp_ratio), name="mlp")(
            LayerNorm(self.dim, name="norm2")(x), H, W
        )
        return x


class OverlapPatchEmbed(nn.Module):
    """Strided overlapping patch embedding (mix_transformer.py:158-199)."""

    patch_size: int = 7
    stride: int = 4
    in_chans: int = 3
    embed_dim: int = 768

    @nn.compact
    def __call__(self, x):  # [B, H, W, C]
        x = Conv2d(self.in_chans, self.embed_dim, kernel=self.patch_size, stride=self.stride,
                   padding=self.patch_size // 2, name="proj")(x)
        B, H, W, C = x.shape
        tokens = x.reshape(B, H * W, C)
        tokens = LayerNorm(self.embed_dim, eps=1e-5, name="norm")(tokens)
        return tokens, H, W


class _ViTList(nn.Module):
    dim: int
    num_vit: int

    @nn.compact
    def __call__(self, x, H, W):
        for i in range(self.num_vit):
            x = Block(self.dim, num_heads=4, mlp_ratio=2, sr_ratio=1, name=str(i))(x, H, W)
        return x


class TransformerBlock(nn.Module):
    """transformer_block (mix_transformer.py:455-474): patch-embed (stride 2) →
    N ViT blocks → norm → pixel-shuffle ×2 → 1×1 conv back to in_chans."""

    in_chans: int
    embed_dim: int = 1024
    num_vit: int = 2

    @nn.compact
    def __call__(self, f):  # [B, H, W, C]
        B = f.shape[0]
        tokens, H, W = OverlapPatchEmbed(
            patch_size=7, stride=2, in_chans=self.in_chans, embed_dim=self.embed_dim,
            name="patch_embed",
        )(f)
        tokens = _ViTList(self.embed_dim, self.num_vit, name="ViT")(tokens, H, W)
        tokens = LayerNorm(self.embed_dim, eps=1e-5, name="norm")(tokens)
        img = tokens.reshape(B, H, W, self.embed_dim)
        img = pixel_shuffle(img, 2)
        return Conv2d(self.embed_dim // 4, self.in_chans, kernel=1, padding=0, name="mlp")(img)


class UpLayer(nn.Module):
    """PixelShuffle + optional ViT mixing + DoubleConv (unet_transformer.py:527-547)."""

    in_ch: int
    out_ch: int
    upscale: int = 2
    num_vit: int = 0

    @nn.compact
    def __call__(self, x1, x2=None, train: bool = False):
        x1 = pixel_shuffle(x1, self.upscale)
        x = x1 if x2 is None else jnp.concatenate([x2, x1], axis=-1)
        if self.num_vit > 0:
            x = TransformerBlock(self.in_ch, num_vit=self.num_vit, name="transformer")(x)
        return DoubleConv(self.in_ch, self.out_ch, name="conv")(x, train=train)


class TriPlanefeatSegformerDecoder(nn.Module):
    """One-shot texture offsets (unet_transformer.py:255-340, use_gru=False)."""

    inp_ch: int = 7
    res: Optional[int] = 256
    # flagship texture-tap widths; configurable for tiny test generators
    out_channels: Tuple[int, int, int, int] = (32, 512, 512, 256)

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert x.ndim == 4
        if self.res is not None:
            from .unet_encoders import _fit_res

            x = _fit_res(x, self.res)
        xf, feats = trunk_layers(self.inp_ch, (2, 6, 20, 21), x, train)
        c0, c1, c2, c3 = feats[2], feats[6], feats[20], feats[21]
        oc = self.out_channels
        out = []
        tp = UpLayer(1024, 512, upscale=1, num_vit=4, name="up1")(xf, c3, train=train)
        tp = UpLayer(384, 384, num_vit=4, name="up2")(tp, c2, train=train)
        out.append(Conv2d(384, oc[0], kernel=1, padding=0, name="outconv0")(tp))
        out.append(Conv2d(384, oc[1], kernel=1, padding=0, name="outconv1")(tp))
        tp = UpLayer(224, 256, num_vit=3, name="up3")(tp, c1, train=train)
        out.append(Conv2d(256, oc[2], kernel=1, padding=0, name="outconv2")(tp))
        tp = UpLayer(128, 96, num_vit=3, name="up4")(tp, c0, train=train)
        out.append(Conv2d(96, oc[3], kernel=1, padding=0, name="outconv3")(tp))
        return out


class TriPlaneSFTfeatSegformerDecoder(nn.Module):
    """One-shot CS-SFT conditions (unet_transformer.py:342-452, use_gru=False)."""

    inp_ch: int = 6
    res: Optional[int] = 256
    sft_half: bool = True
    channel_base: int = 32768
    channel_max: int = 512

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert x.ndim == 4
        if self.res is not None:
            from .unet_encoders import _fit_res

            x = _fit_res(x, self.res)
        xf, feats = trunk_layers(self.inp_ch, (2, 6, 20, 21), x, train)
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

        cond: Dict[int, Tuple[jnp.ndarray, jnp.ndarray]] = {}
        tp = UpLayer(1024, 512, upscale=1, num_vit=4, name="up1")(xf, c3, train=train)
        cond[16] = heads(16, tp)
        tp = UpLayer(384, 384, num_vit=4, name="up2")(tp, c2, train=train)
        cond[32] = heads(32, tp)
        tp = UpLayer(224, 256, num_vit=3, name="up3")(tp, c1, train=train)
        cond[64] = heads(64, tp)
        tp = UpLayer(128, 96, num_vit=2, name="up4")(tp, c0, train=train)
        cond[128] = heads(128, tp)
        tp = _FinalHead(name="final_head")(pixel_shuffle(tp, 2))
        cond[256] = heads(256, tp)
        return cond
