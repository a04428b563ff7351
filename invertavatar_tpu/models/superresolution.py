"""Super-resolution modules (reference training_avatar_texture/superresolution.py).

The shipped 512² generator uses `SuperresolutionHybrid8XDC` (:263-289): two
SynthesisBlocks (32ch→256ch@256², 256→128@512²) fed the last w repeated ×3,
with the feature/rgb inputs re-interpolated to 128² (antialiased). The 8X/4X/2X
variants are kept for config/checkpoint completeness (:28,61,93); 4X/2X use the
no-upsample first block (`SynthesisBlockNoUp`, :157-256) — here simply
`SynthesisBlock(no_upsample=True)`.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..ops.resize import resize_bilinear
from .synthesis import SynthesisBlock


class _SRBase(nn.Module):
    channels: int
    img_resolution: int
    sr_num_fp16_res: int = 0
    sr_antialias: bool = True

    block0_out: int = 128
    block1_out: int = 64
    input_resolution: int = 128
    block0_res: int = 256
    block1_res: int = 512
    block0_noup: bool = False

    def setup(self):
        use_fp16 = self.sr_num_fp16_res > 0
        clamp = 256.0 if use_fp16 else None
        self.block0 = SynthesisBlock(
            in_channels=self.channels,
            out_channels=self.block0_out,
            w_dim=512,
            resolution=self.block0_res,
            img_channels=3,
            is_last=False,
            use_fp16=use_fp16,
            conv_clamp=clamp,
            no_upsample=self.block0_noup,
        )
        self.block1 = SynthesisBlock(
            in_channels=self.block0_out,
            out_channels=self.block1_out,
            w_dim=512,
            resolution=self.block1_res,
            img_channels=3,
            is_last=True,
            use_fp16=use_fp16,
            conv_clamp=clamp,
        )

    def __call__(self, rgb, x, ws, noise_mode: str = "random"):
        """rgb `[B,h,w,3]`, x `[B,h,w,C]`, ws `[B,num_ws,512]` -> `[B,R,R,3]`."""
        ws = jnp.repeat(ws[:, -1:, :], 3, axis=1)
        if x.shape[1] != self.input_resolution:
            size = (self.input_resolution, self.input_resolution)
            x = resize_bilinear(x, size, antialias=self.sr_antialias)
            rgb = resize_bilinear(rgb, size, antialias=self.sr_antialias)
        x, rgb = self.block0(x, rgb, ws, noise_mode=noise_mode)
        x, rgb = self.block1(x, rgb, ws, noise_mode=noise_mode)
        return rgb


class SuperresolutionHybrid8XDC(_SRBase):
    """512² SR, deeper channels — the shipped module (superresolution.py:263)."""

    block0_out: int = 256
    block1_out: int = 128
    input_resolution: int = 128
    block0_res: int = 256
    block1_res: int = 512


class SuperresolutionHybrid8X(_SRBase):
    """512² SR (superresolution.py:28)."""

    block0_out: int = 128
    block1_out: int = 64


class SuperresolutionHybrid4X(_SRBase):
    """256² SR (superresolution.py:61); first block runs at input res."""

    block0_out: int = 128
    block1_out: int = 64
    input_resolution: int = 128
    block0_res: int = 128
    block1_res: int = 256
    block0_noup: bool = True

    def __call__(self, rgb, x, ws, noise_mode: str = "random"):
        ws = jnp.repeat(ws[:, -1:, :], 3, axis=1)
        if x.shape[1] < self.input_resolution:  # 4X upsamples only smaller inputs
            size = (self.input_resolution, self.input_resolution)
            x = resize_bilinear(x, size, antialias=self.sr_antialias)
            rgb = resize_bilinear(rgb, size, antialias=self.sr_antialias)
        x, rgb = self.block0(x, rgb, ws, noise_mode=noise_mode)
        x, rgb = self.block1(x, rgb, ws, noise_mode=noise_mode)
        return rgb


class SuperresolutionHybrid2X(_SRBase):
    """128² SR (superresolution.py:93)."""

    block0_out: int = 128
    block1_out: int = 64
    input_resolution: int = 64
    block0_res: int = 64
    block1_res: int = 128
    block0_noup: bool = True
