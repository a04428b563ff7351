"""Cross-attention block (reference encoder_inversion/models/attention.py:12-47).

DETR-style decoder sub-block: multi-head cross-attention + FFN with post-norm
(affine-free LayerNorm). Used only by a dead experimental branch in the
reference (video_loss.py:277 `cca`); provided for inventory completeness.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .irse import Linear


class _MHA(nn.Module):
    """torch.nn.MultiheadAttention (batch_first) with packed in_proj weights."""

    d_model: int
    nhead: int

    @nn.compact
    def __call__(self, q, k, v):
        d = self.d_model
        in_w = self.param("in_proj_weight", nn.initializers.normal(0.02), (3 * d, d), jnp.float32)
        in_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * d,), jnp.float32)
        prec = jax.lax.Precision.HIGHEST
        q_p = jnp.matmul(q, in_w[:d].T, precision=prec) + in_b[:d]
        k_p = jnp.matmul(k, in_w[d : 2 * d].T, precision=prec) + in_b[d : 2 * d]
        v_p = jnp.matmul(v, in_w[2 * d :].T, precision=prec) + in_b[2 * d :]

        B, Nq, _ = q_p.shape
        Nk = k_p.shape[1]
        hd = d // self.nhead

        def split(x, n):
            return x.reshape(B, n, self.nhead, hd).transpose(0, 2, 1, 3)

        attn = jnp.matmul(split(q_p, Nq), split(k_p, Nk).transpose(0, 1, 3, 2), precision=prec)
        attn = jax.nn.softmax(attn / jnp.sqrt(hd), axis=-1)
        out = jnp.matmul(attn, split(v_p, Nk), precision=prec)
        out = out.transpose(0, 2, 1, 3).reshape(B, Nq, d)
        return Linear(d, d, name="out_proj")(out)


class CrossAttention(nn.Module):
    """Post-norm cross-attention + FFN; dropout is identity at inference."""

    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    activation: str = "relu"

    @nn.compact
    def __call__(self, tgt, memory):
        tgt2 = _MHA(self.d_model, self.nhead, name="multihead_attn")(tgt, memory, memory)
        tgt = tgt + tgt2
        # norm2: affine-free LayerNorm
        mean = jnp.mean(tgt, axis=-1, keepdims=True)
        var = jnp.var(tgt, axis=-1, keepdims=True)
        tgt = (tgt - mean) * jax.lax.rsqrt(var + 1e-5)
        h = Linear(self.d_model, self.dim_feedforward, name="linear1")(tgt)
        h = jax.nn.relu(h) if self.activation == "relu" else jax.nn.gelu(h)
        tgt2 = Linear(self.dim_feedforward, self.d_model, name="linear2")(h)
        return tgt + tgt2
