"""StyleGAN2 mapping network (reference networks_stylegan2_new.py:193-271)."""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import FullyConnectedLayer, normalize_2nd_moment


class MappingNetwork(nn.Module):
    z_dim: int
    c_dim: int
    w_dim: int
    num_ws: Optional[int]
    num_layers: int = 8
    embed_features: Optional[int] = None
    layer_features: Optional[int] = None
    activation: str = "lrelu"
    lr_multiplier: float = 0.01
    w_avg_beta: Optional[float] = 0.998
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        z: Optional[jnp.ndarray],
        c: Optional[jnp.ndarray],
        truncation_psi: float = 1.0,
        truncation_cutoff: Optional[int] = None,
        update_emas: bool = False,
    ) -> jnp.ndarray:
        embed_features = self.embed_features if self.embed_features is not None else self.w_dim
        if self.c_dim == 0:
            embed_features = 0
        layer_features = self.layer_features if self.layer_features is not None else self.w_dim
        features_list = (
            [self.z_dim + embed_features] + [layer_features] * (self.num_layers - 1) + [self.w_dim]
        )

        x = None
        if self.z_dim > 0:
            x = normalize_2nd_moment(z.astype(jnp.float32))
        if self.c_dim > 0:
            embed = FullyConnectedLayer(self.c_dim, embed_features, name="embed")
            y = normalize_2nd_moment(embed(c.astype(jnp.float32)))
            x = jnp.concatenate([x, y], axis=1) if x is not None else y

        for idx in range(self.num_layers):
            layer = FullyConnectedLayer(
                features_list[idx],
                features_list[idx + 1],
                activation=self.activation,
                lr_multiplier=self.lr_multiplier,
                name=f"fc{idx}",
            )
            x = layer(x)

        w_avg = None
        if self.num_ws is not None and self.w_avg_beta is not None:
            w_avg = self.variable("buffers", "w_avg", lambda: jnp.zeros((self.w_dim,), jnp.float32))
            if update_emas:
                # torch: w_avg = mean(x).lerp(w_avg, beta) = beta*w_avg + (1-beta)*mean(x)
                batch_mean = jnp.mean(jax.lax.stop_gradient(x), axis=0)
                w_avg.value = batch_mean + self.w_avg_beta * (w_avg.value - batch_mean)

        if self.num_ws is not None:
            x = jnp.repeat(x[:, None, :], self.num_ws, axis=1)

        if truncation_psi != 1:
            assert w_avg is not None
            if self.num_ws is None or truncation_cutoff is None:
                x = w_avg.value + truncation_psi * (x - w_avg.value)
            else:
                head = w_avg.value + truncation_psi * (x[:, : truncation_cutoff] - w_avg.value)
                x = jnp.concatenate([head, x[:, truncation_cutoff:]], axis=1)
        return x
