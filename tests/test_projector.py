"""PTI W+ projector: recovers a known latent on a toy differentiable generator."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from invertavatar_tpu.inversion import project_w_plus

pytestmark = pytest.mark.smoke


def test_projector_recovers_target():
    rng = np.random.RandomState(0)
    z_dim, num_ws, C = 8, 3, 8
    W_map = jnp.asarray(rng.randn(z_dim, C).astype(np.float32))
    W_img = jnp.asarray(rng.randn(C, 16 * 16 * 3).astype(np.float32) * 0.1)

    def mapping_fn(z):
        w = jnp.tanh(z @ W_map)
        return jnp.repeat(w[:, None, :], num_ws, axis=1)

    def synth_fn(ws, noise_bufs):
        base = jnp.mean(ws, axis=1) @ W_img
        img = jnp.tanh(base).reshape(1, 16, 16, 3)
        return img + 0.001 * noise_bufs["n0"][None, :, :, None]

    def feature_fn(img255):
        return img255.reshape(1, -1) / 255.0

    w_true = mapping_fn(jnp.asarray(rng.randn(1, z_dim).astype(np.float32)))
    target = np.asarray((synth_fn(w_true, {"n0": jnp.zeros((16, 16))}) + 1) * 127.5)[0]

    w_opt, noise = project_w_plus(
        synth_fn, mapping_fn, feature_fn, target,
        noise_bufs={"n0": jnp.zeros((16, 16))},
        num_ws=num_ws, z_dim=z_dim,
        num_steps=120, w_avg_samples=256,
        initial_learning_rate=0.05,
    )
    img_opt = synth_fn(w_opt, noise)
    img_true = synth_fn(w_true, {"n0": jnp.zeros((16, 16))})
    err = float(jnp.mean(jnp.abs(img_opt - img_true)))
    assert err < 0.05, err
