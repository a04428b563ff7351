"""Optimization-based W+ projection (PTI stage 1).

Counterpart of reference `inversion/projectors/w_plus_projector_ide3d.py:27`:
Adam on (w_opt, noise buffers) against a perceptual feature distance, with the
reference's lr ramp-up/cos-rampdown, decaying w-noise injection, multi-scale
noise-autocorrelation regularizer, and per-step noise renormalization.

The perceptual metric is pluggable (`feature_fn`): the reference downloads the
StyleGAN VGG16-LPIPS network; pass a closure over `losses.LPIPS` with imported
weights for parity, or any differentiable feature extractor. The whole
optimization step jits; the loop is a `lax.fori`-free python loop so lr/noise
schedules stay host-side like the reference.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


def _noise_reg(noise_bufs) -> jnp.ndarray:
    """Multi-scale autocorrelation penalty (projector :118-128)."""
    reg = 0.0
    for buf in jax.tree_util.tree_leaves(noise_bufs):
        noise = buf[None, :, :, None]  # [1, H, W, 1]
        while True:
            reg += jnp.mean(noise * jnp.roll(noise, 1, axis=2)) ** 2
            reg += jnp.mean(noise * jnp.roll(noise, 1, axis=1)) ** 2
            if noise.shape[1] <= 8:
                break
            noise = jax.lax.reduce_window(
                noise, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            ) / 4.0
    return reg


def _normalize_noise(noise_bufs):
    return jax.tree_util.tree_map(
        lambda b: (b - jnp.mean(b)) * jax.lax.rsqrt(jnp.mean(jnp.square(b)) + 1e-12),
        noise_bufs,
    )


def project_w_plus(
    synth_fn: Callable,  # (ws, noise_bufs) -> image [1, H, W, 3] in [-1, 1]
    mapping_fn: Callable,  # (z [N, z_dim]) -> ws [N, L, C]
    feature_fn: Callable,  # (image [1, 256, 256, 3] in [0, 255]) -> features
    target: jnp.ndarray,  # [H, W, 3] in [0, 255]
    noise_bufs: Dict,  # pytree of [res, res] noise buffers
    num_ws: int,
    z_dim: int,
    num_steps: int = 1000,
    w_avg_samples: int = 10000,
    initial_learning_rate: float = 5e-3,
    initial_noise_factor: float = 0.05,
    lr_rampdown_length: float = 0.25,
    lr_rampup_length: float = 0.05,
    noise_ramp_length: float = 0.75,
    regularize_noise_weight: float = 1e5,
    initial_w: Optional[np.ndarray] = None,
    seed: int = 123,
    verbose: bool = False,
):
    """Returns (w_opt [1, num_ws, C], optimized noise buffers)."""
    # W statistics (projector :55-61)
    z_samples = np.random.RandomState(seed).randn(w_avg_samples, z_dim).astype(np.float32)
    w_samples = np.asarray(mapping_fn(jnp.asarray(z_samples)))[:, :1, :]
    w_avg = w_samples.mean(axis=0, keepdims=True)
    w_std = float(np.sqrt(np.square(w_samples - w_avg).sum() / w_avg_samples))

    start_w = initial_w if initial_w is not None else w_avg
    if start_w.shape[1] != num_ws:
        start_w = np.repeat(start_w, num_ws, axis=1)
    w_opt = jnp.asarray(start_w, jnp.float32)

    noise_bufs = jax.tree_util.tree_map(lambda b: jnp.asarray(np.random.RandomState(seed).randn(*b.shape), jnp.float32), noise_bufs)

    def down256(img01):
        if img01.shape[1] > 256:
            # 'area' downsampling == average pooling for integer factors
            k = img01.shape[1] // 256
            img01 = jax.lax.reduce_window(
                img01, 0.0, jax.lax.add, (1, k, k, 1), (1, k, k, 1), "VALID"
            ) / (k * k)
        return img01

    target_features = feature_fn(down256(jnp.asarray(target, jnp.float32)[None]))

    tx = optax.adam(initial_learning_rate, b1=0.9, b2=0.999)
    params = {"w": w_opt, "noise": noise_bufs}
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, w_noise_scale, lr_scale, rng):
        def loss_fn(p):
            w_noise = jax.random.normal(rng, p["w"].shape) * w_noise_scale
            img = synth_fn(p["w"] + w_noise, p["noise"])
            img255 = (img + 1.0) * (255.0 / 2.0)
            feats = feature_fn(down256(img255))
            dist = jnp.sum(jnp.square(target_features - feats))
            reg = _noise_reg(p["noise"])
            return dist + reg * regularize_noise_weight, dist

        (loss, dist), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(jax.tree_util.tree_map(lambda g: g * 1.0, grads), opt_state, params)
        updates = jax.tree_util.tree_map(lambda u: u * lr_scale, updates)
        new_params = optax.apply_updates(params, updates)
        new_params["noise"] = _normalize_noise(new_params["noise"])
        return new_params, new_opt, loss, dist

    rng = jax.random.PRNGKey(seed)
    for i in range(num_steps):
        t = i / num_steps
        w_noise_scale = w_std * initial_noise_factor * max(0.0, 1.0 - t / noise_ramp_length) ** 2
        lr_ramp = min(1.0, (1.0 - t) / lr_rampdown_length)
        lr_ramp = 0.5 - 0.5 * np.cos(lr_ramp * np.pi)
        lr_ramp = lr_ramp * min(1.0, t / lr_rampup_length)
        params, opt_state, loss, dist = step(
            params, opt_state, jnp.float32(w_noise_scale), jnp.float32(lr_ramp),
            jax.random.fold_in(rng, i),
        )
        if verbose and (i + 1) % 50 == 0:
            print(f"step {i+1}/{num_steps}: dist {float(dist):.3f} loss {float(loss):.3f}")
    return params["w"], params["noise"]


# ------------------------------------------------------------- PTI locality reg
def morphed_w_code(new_w, fixed_w, alpha: float = 30.0):
    """reference inversion/criteria/localitly_regulizer.py:14-21."""
    direction = new_w - fixed_w
    norm = jnp.linalg.norm(direction)
    return fixed_w + alpha * direction / jnp.maximum(norm, 1e-12)


def space_regularizer_loss(
    new_g_synthesis,  # (w) -> image, current (tuned) generator params
    old_g_synthesis,  # (w) -> image, frozen pre-PTI generator
    mapping_fn,  # (z) -> w samples from the original generator
    w_batch,
    lpips_fn,
    rng,
    num_samples: int = 1,
    alpha: float = 30.0,
    l2_lambda: float = 0.0,
    lpips_lambda: float = 1.0,
):
    """PTI "ball-holder" locality regularizer (localitly_regulizer.py:27-58):
    the tuned generator must match the frozen one on w codes pushed a fixed
    distance from the inversion target."""
    z = jax.random.normal(rng, (num_samples, w_batch.shape[-1]))
    w_samples = mapping_fn(z)
    total = jnp.float32(0.0)
    for i in range(num_samples):
        w_code = morphed_w_code(w_samples[i : i + 1], w_batch, alpha)
        new_img = new_g_synthesis(w_code)
        old_img = jax.lax.stop_gradient(old_g_synthesis(w_code))
        if l2_lambda > 0:
            total = total + l2_lambda * jnp.mean(jnp.square(old_img - new_img))
        if lpips_lambda > 0:
            total = total + lpips_lambda * jnp.mean(lpips_fn(old_img, new_img))
    return total / num_samples
