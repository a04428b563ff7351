"""3D-GAN training step (reference training_avatar_texture/loss.py:28-317 +
training_loop.py:343-407), TPU-native.

Structure: one jitted step executes the phase sequence Gmain [+Greg] → Dmain
[+Dreg]. Lazy-regularization intervals select among statically-specialized
variants (reg on/off is a compile-time flag — 4 graphs total, the XLA analogue
of the reference's phase list :266-277).

Schedules that vary continuously per step (blur kernel, swapping prob, neural
render resolution) are passed as *inputs* so the compiled graph is reused:
  * blur: fixed-width kernel array (zeros beyond 3σ), identity when off —
    replaces the reference's dynamically-sized filter (loss.py:77-81)
  * neural render resolution fade 64→128 (loss.py:105-109) quantizes to a
    handful of static resolutions; each distinct value compiles once.

Under a `Mesh(('data',))` with the batch sharded and params replicated, XLA
inserts the gradient all-reduce that the reference hand-rolls
(training_loop.py:379-389); no explicit collectives appear here.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.upfirdn2d import filter2d
from .state import TrainState


@dataclasses.dataclass(frozen=True)
class GANLossConfig:
    r1_gamma: float = 8.0
    style_mixing_prob: float = 0.0
    blur_init_sigma: float = 0.0
    blur_fade_kimg: float = 0.0
    gpc_reg_fade_kimg: float = 1000.0
    gpc_reg_prob: Optional[float] = None
    neural_rendering_resolution_initial: int = 64
    neural_rendering_resolution_final: Optional[int] = 128
    neural_rendering_resolution_fade_kimg: float = 1000.0
    dual_discrimination: bool = True
    filter_mode: str = "antialiased"
    density_reg: float = 0.25
    density_reg_p_dist: float = 0.004
    reg_type: str = "l1"
    g_reg_interval: int = 4
    d_reg_interval: int = 16
    blur_raw_target: bool = True
    # ADA (reference training_loop.py:183-186 + :452-456)
    ada_target: Optional[float] = None
    ada_interval: int = 4
    ada_kimg: float = 500.0


class Schedules(NamedTuple):
    """Per-step scheduled inputs (computed on host, traced as data)."""

    blur_kernel: jnp.ndarray  # [K] normalized 1D gaussian (identity when off)
    swapping_prob: jnp.ndarray  # scalar; <0 disables swapping (c -> zeros)
    augment_p: jnp.ndarray  # scalar ADA probability (0 disables)


def make_schedules(cfg: GANLossConfig, cur_nimg: int, max_blur_width: int = 61, augment_p: float = 0.0) -> Schedules:
    blur_sigma = (
        max(1 - cur_nimg / (cfg.blur_fade_kimg * 1e3), 0) * cfg.blur_init_sigma
        if cfg.blur_fade_kimg > 0
        else 0.0
    )
    blur_size = int(np.floor(blur_sigma * 3))
    f = np.zeros(max_blur_width, np.float32)
    half = max_blur_width // 2
    if blur_size > 0:
        xs = np.arange(-blur_size, blur_size + 1)
        k = np.exp2(-np.square(xs / blur_sigma))
        f[half - blur_size : half + blur_size + 1] = k / k.sum()
    else:
        f[half] = 1.0

    if cfg.gpc_reg_prob is not None:
        alpha = min(cur_nimg / (cfg.gpc_reg_fade_kimg * 1e3), 1) if cfg.gpc_reg_fade_kimg > 0 else 1
        swap = (1 - alpha) * 1 + alpha * cfg.gpc_reg_prob
    else:
        swap = -1.0
    return Schedules(jnp.asarray(f), jnp.asarray(swap, jnp.float32), jnp.asarray(augment_p, jnp.float32))


def neural_rendering_resolution(cfg: GANLossConfig, cur_nimg: int) -> int:
    if cfg.neural_rendering_resolution_final is None:
        return cfg.neural_rendering_resolution_initial
    alpha = min(cur_nimg / (cfg.neural_rendering_resolution_fade_kimg * 1e3), 1)
    return int(
        np.rint(
            cfg.neural_rendering_resolution_initial * (1 - alpha)
            + cfg.neural_rendering_resolution_final * alpha
        )
    )


def _blur(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Separable gaussian blur with the fixed-width schedule kernel (NHWC)."""
    return filter2d(img, kernel)


def _swap_conditioning(c, swapping_prob, rng):
    c_swapped = jnp.roll(c, 1, axis=0)
    take_swap = jax.random.uniform(rng, (c.shape[0], 1)) < swapping_prob
    swapped = jnp.where(take_swap, c_swapped, c)
    return jnp.where(swapping_prob >= 0, swapped, jnp.zeros_like(c))


def make_gan_train_step(
    G,  # TriPlaneGenerator module
    D,  # DualDiscriminator module
    g_tx: optax.GradientTransformation,
    d_tx: optax.GradientTransformation,
    cfg: GANLossConfig,
    nrr: int,
    do_greg: bool,
    do_dreg: bool,
    augment_pipe=None,  # train.augment.AugmentPipe (ADA), applied to D inputs
) -> Callable:
    """Build one statically-specialized jittable GAN step.

    Returns step(g_state, d_state, batch, sched, rng) ->
      (g_state, d_state, metrics) where batch = {image, c, v:{uvcoords_image}, z}.
    """
    g_gain = float(cfg.g_reg_interval) if do_greg else 1.0  # lazy-reg gain on the reg term
    d_gain = float(cfg.d_reg_interval) if do_dreg else 1.0

    def run_G(g_params, g_buffers, z, c, v, sched, rng, update_emas):
        c_cond = _swap_conditioning(c, sched.swapping_prob, jax.random.fold_in(rng, 3))
        rngs = {"noise": jax.random.fold_in(rng, 1), "ray": jax.random.fold_in(rng, 2)}

        def fwd(m, z, c_cond, c, v):
            ws = m.mapping(z, c_cond, update_emas=update_emas)
            out = m.synthesis(ws, c, v, noise_mode="random")
            return out, ws

        if update_emas:
            (out, ws), mut = G.apply(
                {"params": g_params, "buffers": g_buffers},
                z, c_cond, c, v, method=fwd, rngs=rngs, mutable=["buffers"],
            )
            return out, ws, mut["buffers"]
        out, ws = G.apply(
            {"params": g_params, "buffers": g_buffers}, z, c_cond, c, v, method=fwd, rngs=rngs
        )
        return out, ws, g_buffers

    def run_D(d_params, d_buffers, img: Dict, c, sched, rng):
        img = dict(img)
        img["image"] = _blur(img["image"], sched.blur_kernel)
        if augment_pipe is not None:
            # ADA on the dual pair (loss.py:83-89): augment [image ‖ up(raw)]
            # with one transform draw, then split and downsample raw back
            from ..ops.resize import resize_bilinear

            H = img["image"].shape[1]
            raw_res = img["image_raw"].shape[1]
            pair = jnp.concatenate(
                [img["image"], resize_bilinear(img["image_raw"], (H, H), antialias=True)],
                axis=-1,
            )
            pair = augment_pipe(pair, sched.augment_p, jax.random.fold_in(rng, 99))
            nch = img["image"].shape[-1]
            img["image"] = pair[..., :nch]
            img["image_raw"] = resize_bilinear(pair[..., nch:], (raw_res, raw_res), antialias=True)
        variables = {"params": d_params}
        if d_buffers:
            variables["buffers"] = d_buffers
        return D.apply(variables, img, c, rngs={"noise": rng})

    def step(g_state: TrainState, d_state: TrainState, batch: Dict, sched: Schedules, rng):
        metrics = {}
        rng_g, rng_dg, rng_dr, rng_reg = jax.random.split(rng, 4)

        # ---- Gmain (+ lazily fused Greg) --------------------------------
        def g_loss_fn(g_params):
            gen_img, ws, _ = run_G(
                g_params, g_state.buffers, batch["z"], batch["c"], batch["v"], sched, rng_g, False
            )
            gen_logits = run_D(
                d_state.params, d_state.buffers,
                {"image": gen_img["image"], "image_raw": gen_img["image_raw"]},
                batch["c"], sched, jax.random.fold_in(rng_g, 7),
            )
            loss_gmain = jnp.mean(jax.nn.softplus(-gen_logits))
            total = loss_gmain
            aux = {"Loss/G/loss": loss_gmain, "Loss/scores/fake": jnp.mean(gen_logits)}

            if do_greg and cfg.density_reg > 0 and cfg.reg_type == "l1":
                # density TV reg (loss.py:158-177)
                k1, k2, k3 = jax.random.split(rng_reg, 3)
                c_cond = _swap_conditioning(batch["c"], sched.swapping_prob, k3)
                B = batch["z"].shape[0]
                init_coords = jax.random.uniform(k1, (B, 1000, 3)) * 2 - 1
                pert = init_coords + jax.random.normal(k2, init_coords.shape) * cfg.density_reg_p_dist
                coords = jnp.concatenate([init_coords, pert], axis=1)

                def sample_fn(m, z, c_cond, coords, v):
                    ws = m.mapping(z, c_cond)
                    return m.sample_mixed(coords, ws, v, noise_mode="random")

                out = G.apply(
                    {"params": g_params, "buffers": g_state.buffers},
                    batch["z"], c_cond, coords, batch["v"],
                    method=sample_fn,
                    rngs={"noise": jax.random.fold_in(rng_reg, 5), "ray": jax.random.fold_in(rng_reg, 6)},
                )
                sigma = out["sigma"]
                half = sigma.shape[1] // 2
                tv = jnp.mean(jnp.abs(sigma[:, :half] - sigma[:, half:])) * cfg.density_reg
                total = total + tv * g_gain
                aux["Loss/G/reg"] = tv
            return total, aux

        (_, g_aux), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(g_state.params)
        g_updates, g_opt_state = g_tx.update(g_grads, g_state.opt_state, g_state.params)
        g_params = optax.apply_updates(g_state.params, g_updates)
        metrics.update(g_aux)

        # ---- Dmain (gen side; G ema buffers updated here like the reference) --
        gen_img, _, g_buffers = run_G(
            g_params, g_state.buffers, batch["z"], batch["c"], batch["v"], sched, rng_dg, True
        )
        gen_img = {
            "image": jax.lax.stop_gradient(gen_img["image"]),
            "image_raw": jax.lax.stop_gradient(gen_img["image_raw"]),
        }

        # real pair at the neural-render resolution (loss.py:121-133)
        from ..ops.resize import resize_bilinear

        real_image = batch["image"]  # [B, R, R, 3] NHWC
        real_raw = resize_bilinear(real_image, (nrr, nrr), antialias=True)
        if cfg.blur_raw_target:
            real_raw = _blur(real_raw, sched.blur_kernel)

        def d_loss_fn(d_params):
            gen_logits = run_D(
                d_params, d_state.buffers, gen_img, batch["c"], sched,
                jax.random.fold_in(rng_dg, 7),
            )
            loss_dgen = jnp.mean(jax.nn.softplus(gen_logits))

            def real_logits_fn(image, image_raw):
                logits = run_D(
                    d_params, d_state.buffers, {"image": image, "image_raw": image_raw},
                    batch["c"], sched, jax.random.fold_in(rng_dr, 7),
                )
                return jnp.sum(logits), logits

            if do_dreg:
                (_, real_logits), r1_grads = jax.value_and_grad(
                    real_logits_fn, argnums=(0, 1), has_aux=True
                )(real_image, real_raw)
                r1_penalty = jnp.sum(jnp.square(r1_grads[0]), axis=(1, 2, 3)) + jnp.sum(
                    jnp.square(r1_grads[1]), axis=(1, 2, 3)
                )
                loss_dr1 = jnp.mean(r1_penalty) * (cfg.r1_gamma / 2)
            else:
                _, real_logits = real_logits_fn(real_image, real_raw)
                loss_dr1 = 0.0
            loss_dreal = jnp.mean(jax.nn.softplus(-real_logits))
            total = loss_dgen + loss_dreal + loss_dr1 * d_gain
            aux = {
                "Loss/D/loss": loss_dgen + loss_dreal,
                "Loss/scores/real": jnp.mean(real_logits),
                # ADA control signal (training_loop.py:452-456)
                "Loss/signs/real": jnp.mean(jnp.sign(real_logits)),
            }
            if do_dreg:
                aux["Loss/r1_penalty"] = jnp.mean(r1_penalty)
            return total, aux

        (_, d_aux), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(d_state.params)
        d_updates, d_opt_state = d_tx.update(d_grads, d_state.opt_state, d_state.params)
        d_params = optax.apply_updates(d_state.params, d_updates)
        metrics.update(d_aux)

        return (
            TrainState(g_params, g_opt_state, g_buffers),
            TrainState(d_params, d_opt_state, d_state.buffers),
            metrics,
        )

    return step
