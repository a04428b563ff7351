"""Inversion-encoder training drivers (reference encoder_inversion/train.py:79-90
dispatch → training_loop.py (e4e) / training_loop_unet_interval.py (one-shot) /
training_loop_video.py (few-shot)).

Stage structure:
  * e4e: train Encoder4Editing against the frozen generator with Ireal/Igen
    (+ latent W discriminator WDmain/WDreg every `wd_reg_interval`).
  * one-shot / few-shot: train the U-Net offset encoders' decoders (IR-SE
    trunks frozen in eval, reference training_loop_video.py:284-303) with the
    Ireal/Igen phase machine over `run_seq` rollouts.

Freezing is expressed with optax.masked (the optimizer-mask idiom replacing
torch requires_grad toggles).

Data parallelism (reference trains all three stages at --gpus=8,
train_inversion.sh; grads flat-all_reduced in encoder_inversion/train.py:63-71
and training_loop_video.py:433-449): every driver takes an optional
`mesh` — params/opt states are replicated (NamedSharding P()), batches are
sharded on the leading axis over the 'data' axis, and XLA inserts the gradient
all-reduce because every loss is a global batch mean. The few-shot stage's
host-orchestrated sub-programs (FewshotPrograms) partition the same way:
each jitted piece sees a batch-sharded [B, ...] operand set and replicated
params. Exercised on the virtual 8-device CPU mesh by
tests/test_loop_inversion.py::test_fewshot_step_dp_mesh and
train/dryrun.py:run_dryrun_inversion (driver contract).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from .inversion import (
    InversionLossWeights,
    e4e_igen_loss,
    e4e_ireal_loss,
    oneshot_d_loss,
    oneshot_igen_loss,
    oneshot_ireal_loss,
    wd_losses,
)
from .state import TrainState


def mask_params(params, predicate) -> Any:
    """Boolean pytree matching `params`; predicate gets the '/'-joined path."""

    def walk(tree, path):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        return predicate("/".join(path))

    return walk(params, ())


def e4e_trainable(path: str) -> bool:
    return path.startswith("encoder/")


def oneshot_tex_trainable(path: str) -> bool:
    """One-shot stage, texture-unet optimizer (training_loop_unet_interval.py
    Igen_tex_modules)."""
    return path.startswith("unet_encoder/texture_unet")


def oneshot_tri_trainable(path: str) -> bool:
    """One-shot stage, tri-plane-SFT-unet optimizer (Igen_tri_modules)."""
    return path.startswith("unet_encoder/triplane_unet")


def unet_decoder_trainable(path: str) -> bool:
    """Few-shot stage: U-Net decoder heads + GRUs train; trunks/generator/e4e frozen
    (training_loop_video.py:284-303)."""
    if not path.startswith("unet_encoder/"):
        return False
    sub = path.split("/", 2)[-1]
    frozen_prefixes = ("input_layer", "body")
    return not sub.startswith(frozen_prefixes)


def fewshot_tex_trainable(path: str) -> bool:
    """Few-shot texture-unet param group (training_loop_video.py:294-300
    Igen_tex_modules: decoder ups + out heads, trunk frozen)."""
    return unet_decoder_trainable(path) and path.startswith("unet_encoder/texture_unet")


def fewshot_tri_trainable(path: str) -> bool:
    """Few-shot triplane-unet param group (training_loop_video.py:284-289
    Igen_tri_modules)."""
    return unet_decoder_trainable(path) and path.startswith("unet_encoder/triplane_unet")


def masked_adam(lr: float, predicate, b1=0.9, b2=0.999):
    def make_mask(params):
        return mask_params(params, predicate)

    def make_inv_mask(params):
        return jax.tree_util.tree_map(lambda m: not m, make_mask(params))

    # optax.masked passes raw updates through for non-masked leaves, so the
    # frozen subtrees must be explicitly zeroed first — otherwise raw grads
    # leak into the "frozen" params via apply_updates.
    return optax.chain(
        optax.masked(optax.set_to_zero(), make_inv_mask),
        optax.masked(optax.adam(lr, b1=b1, b2=b2), make_mask),
    )


def make_e4e_train_step(
    E4E_module,  # Encoder4Editing-bearing module with .encode (InversionNet works)
    wd_module,  # LatentCodesDiscriminator
    lpips_fn: Callable,
    id_fn: Optional[Callable],
    tx: optax.GradientTransformation,
    wd_tx: optax.GradientTransformation,
    weights: InversionLossWeights,
    wd_reg_interval: int = 16,
):
    """One step = Ireal + Igen (+ WD phases when w_discriminator > 0)."""

    def step(state: TrainState, wd_state: TrainState, batch: Dict, rng, do_wd_reg: bool = False):
        rngs = {"noise": jax.random.fold_in(rng, 0), "ray": jax.random.fold_in(rng, 1)}

        def apply_with(params, method, *args, **kw):
            return E4E_module.apply(
                {"params": params, **{k: v for k, v in state.buffers.items()}},
                *args, method=method, rngs=rngs, **kw,
            )

        latent_avg = state.buffers["buffers"]["latent_avg"]

        def wd_apply(w):
            return wd_module.apply({"params": wd_state.params}, w)

        def loss_fn(params):
            # only the encoder trains in this stage — stop_gradient the frozen
            # generator subtree so its backward graph is pruned from the
            # program (the masked optimizer would zero the grads anyway)
            if "generator" in params:
                params = {**params, "generator": jax.lax.stop_gradient(params["generator"])}
            variables = {"params": params, **state.buffers}

            def encode(img):
                return E4E_module.apply(variables, img, method=lambda m, x: m.encode(x), rngs=rngs)

            def gen_mapping(z, c, truncation_psi=1.0):
                return E4E_module.apply(
                    variables, z, c,
                    method=lambda m, z, c: m.generator.mapping(z, c, truncation_psi=truncation_psi),
                    rngs=rngs,
                )

            def gen_synthesis(ws, c, v):
                return E4E_module.apply(
                    variables, ws, c, v,
                    method=lambda m, ws, c, v: m.generator.synthesis_withTexture(
                        ws,
                        m.generator.texture_backbone.synthesis(ws, return_list=True, noise_mode="const"),
                        c, v,
                        static_feats=m.generator.backbone.synthesis(ws, return_list=True, noise_mode="const"),
                        noise_mode="const",
                    ),
                    rngs=rngs,
                )

            total_r, aux_r = e4e_ireal_loss(
                encode, gen_synthesis, wd_apply if weights.w_discriminator > 0 else None,
                lpips_fn, id_fn, weights, latent_avg,
                batch["image"], batch["c"], batch["v"],
            )
            total_g, aux_g = e4e_igen_loss(
                encode, gen_mapping, gen_synthesis,
                wd_apply if weights.w_discriminator > 0 else None,
                lpips_fn, weights, latent_avg,
                batch["z"], batch["c"], batch["v"],
            )
            aux = {f"Ireal/{k}": v for k, v in aux_r.items()}
            aux.update({f"Igen/{k}": v for k, v in aux_g.items()})
            total = total_r + total_g
            if weights.multiview_id > 0 and id_fn is not None:
                # Ireal_novel (w_loss.py:215-235): ID consistency under a
                # different camera (batch['gen_c'] when provided)
                from .inversion import e4e_ireal_novel_loss

                total_n, aux_n = e4e_ireal_novel_loss(
                    encode, gen_synthesis, id_fn, weights,
                    batch["image"], batch.get("gen_c", batch["c"]), batch["v"],
                )
                total = total + total_n
                aux.update({f"Ireal_novel/{k}": v for k, v in aux_n.items()})
            return total, aux

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params, opt_state, state.buffers)

        new_wd_state = wd_state
        if weights.w_discriminator > 0:
            variables = {"params": params, **state.buffers}
            ws_fake = jax.lax.stop_gradient(
                E4E_module.apply(variables, batch["image"], method=lambda m, x: m.encode(x), rngs=rngs)
            )
            ws_real = jax.lax.stop_gradient(
                E4E_module.apply(
                    variables, batch["z"], batch["c"],
                    method=lambda m, z, c: m.generator.mapping(z, c, truncation_psi=0.8),
                    rngs=rngs,
                )
            )

            def wd_loss_fn(wd_params):
                apply = lambda w: wd_module.apply({"params": wd_params}, w)
                return wd_losses(apply, ws_fake, ws_real, weights, do_wd_reg)

            (_, wd_aux), wd_grads = jax.value_and_grad(wd_loss_fn, has_aux=True)(wd_state.params)
            wd_updates, wd_opt = wd_tx.update(wd_grads, wd_state.opt_state, wd_state.params)
            new_wd_state = TrainState(
                optax.apply_updates(wd_state.params, wd_updates), wd_opt, wd_state.buffers
            )
            aux.update(wd_aux)
        return new_state, new_wd_state, aux

    return step


def make_e4e_grad_programs(
    E4E_module,
    wd_module,
    lpips_fn: Callable,
    id_fn: Optional[Callable],
    tx: optax.GradientTransformation,
    wd_tx: optax.GradientTransformation,
    weights: InversionLossWeights,
    donate: bool = False,
    fast_igen_target: str = "off",
    fast_grad: str = "off",
    fast_interpret: bool = False,
    remat: bool = False,
    grad_subtree: Optional[str] = "encoder",
):
    """HBM-split variant of `make_e4e_train_step` (same math, three programs).

    The monolithic e4e step holds Ireal + Igen + WD in ONE XLA program — at
    the flagship config that is three generator renders (two with grads back
    to the encoder through both synthesis backbones) and it ResourceExhausts
    a 16 GB v5e (docs/train_tpu_run.json r4 run 1). grad(total) decomposes as
    grad(ireal) + grad(igen) — summing per-phase grads on the host before one
    optimizer update is bitwise-equivalent up to float add order, and each
    program now holds at most one render forward+backward.

    Returns step(state, wd_state, batch, rng, do_wd_reg) with the
    `make_e4e_train_step` contract. The multiview-ID (Ireal_novel) term is
    not split out here — use the monolithic step for that stage (it only
    activates in the shipped configs once ArcFace weights exist).
    """
    if weights.multiview_id > 0 and id_fn is not None:
        raise NotImplementedError(
            "make_e4e_grad_programs does not carry the Ireal_novel phase; "
            "use make_e4e_train_step when multiview_id > 0"
        )
    from .fast_render import grad_overrides, nograd_overrides

    igen_target_ov = nograd_overrides(fast_igen_target, interpret=fast_interpret)
    grad_ov = grad_overrides(fast_grad, interpret=fast_interpret)

    def _rngs(rng):
        return {"noise": jax.random.fold_in(rng, 0), "ray": jax.random.fold_in(rng, 1)}

    def _enc_gen(params, buffers, rngs):
        if "generator" in params:
            params = {**params, "generator": jax.lax.stop_gradient(params["generator"])}
        variables = {"params": params, **buffers}

        def encode(img):
            return E4E_module.apply(variables, img, method=lambda m, x: m.encode(x), rngs=rngs)

        def gen_mapping(z, c, truncation_psi=1.0):
            return E4E_module.apply(
                variables, z, c,
                method=lambda m, z, c: m.generator.mapping(z, c, truncation_psi=truncation_psi),
                rngs=rngs,
            )

        def _synthesis(ws, c, v, overrides=None, evaluation=False):
            if not remat:
                return E4E_module.apply(
                    variables, ws, c, v,
                    method=lambda m, ws, c, v: m.generator.synthesis_withTexture(
                        ws,
                        m.generator.texture_backbone.synthesis(ws, return_list=True, noise_mode="const"),
                        c, v,
                        static_feats=m.generator.backbone.synthesis(ws, return_list=True, noise_mode="const"),
                        noise_mode="const",
                        evaluation=evaluation,
                        rendering_overrides=overrides,
                    ),
                    rngs=rngs,
                )
            # staged remat: the two backbone syntheses and the raster→render→SR
            # tail become separate jax.checkpoint segments (plus the model-level
            # remat_stages split inside synthesis_withTexture), so the grad
            # program's backward peak is the LARGEST segment's residuals
            # instead of their sum. Same math — grads are bitwise-reproduced
            # by recomputation (tests/test_loop_inversion.py remat parity).
            overrides = {**(overrides or {}), "remat_stages": True}

            def tex_fn(variables_, ws_):
                return E4E_module.apply(
                    variables_, ws_,
                    method=lambda m, w: m.generator.texture_backbone.synthesis(
                        w, return_list=True, noise_mode="const"),
                    rngs=rngs,
                )

            def static_fn(variables_, ws_):
                return E4E_module.apply(
                    variables_, ws_,
                    method=lambda m, w: m.generator.backbone.synthesis(
                        w, return_list=True, noise_mode="const"),
                    rngs=rngs,
                )

            def tail_fn(variables_, ws_, tex_, static_, c_, v_):
                return E4E_module.apply(
                    variables_, ws_, tex_, static_, c_, v_,
                    method=lambda m, w, t, s, cc, vv: m.generator.synthesis_withTexture(
                        w, t, cc, vv, static_feats=s, noise_mode="const",
                        evaluation=evaluation, rendering_overrides=overrides,
                    ),
                    rngs=rngs,
                )

            tex = jax.checkpoint(tex_fn)(variables, ws)
            static = jax.checkpoint(static_fn)(variables, ws)
            return jax.checkpoint(tail_fn)(variables, ws, tex, static, c, v)

        def gen_synthesis(ws, c, v):
            # the GRAD-carrying student render (evaluation stays False;
            # fast_grad only swaps the sampling formulation)
            return _synthesis(ws, c, v, overrides=grad_ov)

        gen_synthesis_target = (
            (lambda ws, c, v: _synthesis(ws, c, v, overrides=igen_target_ov,
                                         evaluation=True))
            if igen_target_ov is not None else None
        )
        return encode, gen_mapping, gen_synthesis, gen_synthesis_target

    def _split(params):
        # differentiate w.r.t. the trainable subtree ONLY: the frozen
        # generator's grads are structural zeros (stop_gradient), but
        # value_and_grad over the full tree still MATERIALIZES them — a
        # full-param-size buffer that stays live between the two grad
        # programs. At the flagship config that is the difference between
        # grad_igen fitting and ResourceExhausting: each grad program plans
        # ~11.2 GB temp + 1.1 GB out (docs/train_tpu_run.json e4e_B1
        # *_mem_gb), and the 1.1 GB full-tree g1 pushes the second program
        # past 16 GB.
        if grad_subtree is None:
            return params, {}
        return (
            {grad_subtree: params[grad_subtree]},
            {k: v for k, v in params.items() if k != grad_subtree},
        )

    def grad_ireal(params, buffers, wd_params, batch, rng):
        rngs = _rngs(rng)
        latent_avg = buffers["buffers"]["latent_avg"]
        train, frozen = _split(params)

        def f(tp):
            p = {**frozen, **tp}
            encode, _, gen_synthesis, _ = _enc_gen(p, buffers, rngs)
            wd_apply = (
                (lambda w: wd_module.apply({"params": wd_params}, w))
                if weights.w_discriminator > 0 else None
            )
            return e4e_ireal_loss(
                encode, gen_synthesis, wd_apply, lpips_fn, id_fn, weights,
                latent_avg, batch["image"], batch["c"], batch["v"],
            )

        (_, aux), grads = jax.value_and_grad(f, has_aux=True)(train)
        return grads, {f"Ireal/{k}": v for k, v in aux.items()}

    def grad_igen(params, buffers, wd_params, batch, rng):
        rngs = _rngs(rng)
        latent_avg = buffers["buffers"]["latent_avg"]
        train, frozen = _split(params)

        def f(tp):
            p = {**frozen, **tp}
            encode, gen_mapping, gen_synthesis, gen_target = _enc_gen(p, buffers, rngs)
            wd_apply = (
                (lambda w: wd_module.apply({"params": wd_params}, w))
                if weights.w_discriminator > 0 else None
            )
            return e4e_igen_loss(
                encode, gen_mapping, gen_synthesis, wd_apply, lpips_fn, weights,
                latent_avg, batch["z"], batch["c"], batch["v"],
                gen_synthesis_target=gen_target,
            )

        (_, aux), grads = jax.value_and_grad(f, has_aux=True)(train)
        return grads, {f"Igen/{k}": v for k, v in aux.items()}

    def _update(params, opt_state, g1, g2):
        grads = jax.tree_util.tree_map(jnp.add, g1, g2)
        if grad_subtree is not None:
            # reconstitute the full-tree grads with zeros on the frozen
            # subtrees INSIDE the (small) update program
            grads = {
                **{k: jax.tree_util.tree_map(jnp.zeros_like, v)
                   for k, v in params.items() if k != grad_subtree},
                **grads,
            }
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    def wd_step(params, buffers, wd_state: TrainState, batch, rng, do_wd_reg: bool):
        rngs = _rngs(rng)
        variables = {"params": params, **buffers}
        ws_fake = jax.lax.stop_gradient(
            E4E_module.apply(variables, batch["image"], method=lambda m, x: m.encode(x), rngs=rngs)
        )
        ws_real = jax.lax.stop_gradient(
            E4E_module.apply(
                variables, batch["z"], batch["c"],
                method=lambda m, z, c: m.generator.mapping(z, c, truncation_psi=0.8),
                rngs=rngs,
            )
        )

        def f(wd_params):
            apply = lambda w: wd_module.apply({"params": wd_params}, w)
            return wd_losses(apply, ws_fake, ws_real, weights, do_wd_reg)

        (_, wd_aux), wd_grads = jax.value_and_grad(f, has_aux=True)(wd_state.params)
        wd_updates, wd_opt = wd_tx.update(wd_grads, wd_state.opt_state, wd_state.params)
        return TrainState(
            optax.apply_updates(wd_state.params, wd_updates), wd_opt, wd_state.buffers
        ), wd_aux

    grad_ireal_j = jax.jit(grad_ireal)
    grad_igen_j = jax.jit(grad_igen)
    update_j = (
        jax.jit(_update, donate_argnums=(0, 1)) if donate else jax.jit(_update)
    )
    wd_step_j = jax.jit(wd_step, static_argnames=("do_wd_reg",))

    def step(state: TrainState, wd_state: TrainState, batch: Dict, rng,
             do_wd_reg: bool = False):
        g1, aux = grad_ireal_j(state.params, state.buffers, wd_state.params, batch, rng)
        g2, aux_g = grad_igen_j(state.params, state.buffers, wd_state.params, batch, rng)
        aux = {**aux, **aux_g}
        params, opt_state = update_j(state.params, state.opt_state, g1, g2)
        del g1, g2
        new_state = TrainState(params, opt_state, state.buffers)
        new_wd_state = wd_state
        if weights.w_discriminator > 0:
            new_wd_state, wd_aux = wd_step_j(
                params, state.buffers, wd_state, batch, rng, do_wd_reg=do_wd_reg
            )
            aux.update(wd_aux)
        return new_state, new_wd_state, aux

    # per-program handles for AOT compile / memory-analysis instrumentation
    # (scripts/validate_train_tpu.py drives these individually so an OOM in
    # one program doesn't void the evidence from the ones before it)
    step.programs = {
        "grad_ireal": grad_ireal_j,
        "grad_igen": grad_igen_j,
        "update": update_j,
        "wd_step": wd_step_j,
    }
    return step


def make_oneshot_train_step(
    I_module,  # InversionNet (segformer one-shot variant)
    D_module,  # DualDiscriminator (or None when weights.adv == 0)
    lpips_fn: Callable,
    id_fn: Optional[Callable],
    tx: optax.GradientTransformation,  # masked (tex- or tri-unet) optimizer
    d_tx: Optional[optax.GradientTransformation],
    weights: InversionLossWeights,
    fast_igen_target: str = "off",
    fast_grad: str = "off",
    fast_interpret: bool = False,
):
    """One-shot U-Net stage step (reference training_loop_unet_interval.py
    :356-368 + unet_loss.py). `phase` is static: 'Igen' | 'Ireal' alternating
    by batch parity; D phases run when `weights.adv > 0`.

    `fast_igen_target` routes the no-grad renders (the Igen phase's
    stop-gradient target, unet_loss.py:99-110, and the stop-gradient e4e
    render inside the forward) through the structured fast paths
    (train/fast_render.py); `fast_grad` swaps the student render's sampling
    for the differentiable structured/custom-VJP formulation."""
    from .fast_render import grad_overrides, nograd_overrides

    igen_target_ov = nograd_overrides(fast_igen_target, interpret=fast_interpret)
    grad_ov = grad_overrides(fast_grad, interpret=fast_interpret)

    def step(state: TrainState, d_state: Optional[TrainState], batch: Dict, rng,
             phase: str = "Ireal", do_r1: bool = False):
        rngs = {"noise": jax.random.fold_in(rng, 0), "ray": jax.random.fold_in(rng, 1)}

        def make_closures(params):
            variables = {"params": params, **state.buffers}

            def inv_forward(x, c, v, return_feats):
                return I_module.apply(
                    variables, x, c, v,
                    method=lambda m, x, c, v: m(
                        x, c, v, return_feats=return_feats,
                        nograd_render=igen_target_ov, grad_render=grad_ov,
                    ),
                    rngs=rngs,
                )

            def gen_mapping(z, c, truncation_psi=1.0):
                return I_module.apply(
                    variables, z, c,
                    method=lambda m, z, c: m.generator.mapping(z, c, truncation_psi=truncation_psi),
                    rngs=rngs,
                )

            def gen_synthesis_featmap(ws, c, v, overrides=igen_target_ov):
                # every caller stop-gradients this output (target renders)
                return I_module.apply(
                    variables, ws, c, v,
                    method=lambda m, ws, c, v: m.generator.synthesis(
                        ws, c, v, return_featmap=True, noise_mode="const",
                        evaluation=overrides is not None,
                        rendering_overrides=overrides,
                    ),
                    rngs=rngs,
                )

            return inv_forward, gen_mapping, gen_synthesis_featmap

        def d_apply_with(d_params):
            def d_apply(img, c):
                return D_module.apply({"params": d_params, **d_state.buffers}, img, c, rngs=rngs)

            return d_apply

        aux = {}
        new_state, new_d_state = state, d_state
        if phase in ("Igen", "Ireal"):
            def loss_fn(params):
                # only the U-Nets train (training_loop_unet_interval.py param
                # groups) — prune the frozen generator/encoder backward graphs
                params = {
                    **params,
                    "generator": jax.lax.stop_gradient(params["generator"]),
                    "encoder": jax.lax.stop_gradient(params["encoder"]),
                }
                inv_forward, gen_mapping, gen_synth = make_closures(params)
                d_apply = d_apply_with(d_state.params) if (weights.adv > 0 and d_state is not None) else None
                if phase == "Igen":
                    total, losses = oneshot_igen_loss(
                        inv_forward, gen_mapping, gen_synth, d_apply, lpips_fn, id_fn,
                        weights, batch["z"], batch["c"], batch["v"], batch.get("gen_uv"),
                    )
                else:
                    total, losses = oneshot_ireal_loss(
                        inv_forward, d_apply, lpips_fn, id_fn, weights,
                        {"image": batch["image"], "uv": batch["uv"]},
                        batch["c"], batch["v"],
                    )
                return total, {f"{phase}/{k}": v for k, v in losses.items()}

            (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            new_state = TrainState(
                optax.apply_updates(state.params, updates), opt_state, state.buffers
            )
        else:  # D phases
            assert phase in ("Dgen", "Dreal") and d_state is not None
            sg = jax.lax.stop_gradient
            inv_forward, gen_mapping, gen_synth = make_closures(state.params)
            if phase == "Dgen":
                ws = sg(gen_mapping(batch["z"], batch["c"], truncation_psi=0.8))
                gen_out = gen_synth(ws, batch["c"], batch["v"])
                i_out = inv_forward(
                    {"image": gen_out["image"], "uv": batch.get("gen_uv")},
                    batch["c"], batch["v"], False,
                )
                real_pair = {"image": sg(gen_out["image"][..., :3]),
                             "image_raw": sg(gen_out["feature_image"][..., :3])}
            else:
                i_out = inv_forward(
                    {"image": batch["image"], "uv": batch["uv"]}, batch["c"], batch["v"], False
                )
                from ..ops.resize import resize_bilinear

                real_pair = {
                    "image": batch["image"][..., :3],
                    "image_raw": resize_bilinear(batch["image"][..., :3], (128, 128), antialias=True),
                }
            fake_pair = {"image": sg(i_out["image"]),
                         "image_raw": sg(i_out["feature_image"][..., :3])}

            def d_loss_fn(d_params):
                return oneshot_d_loss(
                    d_apply_with(d_params), fake_pair, real_pair, batch["c"], weights, do_r1
                )

            (_, aux), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(d_state.params)
            d_updates, d_opt = d_tx.update(d_grads, d_state.opt_state, d_state.params)
            new_d_state = TrainState(
                optax.apply_updates(d_state.params, d_updates), d_opt, d_state.buffers
            )
            aux = {f"{phase}/{k}": v for k, v in aux.items()}
        return new_state, new_d_state, aux

    return step


def make_oneshot_grad_programs(
    I_module,  # InversionNet
    D_module,
    lpips_fn: Callable,
    id_fn: Optional[Callable],
    tx: optax.GradientTransformation,
    d_tx: Optional[optax.GradientTransformation],
    weights: InversionLossWeights,
    donate: bool = False,
    fast_igen_target: str = "off",
    fast_grad: str = "off",
    fast_interpret: bool = False,
    remat: bool = False,
    grad_subtree: Optional[str] = "unet_encoder",
    prefix_split: bool = False,
    subtree_tx: Optional[optax.GradientTransformation] = None,
):
    """HBM/compile split of `make_oneshot_train_step` (same math, smaller
    programs, same step contract).

    The monolithic Igen phase holds the frozen-G target render + the e4e
    prefix render + the student render forward AND backward in ONE XLA
    program; on the v5e that program reproducibly kills the remote compile
    helper (docs/train_tpu_run.json oneshot_B1: tpu_compile_helper HTTP 500
    after ~16 min, twice). Mirroring `make_e4e_grad_programs`, the step is
    decomposed into independently-compiled programs:

      igen_targets  frozen-G mapping + featmap render, no grads   [1 render]
      grad_igen     student fwd+bwd against precomputed targets   [≤2 renders]
      grad_ireal    student fwd+bwd on a real frame               [≤2 renders]
      update        masked optimizer update (donatable)

    D phases run the student forward in its own no-grad program and the D
    loss+update in another (no generator render in the D grad program at
    all). Loss math is `oneshot_igen_loss`/`oneshot_ireal_loss` verbatim —
    the target closures just return the precomputed tensors.

    `prefix_split=True` additionally moves the stop-gradient PREFIX of the
    student forward (e4e encode + texture pyramid + e4e reconstruction
    render, `InversionNet.prefix`) into its own program. Why: subtree grads
    and staged remat both left the literal grad_igen plan at ~17 GB
    (docs/train_tpu_run.json `oneshot_B1_subtree`/`oneshot_B1_remat`) —
    the 12 GB temp is the prefix render's forward working set, which is
    neither a grad buffer nor a rematerializable residual. Splitting it out
    (a) removes that working set from the grad program, (b) drops the 0.78 GB
    encoder param set from the grad program's args (it only needs
    generator + unet_encoder), at the cost of ~0.15 GB of prefix outputs
    (W+, texture pyramid, one e4e image) crossing the program boundary.
    The prefix program draws its ray rng from a distinct fold, so the
    prefix and student renders keep independent stochastic strata exactly
    like two draws inside the monolith (unet_loss.py semantics: the e4e
    render and the student render are independent forward passes).
    """
    from .fast_render import grad_overrides, nograd_overrides

    igen_target_ov = nograd_overrides(fast_igen_target, interpret=fast_interpret)
    grad_ov = grad_overrides(fast_grad, interpret=fast_interpret)
    if remat:
        # staged remat on the grad-carrying student render (model-level
        # remat_stages — see TriPlaneGenerator.synthesis_withTexture); the
        # no-grad target renders save no residuals and stay as-is
        grad_ov = {**(grad_ov or {}), "remat_stages": True}

    def _rngs(rng):
        return {"noise": jax.random.fold_in(rng, 0), "ray": jax.random.fold_in(rng, 1)}

    def _inv_forward(params, buffers, rngs, x, c, v, return_feats, prefix_out=None):
        return I_module.apply(
            {"params": params, **buffers}, x, c, v,
            method=lambda m, x, c, v: m(
                x, c, v, return_feats=return_feats,
                nograd_render=igen_target_ov, grad_render=grad_ov,
                prefix_results=prefix_out,
            ),
            rngs=rngs,
        )

    def prefix(enc_params, buffers, x, c, v, rng):
        """Stop-gradient prefix (InversionNet.prefix) as its own program —
        enc_params needs only {'generator', 'encoder'}. Ray rng folds from a
        distinct constant so the prefix render and the student render keep
        independent strata (as two independent draws do in the monolith)."""
        rngs = _rngs(jax.random.fold_in(rng, 2))
        return I_module.apply(
            {"params": enc_params, **buffers}, x, c, v,
            method=lambda m, x, c, v: m.prefix(x, c, v, nograd_render=igen_target_ov),
            rngs=rngs,
        )

    def igen_targets(params, buffers, z, c, v, rng):
        """Frozen-G sample for the Igen phase (unet_loss.py:99-110)."""
        rngs = _rngs(rng)
        variables = {"params": params, **buffers}
        ws = I_module.apply(
            variables, z, c,
            method=lambda m, z, c: m.generator.mapping(z, c, truncation_psi=0.8),
            rngs=rngs,
        )
        gen_out = I_module.apply(
            variables, ws, c, v,
            method=lambda m, ws, c, v: m.generator.synthesis(
                ws, c, v, return_featmap=True, noise_mode="const",
                evaluation=igen_target_ov is not None,
                rendering_overrides=igen_target_ov,
            ),
            rngs=rngs,
        )
        keep = {"image", "feature_image", "triplane"}
        if weights.texture > 0:
            keep.add("texture")
        return ws, {k: gen_out[k] for k in keep if k in gen_out}

    def _frozen(params):
        # under prefix_split the grad programs' param dict has no 'encoder'
        # (the e4e trunk lives only in the prefix program)
        return {
            k: (jax.lax.stop_gradient(v) if k in ("generator", "encoder") else v)
            for k, v in params.items()
        }

    def _sub_get(params, path):
        node = params
        for p in path.split("/"):
            node = node[p]
        return node

    def _sub_set(params, path, value):
        parts = path.split("/")

        def rec(node, i):
            if i == len(parts) - 1:
                return {**node, parts[i]: value}
            return {**node, parts[i]: rec(node[parts[i]], i + 1)}

        return rec(params, 0)

    def _split(params):
        # grads only over the trainable subtree — the frozen generator/e4e
        # grads are structural zeros but full-tree value_and_grad would
        # materialize them as a live full-param-size buffer between programs
        # (see make_e4e_grad_programs._split). `grad_subtree` may be a nested
        # '/'-path ("unet_encoder/texture_unet"): the reference's interval
        # schedule trains ONE unet per batch (training_loop_unet_interval.py
        # :358-368), so per-phase subtree grads are the literal semantics —
        # and they remove the frozen sibling's backward (the SFT backbone
        # chain, for the tex phase) from the grad program's HBM plan entirely
        # (docs/train_tpu_run.json oneshot_B1_prefix: the whole-unet grad
        # program plans 16.4 GB > 16 GB HBM).
        if grad_subtree is None:
            return params
        return _sub_get(params, grad_subtree)

    def _merge(params, tp):
        if grad_subtree is None:
            return tp
        return _sub_set(params, grad_subtree, tp)

    def grad_igen(params, buffers, d_params, ws_t, gen_out, batch, rng, prefix_out=None):
        rngs = _rngs(rng)
        train = _split(params)

        def f(tp):
            p = _frozen(_merge(params, tp))
            inv_forward = lambda x, c, v, rf: _inv_forward(
                p, buffers, rngs, x, c, v, rf, prefix_out)
            d_apply = None
            if d_params is not None and D_module is not None and weights.adv > 0:
                d_apply = lambda img, c: D_module.apply(
                    {"params": d_params}, img, c, rngs=rngs
                )
            total, losses = oneshot_igen_loss(
                inv_forward,
                lambda z, c, truncation_psi=1.0: ws_t,
                lambda w, cc, vv: gen_out,
                d_apply, lpips_fn, id_fn, weights,
                batch["z"], batch["c"], batch["v"], batch.get("gen_uv"),
            )
            return total, {f"Igen/{k}": v for k, v in losses.items()}

        (_, aux), grads = jax.value_and_grad(f, has_aux=True)(train)
        return grads, aux

    def grad_ireal(params, buffers, d_params, batch, rng, prefix_out=None):
        rngs = _rngs(rng)
        train = _split(params)

        def f(tp):
            p = _frozen(_merge(params, tp))
            inv_forward = lambda x, c, v, rf: _inv_forward(
                p, buffers, rngs, x, c, v, rf, prefix_out)
            d_apply = None
            if d_params is not None and D_module is not None and weights.adv > 0:
                d_apply = lambda img, c: D_module.apply(
                    {"params": d_params}, img, c, rngs=rngs
                )
            total, losses = oneshot_ireal_loss(
                inv_forward, d_apply, lpips_fn, id_fn, weights,
                {"image": batch["image"], "uv": batch["uv"]},
                batch["c"], batch["v"],
            )
            return total, {f"Ireal/{k}": v for k, v in losses.items()}

        (_, aux), grads = jax.value_and_grad(f, has_aux=True)(train)
        return grads, aux

    if subtree_tx is not None and grad_subtree is not None:
        # SUBTREE-LOCAL update: operates on (trainable subtree, subtree opt
        # state, subtree grads) only — no full-tree zeros reconstitution (at
        # the flagship one-shot config that zeros tree is ~3 GB of temp) and
        # no full-param args, so the frozen siblings (e.g. the e4e encoder)
        # need not even be device-resident during the update. Equivalent to
        # the masked full-tree update when the optimizer mask selects exactly
        # `grad_subtree` (tests/test_loop_inversion.py subtree-update parity).
        # Splice the result back with `step.merge_params`.
        def update(train_params, opt_state, grads):
            updates, new_opt = subtree_tx.update(grads, opt_state, train_params)
            return optax.apply_updates(train_params, updates), new_opt
    else:
        def update(params, opt_state, grads):
            if grad_subtree is not None:
                # reconstitute the full-tree grad structure (structural zeros
                # for every frozen leaf) only inside this small program
                zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
                grads = _sub_set(zeros, grad_subtree, grads)
            updates, new_opt = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_opt

    def student_fwd(params, buffers, x, c, v, rng):
        return _inv_forward(params, buffers, _rngs(rng), x, c, v, False)

    def d_step(d_params, d_buffers, d_opt, fake_pair, real_pair, c, rng,
               do_r1: bool = False):
        rngs = _rngs(rng)

        def d_loss_fn(dp):
            d_apply = lambda img, cc: D_module.apply(
                {"params": dp, **d_buffers}, img, cc, rngs=rngs
            )
            return oneshot_d_loss(d_apply, fake_pair, real_pair, c, weights, do_r1)

        (_, d_aux), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(d_params)
        d_updates, new_d_opt = d_tx.update(d_grads, d_opt, d_params)
        return optax.apply_updates(d_params, d_updates), new_d_opt, d_aux

    jit = jax.jit
    igen_targets_j = jit(igen_targets)
    grad_igen_j = jit(grad_igen)
    grad_ireal_j = jit(grad_ireal)
    update_j = jit(update, donate_argnums=(0, 1) if donate else ())
    student_fwd_j = jit(student_fwd)
    d_step_j = jit(d_step, static_argnames=("do_r1",)) if d_tx is not None else None
    prefix_j = jit(prefix) if prefix_split else None

    def _enc_params(params):  # what the prefix program needs
        return {k: params[k] for k in ("generator", "encoder") if k in params}

    def _gu_params(params):  # what the grad programs need under prefix_split
        return {k: v for k, v in params.items() if k != "encoder"}

    def step(state: TrainState, d_state: Optional[TrainState], batch: Dict, rng,
             phase: str = "Ireal", do_r1: bool = False):
        aux = {}
        new_state, new_d_state = state, d_state
        if phase in ("Igen", "Ireal"):
            d_params = d_state.params if (weights.adv > 0 and d_state is not None) else None
            if phase == "Igen":
                ws_t, gen_out = igen_targets_j(
                    state.params, state.buffers, batch["z"], batch["c"], batch["v"], rng
                )
                if prefix_split:
                    px = prefix_j(
                        _enc_params(state.params), state.buffers,
                        {"image": gen_out["image"], "uv": batch["gen_uv"]},
                        batch["c"], batch["v"], rng,
                    )
                    grads, aux = grad_igen_j(
                        _gu_params(state.params), state.buffers, d_params,
                        ws_t, gen_out, batch, rng, px,
                    )
                    del px
                else:
                    grads, aux = grad_igen_j(
                        state.params, state.buffers, d_params, ws_t, gen_out, batch, rng
                    )
                del ws_t, gen_out
            else:
                if prefix_split:
                    px = prefix_j(
                        _enc_params(state.params), state.buffers,
                        {"image": batch["image"], "uv": batch["uv"]},
                        batch["c"], batch["v"], rng,
                    )
                    grads, aux = grad_ireal_j(
                        _gu_params(state.params), state.buffers, d_params, batch, rng, px
                    )
                    del px
                else:
                    grads, aux = grad_ireal_j(
                        state.params, state.buffers, d_params, batch, rng)
            if subtree_tx is not None and grad_subtree is not None:
                new_sub, new_opt = update_j(_split(state.params), state.opt_state, grads)
                new_params = _merge(state.params, new_sub)
            else:
                new_params, new_opt = update_j(state.params, state.opt_state, grads)
            del grads
            new_state = TrainState(new_params, new_opt, state.buffers)
        else:
            assert phase in ("Dgen", "Dreal") and d_state is not None
            if phase == "Dgen":
                ws_t, gen_out = igen_targets_j(
                    state.params, state.buffers, batch["z"], batch["c"], batch["v"], rng
                )
                i_out = student_fwd_j(
                    state.params, state.buffers,
                    {"image": gen_out["image"], "uv": batch.get("gen_uv")},
                    batch["c"], batch["v"], rng,
                )
                real_pair = {"image": gen_out["image"][..., :3],
                             "image_raw": gen_out["feature_image"][..., :3]}
            else:
                i_out = student_fwd_j(
                    state.params, state.buffers,
                    {"image": batch["image"], "uv": batch["uv"]},
                    batch["c"], batch["v"], rng,
                )
                from ..ops.resize import resize_bilinear

                real_pair = {
                    "image": batch["image"][..., :3],
                    "image_raw": resize_bilinear(
                        batch["image"][..., :3], (128, 128), antialias=True
                    ),
                }
            fake_pair = {"image": i_out["image"],
                         "image_raw": i_out["feature_image"][..., :3]}
            new_d_params, new_d_opt, d_aux = d_step_j(
                d_state.params, d_state.buffers, d_state.opt_state,
                fake_pair, real_pair, batch["c"], rng, do_r1=do_r1,
            )
            new_d_state = TrainState(new_d_params, new_d_opt, d_state.buffers)
            aux = {f"{phase}/{k}": v for k, v in d_aux.items()}
        return new_state, new_d_state, aux

    # per-program handles (see make_e4e_grad_programs.step.programs)
    step.programs = {
        "igen_targets": igen_targets_j,
        "prefix": prefix_j,
        "grad_igen": grad_igen_j,
        "grad_ireal": grad_ireal_j,
        "update": update_j,
        "student_fwd": student_fwd_j,
        "d_step": d_step_j,
    }
    step.enc_params = _enc_params
    step.gu_params = _gu_params
    step.train_sub = _split  # trainable subtree extractor (subtree_tx mode)
    step.merge_params = _merge  # splice an updated subtree back (host-side)
    return step


def oneshot_phase_schedule(batch_idx: int, d_reg_interval: int = 16):
    """training_loop_unet_interval.py:358-368: (I-phase, which unet trains,
    D-phase, do_r1) for this batch index."""
    i_phase = "Ireal" if batch_idx % 4 < 2 else "Igen"
    unet = "tri" if batch_idx % 2 == 0 else "tex"
    d_phase = "Dreal" if batch_idx % 4 < 2 else "Dgen"
    do_r1 = batch_idx % d_reg_interval == 0
    return i_phase, unet, d_phase, do_r1


@dataclasses.dataclass
class InversionTrainConfig:
    run_dir: str = "runs/inversion"
    total_kimg: int = 5000
    batch_size: int = 8
    lr: float = 1e-4
    wd_lr: float = 2e-5
    kimg_per_tick: int = 4
    snapshot_ticks: int = 20
    wd_reg_interval: int = 16
    seed: int = 0
    weights: InversionLossWeights = dataclasses.field(default_factory=InversionLossWeights)


def train_e4e(
    net,  # InversionNet (or E4E-compatible module)
    variables,  # {'params', 'buffers', ...} with the frozen generator grafted in
    wd_module,
    batch_iter,  # yields {'image' NHWC [-1,1] 512², 'c', 'v': {...}, 'z'}
    cfg: InversionTrainConfig,
    lpips_fn: Callable,
    id_fn: Optional[Callable] = None,
    max_steps: Optional[int] = None,
    resume_dir: Optional[str] = None,
    mesh=None,  # jax.sharding.Mesh with a 'data' axis → DP over its devices
):
    """e4e-stage driver (reference encoder_inversion/training_loop.py:129-...;
    DP at --gpus=8 per train_inversion.sh:7 — here `mesh` shards the batch)."""
    import os
    import time

    import numpy as np

    from ..utils.checkpoint import restore_orbax, save_orbax
    from ..utils.stats import Collector, StatsLogger

    os.makedirs(cfg.run_dir, exist_ok=True)
    rng = jax.random.PRNGKey(cfg.seed)

    tx = masked_adam(cfg.lr, e4e_trainable)
    buffers = {k: v for k, v in variables.items() if k != "params"}
    state = TrainState(variables["params"], tx.init(variables["params"]), buffers)

    wd_vars = wd_module.init(jax.random.PRNGKey(cfg.seed + 1), jnp.zeros((1, 512)))
    wd_tx = optax.adam(cfg.wd_lr)
    wd_state = TrainState(wd_vars["params"], wd_tx.init(wd_vars["params"]), {})

    start_nimg = 0
    start_step = 0
    if resume_dir is not None:
        template = {
            "params": state.params, "opt_state": state.opt_state,
            "wd_params": wd_state.params, "wd_opt_state": wd_state.opt_state,
            "cur_nimg": np.asarray(0), "step_idx": np.asarray(0),
        }
        payload = restore_orbax(resume_dir, template)
        state = TrainState(payload["params"], payload["opt_state"], buffers)
        wd_state = TrainState(payload["wd_params"], payload["wd_opt_state"], {})
        start_nimg = int(payload["cur_nimg"])
        start_step = int(payload["step_idx"])

    if mesh is not None:
        from ..parallel.mesh import replicate

        # params/opt replicated; the batch is sharded per step below — XLA
        # inserts the grad all-reduce (loss is a global batch mean), replacing
        # the reference's flat-grad all_reduce (train.py:63-71)
        state = replicate(mesh, state)
        wd_state = replicate(mesh, wd_state)

    step_fn = jax.jit(
        make_e4e_train_step(
            net, wd_module, lpips_fn, id_fn, tx, wd_tx, cfg.weights, cfg.wd_reg_interval
        ),
        static_argnames=("do_wd_reg",),
    )

    collector = Collector()
    logger = StatsLogger(cfg.run_dir)
    cur_nimg = start_nimg
    step_idx = start_step
    next_tick = cur_nimg + cfg.kimg_per_tick * 1000
    t0 = time.time()

    def snapshot(tag):
        save_orbax(
            os.path.join(cfg.run_dir, tag),
            {
                "params": state.params, "opt_state": state.opt_state,
                "wd_params": wd_state.params, "wd_opt_state": wd_state.opt_state,
                "cur_nimg": np.asarray(cur_nimg), "step_idx": np.asarray(step_idx),
            },
        )

    while cur_nimg < cfg.total_kimg * 1000:
        batch = next(batch_iter)
        if mesh is not None:
            from ..parallel.mesh import shard_batch

            batch = shard_batch(mesh, batch)
        state, wd_state, aux = step_fn(
            state, wd_state, batch, jax.random.fold_in(rng, step_idx),
            do_wd_reg=(step_idx % cfg.wd_reg_interval == 0 and cfg.weights.w_discriminator > 0),
        )
        cur_nimg += cfg.batch_size
        step_idx += 1
        for k, v in aux.items():
            collector.report(k, np.asarray(v))
        if cur_nimg >= next_tick or (max_steps and step_idx >= max_steps):
            collector.update()
            print(
                f"kimg {cur_nimg/1000:.1f} ({time.time()-t0:.0f}s) "
                + " ".join(f"{n}={collector.mean(n):.4f}" for n in collector.names())
            )
            logger.write(collector, cur_nimg)
            next_tick = cur_nimg + cfg.kimg_per_tick * 1000
            if (cur_nimg // (cfg.kimg_per_tick * 1000)) % cfg.snapshot_ticks == 0 or (
                max_steps and step_idx >= max_steps
            ):
                snapshot(f"snapshot-{cur_nimg:08d}")
        if max_steps and step_idx >= max_steps:
            break
    logger.close()
    return state, wd_state


def train_fewshot(
    net,  # InversionNet
    variables,
    clip_iter,  # yields {'image' [B,T_max,...], 'c' [B,T_max,...], 'v', 'uv', 'z'}
    cfg: InversionTrainConfig,
    lpips_fn: Callable,
    d_module=None,  # DualDiscriminator when cfg.weights.adv > 0
    d_variables=None,
    max_steps: Optional[int] = None,
    multiT: Optional[tuple] = (6, 12, 18),
    frm_per_chunk: int = 6,
    resume_dir: Optional[str] = None,
    mesh=None,  # jax.sharding.Mesh with a 'data' axis → DP over its devices
    fast_no_grad: str = "off",  # structured fast paths for the frozen-G
    fast_grad: str = "off",  # renders (see FewshotPrograms / train.fast_render)
    snapshot_every: Optional[int] = None,  # mid-run snapshot every N steps
    on_step=None,  # callback(step_idx, cur_nimg, aux) after every step
    donate: bool = False,  # donate params/opt into the update program (one
    # live TrainState at the flagship config — see make_fewshot_train_step)
):
    """Few-shot-stage driver (reference training_loop_video.py:129-480).

    Per batch (ref :402-429): one Ireal and one Igen phase, both updating the
    batch-parity param group (tri-unet on even, tex-unet on odd, ref :284-303);
    the clip length follows the {6,12,18} curriculum (ref :424-429, `multiT`
    tuple; None disables multi-T and uses the full clip with `run_seq`);
    optional D phase on synthetic pairs (ref video_loss.py:479-526).
    Snapshots carry {params, both opt states, d_params, cur_nimg} and the loop
    resumes from `resume_dir`."""
    import os
    import time

    import numpy as np

    from ..utils.checkpoint import restore_orbax, save_orbax
    from ..utils.stats import Collector, StatsLogger

    os.makedirs(cfg.run_dir, exist_ok=True)
    rng = jax.random.PRNGKey(cfg.seed)
    tx_tex = masked_adam(cfg.lr, fewshot_tex_trainable)
    tx_tri = masked_adam(cfg.lr, fewshot_tri_trainable)
    buffers = {k: v for k, v in variables.items() if k != "params"}
    params = variables["params"]
    opt_states = {"tex": tx_tex.init(params), "tri": tx_tri.init(params)}

    # one shared jitted program set for the I steps and the D step
    progs = FewshotPrograms(net, lpips_fn, cfg.weights, d_module=d_module,
                            fast_no_grad=fast_no_grad, fast_grad=fast_grad)

    d_state = None
    d_tx = None
    d_step_fn = None
    if d_module is not None and cfg.weights.adv > 0:
        d_tx = optax.adam(cfg.lr)
        d_state = TrainState(
            d_variables["params"], d_tx.init(d_variables["params"]),
            {k: v for k, v in d_variables.items() if k != "params"},
        )
        d_step_fn = make_fewshot_d_step(
            net, d_module, d_tx, cfg.weights, frm_per_chunk, programs=progs
        )

    cur_nimg = 0
    step_idx = 0
    if resume_dir is not None:
        import numpy as _np

        template = {
            "params": params,
            "opt_states": opt_states,
            "cur_nimg": _np.asarray(0),
            "step_idx": _np.asarray(0),
        }
        if d_state is not None:
            template["d_params"] = d_state.params
            template["d_opt_state"] = d_state.opt_state
        payload = restore_orbax(resume_dir, template)
        params = payload["params"]
        opt_states = payload["opt_states"]
        cur_nimg = int(payload["cur_nimg"])
        step_idx = int(payload["step_idx"])
        if d_state is not None:
            d_state = TrainState(payload["d_params"], payload["d_opt_state"], d_state.buffers)

    steps = {
        "tex": make_fewshot_train_step(
            net, lpips_fn, tx_tex, cfg.weights, frm_per_chunk, programs=progs,
            donate=donate,
        ),
        "tri": make_fewshot_train_step(
            net, lpips_fn, tx_tri, cfg.weights, frm_per_chunk, programs=progs,
            donate=donate,
        ),
    }

    # frozen-e4e ws for Ireal, precomputed per batch outside the train step
    # (the reference batches carry `real_vid_ws`; keeps the IR-SE-50 trunk in
    # ONE small program instead of every Ireal gradient program)
    def encode_fn(p, img):
        return progs.encode(p, buffers, img, jax.random.PRNGKey(0))

    def snapshot(tag):
        payload = {
            "params": state.params,
            "opt_states": opt_states,
            "cur_nimg": np.asarray(cur_nimg),
            "step_idx": np.asarray(step_idx),
        }
        if d_state is not None:
            payload["d_params"] = d_state.params
            payload["d_opt_state"] = d_state.opt_state
        save_orbax(os.path.join(cfg.run_dir, tag), payload)

    if mesh is not None:
        from ..parallel.mesh import replicate

        # every FewshotPrograms sub-program then runs with replicated params
        # and a batch-sharded operand set; grads come out replicated (XLA
        # all-reduces the global-batch-mean losses), mirroring the reference's
        # flat-grad all_reduce at --gpus=8 (training_loop_video.py:433-449)
        params = replicate(mesh, params)
        buffers = replicate(mesh, buffers)
        opt_states = replicate(mesh, opt_states)
        if d_state is not None:
            d_state = replicate(mesh, d_state)

    collector = Collector()
    logger = StatsLogger(cfg.run_dir)
    t0 = time.time()
    state = TrainState(params, opt_states["tri"], buffers)
    while (max_steps is None or step_idx < max_steps) and cur_nimg < cfg.total_kimg * 1000:
        batch = next(clip_iter)
        if mesh is not None:
            from ..parallel.mesh import shard_batch

            batch = shard_batch(mesh, batch)
        unet, T, do_r1 = fewshot_phase_schedule(
            step_idx, multiT or (batch["c"].shape[1],) * 3, cfg.wd_reg_interval
        )
        use_multiT = multiT is not None
        T = min(T, batch["c"].shape[1])
        sliced = dict(batch)
        for key in ("image", "c", "uv"):
            if key in sliced:
                sliced[key] = sliced[key][:, :T]
        sliced["v"] = {"uvcoords_image": batch["v"]["uvcoords_image"][:, :T]}
        Tc = min(frm_per_chunk, T)
        fake_idx = None
        if use_multiT:
            # per-step seeding keeps the draw reproducible across resume
            npr = np.random.RandomState(cfg.seed * 1000003 + step_idx)
            fake_idx = jnp.asarray(
                np.concatenate([[0], 1 + npr.permutation(T - 1)[: Tc - 1]]).astype(np.int32)
            )

        sliced["ws"] = jax.lax.stop_gradient(
            encode_fn(state.params, sliced["image"][:, 0, ..., :3])
        )
        state = TrainState(state.params, opt_states[unet], buffers)
        # Ireal then Igen, same param group (training_loop_video.py:302-303, 404-406)
        state, aux = steps[unet](
            state, sliced, jax.random.fold_in(rng, 2 * step_idx),
            do_igen=False, multiT=use_multiT, fake_idx=fake_idx,
        )
        if "z" in batch:
            state, aux_g = steps[unet](
                state, sliced, jax.random.fold_in(rng, 2 * step_idx + 1),
                do_igen=True, multiT=use_multiT, fake_idx=fake_idx,
                d_params=d_state.params if d_state is not None else None,
            )
            aux = {**aux, **aux_g}
        opt_states[unet] = state.opt_state
        if d_step_fn is not None and "z" in batch:
            d_state, d_aux = d_step_fn(
                state, d_state, sliced, jax.random.fold_in(rng, -step_idx - 1), do_r1=do_r1
            )
            aux = {**aux, **d_aux}
        cur_nimg += cfg.batch_size
        step_idx += 1
        for k, v in aux.items():
            collector.report(k, np.asarray(v))
        if on_step is not None:
            on_step(step_idx, cur_nimg, aux)
        if snapshot_every and step_idx % snapshot_every == 0:
            snapshot(f"snapshot-{cur_nimg:08d}")
        if step_idx % 50 == 0 or (max_steps and step_idx >= max_steps):
            collector.update()
            print(
                f"kimg {cur_nimg/1000:.2f} ({time.time()-t0:.0f}s) "
                + " ".join(f"{n}={collector.mean(n):.4f}" for n in collector.names())
            )
            logger.write(collector, cur_nimg)
    snapshot("snapshot-final")
    logger.close()
    return state, d_state


def train_oneshot(
    net,  # InversionNet (unet_type='segformer')
    variables,
    d_module,  # DualDiscriminator or None
    batch_iter,  # yields {'image', 'c', 'v', 'uv', 'z', 'gen_uv'?}
    cfg: "InversionTrainConfig",
    lpips_fn: Callable,
    id_fn: Optional[Callable] = None,
    max_steps: Optional[int] = None,
    resume_dir: Optional[str] = None,
    mesh=None,  # jax.sharding.Mesh with a 'data' axis → DP over its devices
):
    """One-shot-stage driver (reference training_loop_unet_interval.py:356-368):
    batch-parity phase alternation with per-unet masked optimizers; DP at
    --gpus=8 per train_inversion.sh:48 — here `mesh` shards the batch."""
    import os
    import time

    import numpy as np

    from ..utils.checkpoint import restore_orbax, save_orbax
    from ..utils.stats import Collector, StatsLogger

    os.makedirs(cfg.run_dir, exist_ok=True)
    rng = jax.random.PRNGKey(cfg.seed)
    buffers = {k: v for k, v in variables.items() if k != "params"}

    tx_tex = masked_adam(cfg.lr, oneshot_tex_trainable)
    tx_tri = masked_adam(cfg.lr, oneshot_tri_trainable)
    state = TrainState(variables["params"], tx_tex.init(variables["params"]), buffers)
    # one opt state per unet (the reference keeps two optimizers)
    opt_states = {"tex": state.opt_state, "tri": tx_tri.init(variables["params"])}

    d_state = None
    d_tx = None
    if d_module is not None and cfg.weights.adv > 0:
        d_vars = d_module.init(
            jax.random.PRNGKey(cfg.seed + 1),
            {"image": jnp.zeros((1, 512, 512, 3)), "image_raw": jnp.zeros((1, 128, 128, 3))},
            jnp.zeros((1, 25)),
        )
        d_tx = optax.adam(cfg.lr)
        d_state = TrainState(d_vars["params"], d_tx.init(d_vars["params"]),
                             {k: v for k, v in d_vars.items() if k != "params"})

    steps = {
        "tex": jax.jit(
            make_oneshot_train_step(net, d_module, lpips_fn, id_fn, tx_tex, d_tx, cfg.weights),
            static_argnames=("phase", "do_r1"),
        ),
        "tri": jax.jit(
            make_oneshot_train_step(net, d_module, lpips_fn, id_fn, tx_tri, d_tx, cfg.weights),
            static_argnames=("phase", "do_r1"),
        ),
    }

    cur_nimg = 0
    step_idx = 0
    if resume_dir is not None:
        template = {
            "params": state.params, "opt_states": opt_states,
            "cur_nimg": np.asarray(0), "step_idx": np.asarray(0),
        }
        if d_state is not None:
            template["d_params"] = d_state.params
            template["d_opt_state"] = d_state.opt_state
        payload = restore_orbax(resume_dir, template)
        state = TrainState(payload["params"], state.opt_state, buffers)
        opt_states = payload["opt_states"]
        cur_nimg = int(payload["cur_nimg"])
        step_idx = int(payload["step_idx"])
        if d_state is not None:
            d_state = TrainState(payload["d_params"], payload["d_opt_state"], d_state.buffers)

    def snapshot(tag):
        payload = {
            "params": state.params, "opt_states": opt_states,
            "cur_nimg": np.asarray(cur_nimg), "step_idx": np.asarray(step_idx),
        }
        if d_state is not None:
            payload["d_params"] = d_state.params
            payload["d_opt_state"] = d_state.opt_state
        save_orbax(os.path.join(cfg.run_dir, tag), payload)

    if mesh is not None:
        from ..parallel.mesh import replicate

        state = replicate(mesh, state)
        opt_states = replicate(mesh, opt_states)
        if d_state is not None:
            d_state = replicate(mesh, d_state)

    collector = Collector()
    logger = StatsLogger(cfg.run_dir)
    t0 = time.time()
    while (max_steps is None or step_idx < max_steps) and cur_nimg < cfg.total_kimg * 1000:
        batch = next(batch_iter)
        if mesh is not None:
            from ..parallel.mesh import shard_batch

            batch = shard_batch(mesh, batch)
        i_phase, unet, d_phase, do_r1 = oneshot_phase_schedule(step_idx, cfg.wd_reg_interval)
        state = TrainState(state.params, opt_states[unet], state.buffers)
        state, d_state, aux = steps[unet](
            state, d_state, batch, jax.random.fold_in(rng, step_idx), phase=i_phase, do_r1=False
        )
        opt_states[unet] = state.opt_state
        if d_state is not None and cfg.weights.adv > 0:
            _, d_state, d_aux = steps[unet](
                state, d_state, batch, jax.random.fold_in(rng, step_idx + 1),
                phase=d_phase, do_r1=do_r1,
            )
            aux = {**aux, **d_aux}
        cur_nimg += cfg.batch_size
        step_idx += 1
        for k, v in aux.items():
            collector.report(k, np.asarray(v))
        if step_idx % 50 == 0 or (max_steps and step_idx >= max_steps):
            collector.update()
            print(
                f"kimg {cur_nimg/1000:.1f} ({time.time()-t0:.0f}s) "
                + " ".join(f"{n}={collector.mean(n):.4f}" for n in collector.names())
            )
            logger.write(collector, cur_nimg)
    snapshot("snapshot-final")
    logger.close()
    return state, d_state


class FewshotPrograms:
    """Jitted program set for the few-shot stage (VERDICT r2 #1 restructure).

    The reference's multiT rollout keeps its ENTIRE chunk loop — including the
    last chunk's e4e render and U-Net input assembly — under torch.no_grad()
    (video_loss.py:297-325); only the final U-Net forwards, the SFT backbone
    pass and one render carry gradients (:326-357). Splitting the train step at
    that boundary yields small programs whose compiled size is independent of
    the clip length T:

      encode        e4e W+ codes for frame 0              (IR-SE trunk)
      mapping       z → ws at ψ=0.6 (Igen clip sampling)
      feats         frozen texture/static feature lists   (2 backbones)
      chunk_inputs  e4e render of one Tc-chunk → inputs   (host loop, 1-frame program)
      chunk_state   GRU state roll-forward                (2 U-Net fwds)
      render        frozen-feature render of a Tc-chunk   (host loop, 1-frame program)
      final_render  offsets+SFT render, no grad           (host composition)
      grad          gradient pipeline over 4 jitted pieces:
                      unets_fwd        (offsets, sft) forward
                      render_loss_cot1 per-frame loss + d(offsets, static_feats)
                                       [ONE render fwd+bwd; cotangents mean-
                                        accumulated across frames on host]
                      backbone_vjp     d static_feats → d sft           [backbone fwd+bwd]
                      unets_vjp        cotangents → param grads         [U-Nets fwd+bwd]

    Every program that contains a generator render holds it for exactly ONE
    frame: at the flagship config even a 4-frame render program exceeds v5e
    HBM at compile time (the round-3 on-chip attempt died with XLA
    materializing a 19.3 GB patch tensor for the SR up-conv at B·Tc=4;
    recorded in scripts/r3_chain2.sh and the per-frame split here), so the
    multi-frame contract members are host loops over per-frame jitted
    programs. docs/fewshot_tpu_run.json records the split step executing on
    the chip.

    The {6,12,18} multi-T curriculum reuses the same compiled programs — only
    the number of host-side chunk calls changes. Igen supervises every chunk
    with the final offsets; its gradient is accumulated over Tc-frame slices
    (equal chunk sizes ⇒ mean of per-chunk means == the reference's global
    mean for every loss term). Inside `grad`, the frozen generator/encoder
    subtrees are stop_gradient-pruned so the backward graph only covers the
    U-Nets and the activation path through the render (training_loop_video.py
    :284-303 trains the U-Net decoders only).
    """

    def __init__(self, net, lpips_fn: Callable, weights: InversionLossWeights,
                 d_module=None, fast_no_grad: str = "off",
                 fast_grad: str = "off", fast_interpret: bool = False):
        from .fast_render import grad_overrides, nograd_overrides
        from .inversion import fewshot_feature_losses, fewshot_image_loss_frame

        self.net = net
        self.weights = weights
        # structured fast paths for the no-grad renders (Igen targets, the
        # chunk-prefix e4e renders, eval rollouts) — sound because the
        # generator is frozen in this stage; see train/fast_render.py
        nograd_ov = nograd_overrides(fast_no_grad, interpret=fast_interpret)
        # structured sampling for the GRAD-carrying render (render_loss_cot1):
        # deterministic+pooled depths route both passes through the windowed
        # sampler whose backward is window-block-granular (fast_grad="pallas"
        # additionally takes the custom-VJP Pallas forward)
        grad_ov = grad_overrides(fast_grad, interpret=fast_interpret)
        sg = jax.lax.stop_gradient

        def _rngs(rng):
            return {"noise": jax.random.fold_in(rng, 0), "ray": jax.random.fold_in(rng, 1)}

        def encode(params, buffers, img, rng):
            return net.apply({"params": params, **buffers}, img,
                             method=lambda m, x: m.encode(x), rngs=_rngs(rng))

        def mapping(params, buffers, z, c0, rng):
            return net.apply(
                {"params": params, **buffers}, z, c0,
                method=lambda m, z, c: m.generator.mapping(z, c, truncation_psi=0.6),
                rngs=_rngs(rng),
            )

        def feats(params, buffers, ws, rng):
            return net.apply({"params": params, **buffers}, ws,
                             method=lambda m, w: m.backbone_feats(w), rngs=_rngs(rng))

        def chunk_inputs1(params, buffers, frames_t, c_t, v_t, uv_t, ws, tex, static, rng):
            """multiT_chunk_inputs on a single-frame [B, 1, ...] slice — the
            compiled program holds ONE render regardless of the chunk length.
            (At B·Tc=4 the whole-chunk program OOM'd HBM at compile: XLA
            materializes a 19.3 GB patch tensor for the SR up-conv.)"""
            return net.apply(
                {"params": params, **buffers}, frames_t, c_t, v_t, uv_t, ws, tex, static,
                method=lambda m, *a: m.multiT_chunk_inputs(*a, nograd_render=nograd_ov),
                rngs=_rngs(rng),
            )

        self._chunk_inputs1 = jax.jit(chunk_inputs1)

        def chunk_inputs(params, buffers, frames, c, v, uv, ws, tex, static, rng):
            """Host loop over frames; same contract as the whole-chunk program
            ([B, Tc, ...] uv/tri inputs, flat [B·Tc, ...] e4e image)."""
            B, Tc = c.shape[:2]
            uvi = v["uvcoords_image"]
            outs = [
                self._chunk_inputs1(
                    params, buffers, frames[:, t:t + 1], c[:, t:t + 1],
                    {"uvcoords_image": uvi[:, t:t + 1]}, uv[:, t:t + 1],
                    ws, tex, static, jax.random.fold_in(rng, t),
                )
                for t in range(Tc)
            ]
            uv_input = jnp.concatenate([o[0] for o in outs], axis=1)
            tri_input = jnp.concatenate([o[1] for o in outs], axis=1)
            e4e = jnp.stack([o[2] for o in outs], axis=1)
            e4e = e4e.reshape(B * Tc, *e4e.shape[2:])
            return uv_input, tri_input, e4e

        def chunk_state(params, buffers, uv_input, tri_input, r_tex, r_tri, rng):
            return net.apply(
                {"params": params, **buffers}, uv_input, tri_input, r_tex, r_tri,
                method=lambda m, ui, ti, rt, rr: m.multiT_chunk_state(ui, ti, rt, rr),
                rngs=_rngs(rng),
            )

        def render1(params, buffers, ws, tex, static, c_t, v_t, rng):
            """ONE frame through synthesis_withTexture ([B, ...] leaves).

            Every caller is no-grad (Igen targets video_loss.py:377-388 —
            stop-gradient targets — and the eval rollout), so the render
            rides the `fast_no_grad` structured path when enabled."""
            out = net.apply(
                {"params": params, **buffers}, ws, tex, c_t, v_t, static,
                method=lambda m, w, t, cc, vv, s: m.generator.synthesis_withTexture(
                    w, t, cc, vv, static_feats=s, noise_mode="const",
                    evaluation=nograd_ov is not None,
                    rendering_overrides=nograd_ov,
                ),
                rngs=_rngs(rng),
            )
            return {"image": out["image"], "feature_image": out["feature_image"],
                    "triplane": out["triplane"]}

        self._render1 = jax.jit(render1)

        def render(params, buffers, ws, tex, static, c, v, rng):
            """Per-frame host loop; returns flat [B·Tc, ...] leaves (b-major),
            matching the whole-chunk program's reshape contract."""
            B, Tc = c.shape[:2]
            uvi = v["uvcoords_image"]
            outs = [
                self._render1(params, buffers, ws, tex, static, c[:, t],
                              {"uvcoords_image": uvi[:, t]}, jax.random.fold_in(rng, t))
                for t in range(Tc)
            ]
            return {
                kk: jnp.stack([o[kk] for o in outs], axis=1).reshape(
                    B * Tc, *outs[0][kk].shape[1:]
                )
                for kk in outs[0]
            }

        def offset_feats(tex, off):
            return [f + o for f, o in zip(tex, off)] + list(tex[len(off):])

        self._offset_feats = jax.jit(offset_feats)

        def final_render(params, buffers, uv_input, tri_input, r_tex, r_tri,
                         ws, tex, static, c_sel, v_sel, rng):
            """multiT_final (uvnet.py) as a host composition of the existing
            sub-programs — U-Nets once, SFT backbone once, then ONE render per
            selected frame. Same flat [B·T_out, ...] output contract."""
            kk = jax.random.fold_in
            off, sft = self.unets_fwd(params, buffers, uv_input, tri_input,
                                      r_tex, r_tri, kk(rng, 1))
            statics = self.backbone_sft(params, buffers, ws, sft, kk(rng, 2))
            texture_feats = self._offset_feats(tex, off)
            B, T_out = c_sel.shape[:2]
            uvi = v_sel["uvcoords_image"]
            outs = [
                self._render1(params, buffers, ws, texture_feats, statics,
                              c_sel[:, t], {"uvcoords_image": uvi[:, t]}, kk(rng, 10 + t))
                for t in range(T_out)
            ]
            return {
                name: jnp.stack([o[name] for o in outs], axis=1).reshape(
                    B * T_out, *outs[0][name].shape[1:]
                )
                for name in ("image", "feature_image")
            }

        # ---- gradient suffix as a manual chain-rule PIPELINE of four small
        # programs (each contains at most ONE subsystem's forward+backward) —
        # the single fused grad program (U-Nets + SFT backbone + render,
        # fwd+bwd) is compilable in principle but takes >40 min of XLA-CPU
        # compile on a 1-core host. Chain: θ_dec → (offsets, sft) →
        # static_feats = B(ws, sft) → render → loss; cotangents flow back
        # program-by-program. Forward recompute inside each vjp program is the
        # standard remat trade (a U-Net fwd + a backbone fwd per step).

        def _run_unets(m, ui, ti, rt, rr):
            off, _ = m.unet_encoder.texture_unet(ui, r_list=rt)
            sft, _ = m.unet_encoder.triplane_unet(ti, r_list=rr)
            return off, sft

        def unets_fwd(params, buffers, uv_input, tri_input, r_tex, r_tri, rng):
            return net.apply(
                {"params": params, **buffers}, uv_input, tri_input, r_tex, r_tri,
                method=_run_unets, rngs=_rngs(rng),
            )

        def backbone_sft(params, buffers, ws, sft, rng):
            return net.apply(
                {"params": params, **buffers}, ws, sft,
                method=lambda m, w, s: m.generator.backbone.synthesis(
                    w, return_list=True, feat_conditions=s, noise_mode="const"
                ),
                rngs=_rngs(rng),
            )

        def render_loss_cot1(params, buffers, tex_offsets, static_feats, ws, tex,
                             c_t, v_t, target_t, d_params, rng,
                             do_igen: bool, masked: bool):
            """ONE frame's loss + cotangents w.r.t. (tex_offsets, static_feats);
            the program contains exactly one render forward+backward. Every
            loss term is a per-frame mean, so the multi-frame cotangent is the
            mean of these per-frame cotangents (accumulated in `grad`).
            `masked` applies the Ireal head-mask composite (selection index
            >= 1, video_loss.py:439-440)."""
            B = c_t.shape[0]

            def f(args):
                offsets, statics = args
                texture_feats = [x + o for x, o in zip(tex, offsets)] + list(tex[len(offsets):])
                out = net.apply(
                    {"params": params, **buffers}, ws, texture_feats, c_t, v_t, statics,
                    method=lambda m, w, t, cc, vv, s: m.generator.synthesis_withTexture(
                        w, t, cc, vv, static_feats=s, noise_mode="const",
                        rendering_overrides=grad_ov,
                    ),
                    rngs=_rngs(rng),
                )
                if do_igen:
                    d_apply = None
                    if d_params is not None and d_module is not None and weights.adv > 0:
                        c0 = jnp.zeros((B, c_t.shape[-1]), c_t.dtype)
                        d_apply = lambda pair: d_module.apply({"params": d_params}, pair, c0)
                    return fewshot_feature_losses(out, target_t, lpips_fn, weights, d_apply)
                return fewshot_image_loss_frame(out["image"], target_t, lpips_fn,
                                                weights, masked)

            (_, aux), cot = jax.value_and_grad(f, has_aux=True)((tex_offsets, static_feats))
            return cot, aux

        def backbone_vjp(params, buffers, ws, sft, cot_static, rng):
            """d static_feats → d sft through the frozen SFT backbone."""

            def f(s):
                return net.apply(
                    {"params": params, **buffers}, ws, s,
                    method=lambda m, w, s_: m.generator.backbone.synthesis(
                        w, return_list=True, feat_conditions=s_, noise_mode="const"
                    ),
                    rngs=_rngs(rng),
                )

            _, vjp = jax.vjp(f, sft)
            # f returns the backbone's feature LIST — the cotangent must match
            # that pytree structure exactly
            return vjp(list(cot_static) if isinstance(cot_static, tuple) else cot_static)[0]

        def unets_vjp(params, buffers, uv_input, tri_input, r_tex, r_tri,
                      cot_off, cot_sft, rng):
            """(d offsets, d sft) → d θ; U-Net trunks' backward pruned (the
            reference trains decoder ups + heads only, training_loop_video.py
            :284-303)."""

            def f(p):
                p2 = {**p, "generator": sg(p["generator"]), "encoder": sg(p["encoder"])}
                ue = dict(p2["unet_encoder"])
                for un in ("texture_unet", "triplane_unet"):
                    if un in ue:
                        sub = dict(ue[un])
                        for frozen in ("input_layer", "body"):
                            if frozen in sub:
                                sub[frozen] = sg(sub[frozen])
                        ue[un] = sub
                p2["unet_encoder"] = ue
                return net.apply(
                    {"params": p2, **buffers}, uv_input, tri_input, r_tex, r_tri,
                    method=_run_unets, rngs=_rngs(rng),
                )

            _, vjp = jax.vjp(f, params)
            return vjp((cot_off, cot_sft))[0]

        self.encode = jax.jit(encode)
        self.mapping = jax.jit(mapping)
        self.feats = jax.jit(feats)
        self.chunk_inputs = chunk_inputs  # host loop over _chunk_inputs1
        self.chunk_state = jax.jit(chunk_state)
        self.render = render  # host loop over _render1
        self.final_render = final_render  # host composition over sub-programs
        self.unets_fwd = jax.jit(unets_fwd)
        self.backbone_sft = jax.jit(backbone_sft)
        self.render_loss_cot1 = jax.jit(
            render_loss_cot1, static_argnames=("do_igen", "masked")
        )
        self.backbone_vjp = jax.jit(backbone_vjp)
        self.unets_vjp = jax.jit(unets_vjp)

        if os.environ.get("FEWSHOT_DEBUG_TIMING"):
            import time as _time

            def _timed(name, fn):
                def wrapped(*a, **kw):
                    t0 = _time.time()
                    out = fn(*a, **kw)
                    out = jax.block_until_ready(out)
                    print(f"[fewshot:{name}] {_time.time()-t0:.1f}s", flush=True)
                    return out

                return wrapped

            for _n in ("encode", "mapping", "feats", "chunk_inputs",
                       "chunk_state", "render", "final_render", "unets_fwd",
                       "backbone_sft", "render_loss_cot1", "backbone_vjp",
                       "unets_vjp"):
                setattr(self, _n, _timed(_n, getattr(self, _n)))

    def grad(self, params, buffers, uv_input, tri_input, r_tex, r_tri, ws, tex,
             static, c_sel, v_sel, target, d_params, rng, do_igen: bool = False):
        """Host-side gradient pipeline over the four jitted pieces. `target`
        is real frames [B,Tc,H,W,3+m] (Ireal) or the frozen generator's
        {'image','feature_image','triplane'} slice (Igen); `d_params`
        (optional) enables the Igen adv term (video_loss.py:390-396).
        `static` (the frozen no-SFT feature list) is unused — the SFT backbone
        recomputes statics from the predicted conditions, matching
        video_loss.py:345-349 — and kept for signature symmetry with
        `final_render`."""
        k = jax.random.fold_in
        off, sft = self.unets_fwd(params, buffers, uv_input, tri_input, r_tex, r_tri,
                                  k(rng, 1))
        statics = self.backbone_sft(params, buffers, ws, sft, k(rng, 2))

        # Per-frame loss/cotangent accumulation: each loss term is a mean over
        # equally-sized frames, so mean-of-per-frame cotangents == the
        # multi-frame cotangent. Keeps the fwd+bwd program at ONE render.
        B, T_out = c_sel.shape[:2]
        uvi = v_sel["uvcoords_image"]
        cot_off = cot_static = None
        aux: Dict[str, Any] = {}
        for t in range(T_out):
            if do_igen:
                target_t = {
                    name: val.reshape(B, T_out, *val.shape[1:])[:, t]
                    for name, val in target.items()
                }
            else:
                target_t = target[:, t]
            (co, cs), aux_t = self.render_loss_cot1(
                params, buffers, off, statics, ws, tex,
                c_sel[:, t], {"uvcoords_image": uvi[:, t]}, target_t, d_params,
                k(k(rng, 3), t), do_igen=do_igen, masked=(t > 0),
            )
            if cot_off is None:
                cot_off, cot_static, aux = co, cs, aux_t
            else:
                cot_off = jax.tree_util.tree_map(jnp.add, cot_off, co)
                cot_static = jax.tree_util.tree_map(jnp.add, cot_static, cs)
                aux = {name: aux[name] + v for name, v in aux_t.items()}
        if T_out > 1:
            cot_off = jax.tree_util.tree_map(lambda x: x / T_out, cot_off)
            cot_static = jax.tree_util.tree_map(lambda x: x / T_out, cot_static)
            aux = {name: v / T_out for name, v in aux.items()}

        cot_sft = self.backbone_vjp(params, buffers, ws, sft, cot_static, k(rng, 2))
        grads = self.unets_vjp(
            params, buffers, uv_input, tri_input, r_tex, r_tri, cot_off, cot_sft,
            k(rng, 1),
        )
        return grads, aux


def make_fewshot_train_step(
    I_module,  # InversionNet
    lpips_fn: Callable,
    tx: optax.GradientTransformation,
    weights: InversionLossWeights,
    frm_per_chunk: int = 6,
    programs: Optional[FewshotPrograms] = None,
    d_module=None,
    donate: bool = False,
    fast_no_grad: str = "off",
    fast_grad: str = "off",
    fast_interpret: bool = False,
):
    """One step = one I-phase update (training_loop_video.py:402-429).

    Returns a HOST-SIDE orchestrator (not itself jittable): it sequences the
    `FewshotPrograms` jitted sub-programs so no single XLA program contains
    more than one generator render — the monolithic step was uncompilable
    (VERDICT r2 #1). `do_igen` selects the Igen (synthetic-clip) vs Ireal
    (real-clip) phase; `multiT` enables Tc-frame chunking with carried GRU
    state; `fake_idx` is the Ireal loss frame subset ([0] + random,
    video_loss.py:429)."""
    progs = programs if programs is not None else FewshotPrograms(
        I_module, lpips_fn, weights, d_module=d_module,
        fast_no_grad=fast_no_grad, fast_grad=fast_grad,
        fast_interpret=fast_interpret,
    )

    # `donate` (opt-in): the old params/opt-state buffers are dead the moment
    # the update is applied, and at the flagship config a second live param
    # set is the difference between fitting v5e HBM and the Igen
    # ResourceExhausted (docs/fewshot_tpu_run.json r4 run 1). Off by default
    # because donation invalidates the caller's old-params references
    # (parity tests compare pre/post trees). Buffers are never donated — the
    # drivers thread one buffers dict across steps.
    def _update(params, opt_state, grads):
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    _update_jit = (
        jax.jit(_update, donate_argnums=(0, 1)) if donate else jax.jit(_update)
    )

    def apply_fn(state: TrainState, grads):
        params, opt_state = _update_jit(state.params, state.opt_state, grads)
        return TrainState(params, opt_state, state.buffers)

    def step(state: TrainState, batch: Dict, rng, do_igen: bool = False,
             multiT: bool = False, fake_idx=None, d_params=None):
        params, buffers = state.params, state.buffers
        vid_c = batch["c"]
        B, T = vid_c.shape[:2]
        Tc = min(frm_per_chunk, T) if multiT else T
        assert T % Tc == 0, (T, Tc)
        n = T // Tc
        uvi = batch["v"]["uvcoords_image"]

        def sl(x, i):
            return x[:, i * Tc:(i + 1) * Tc]

        def v_sl(i):
            return {"uvcoords_image": sl(uvi, i)}

        def k(i):
            return jax.random.fold_in(rng, i)

        if do_igen:
            # synthetic GT clip, one Tc slice at a time (video_loss.py:377-388)
            ws_gen = progs.mapping(params, buffers, batch["z"], vid_c[:, 0], k(1000))
            gt_tex, gt_static = progs.feats(params, buffers, ws_gen, k(1001))
            # HBM plan (docs/fewshot_tpu_run.json r4: T=12 Igen OOMed holding
            # every chunk's {image, feature_image, triplane} across the whole
            # grad phase — ~250 MB/chunk at flagship): multi-chunk clips keep
            # only the target IMAGES here and re-render chunk i's full target
            # (same rng key ⇒ bitwise-identical) right before its grad, so at
            # most ONE full target dict is live at a time. Single-chunk clips
            # (the shipped T=4 unit) keep the original single-render path.
            lazy_targets = n > 1

            def render_target(i):
                return progs.render(params, buffers, ws_gen, gt_tex, gt_static,
                                    sl(vid_c, i), v_sl(i), k(1100 + i))

            if lazy_targets:
                frame_slices = []
                for i in range(n):
                    t = render_target(i)
                    frame_slices.append(t["image"].reshape(B, Tc, *t["image"].shape[1:]))
                    del t  # drop feature_image/triplane until the grad loop
                frames = jnp.concatenate(frame_slices, axis=1)
                targets = None
            else:
                targets = [render_target(i) for i in range(n)]
                frames = jnp.concatenate(
                    [t["image"].reshape(B, Tc, *t["image"].shape[1:]) for t in targets],
                    axis=1,
                )
            # run_G(ws=None) re-encodes the synthetic frame 0 (video_loss.py:387,299)
            ws = progs.encode(params, buffers, frames[:, 0], k(1002))
        else:
            frames = batch["image"][..., :3]
            ws = batch.get("ws")
            if ws is None:
                ws = progs.encode(params, buffers, frames[:, 0], k(1002))
        tex, static = progs.feats(params, buffers, ws, k(1003))

        r_tex = r_tri = None
        uv_in = tri_in = None
        for i in range(n):
            uv_in, tri_in, _ = progs.chunk_inputs(
                params, buffers, sl(frames, i), sl(vid_c, i), v_sl(i),
                sl(batch["uv"], i), ws, tex, static, k(i),
            )
            if i < n - 1:
                r_tex, r_tri = progs.chunk_state(
                    params, buffers, uv_in, tri_in, r_tex, r_tri, k(100 + i)
                )

        if do_igen:
            grads = None
            aux_acc: Dict[str, Any] = {}
            for i in range(n):
                target_i = render_target(i) if lazy_targets else targets[i]
                g, aux = progs.grad(
                    params, buffers, uv_in, tri_in, r_tex, r_tri, ws, tex, static,
                    sl(vid_c, i), v_sl(i), target_i, d_params, k(200 + i), do_igen=True,
                )
                del target_i
                grads = g if grads is None else jax.tree_util.tree_map(jnp.add, grads, g)
                aux_acc = aux if not aux_acc else {kk: aux_acc[kk] + v for kk, v in aux.items()}
            if n > 1:
                grads = jax.tree_util.tree_map(lambda x: x / n, grads)
                aux_acc = {kk: v / n for kk, v in aux_acc.items()}
            return apply_fn(state, grads), {f"Igen/{kk}": v for kk, v in aux_acc.items()}

        # Ireal: loss on the fake_idx selection (frame 0 + random, video_loss.py:429)
        if fake_idx is not None:
            idx = jnp.asarray(fake_idx)
            c_sel = jnp.take(vid_c, idx, axis=1)
            v_sel = {"uvcoords_image": jnp.take(uvi, idx, axis=1)}
            real_sel = jnp.take(batch["image"], idx, axis=1)
        else:
            c_sel, v_sel, real_sel = vid_c, {"uvcoords_image": uvi}, batch["image"]
        g, aux = progs.grad(
            params, buffers, uv_in, tri_in, r_tex, r_tri, ws, tex, static,
            c_sel, v_sel, real_sel, None, k(200), do_igen=False,
        )
        return apply_fn(state, g), {f"Ireal/{kk}": v for kk, v in aux.items()}

    return step


def fewshot_phase_schedule(batch_idx: int, curriculum=(6, 12, 18), d_reg_interval: int = 16):
    """training_loop_video.py:404-406 + 424-429: (unet param group, clip length
    T for this batch, do_r1) — tri-unet on even batches, tex-unet on odd; the
    multi-T curriculum cycles 6/6-12/12-18 by batch_idx % 5."""
    unet = "tri" if batch_idx % 2 == 0 else "tex"
    m = batch_idx % 5
    T = curriculum[0] if m < 1 else (curriculum[1] if m < 3 else curriculum[2])
    do_r1 = batch_idx % d_reg_interval == 0
    return unet, T, do_r1


def make_fewshot_d_step(
    I_module,  # InversionNet
    D_module,  # DualDiscriminator
    d_tx: optax.GradientTransformation,
    weights: InversionLossWeights,
    frm_per_chunk: int = 6,
    programs: Optional[FewshotPrograms] = None,
):
    """Few-shot D phase (video_loss.py:479-526): fake = recurrent rollout on a
    synthetic clip, 'real' = the frozen generator's own render of that clip.

    Host-side orchestrator: the no-grad rollout reuses the FewshotPrograms
    chunk programs (run_G_seq over T frames ≡ Tc-chunked GRU with carried
    state — same recurrence, eval-mode BN trunks), so only the small
    D-forward+R1 program differentiates."""
    progs = programs if programs is not None else FewshotPrograms(
        I_module, lambda a, b: jnp.float32(0.0), weights
    )

    def d_grad_fn(d_params, d_buffers, fake_pair, real_pair, c_flat, rng, do_r1: bool):
        rngs = {"noise": jax.random.fold_in(rng, 0)}

        def d_loss_fn(p):
            def d_apply(img, c):
                return D_module.apply({"params": p, **d_buffers}, img, c, rngs=rngs)

            return oneshot_d_loss(d_apply, fake_pair, real_pair, c_flat, weights, do_r1)

        (_, aux), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(d_params)
        return d_grads, aux

    d_grad_fn = jax.jit(d_grad_fn, static_argnames=("do_r1",))

    @jax.jit
    def d_apply_fn(d_state: TrainState, grads):
        updates, opt_state = d_tx.update(grads, d_state.opt_state, d_state.params)
        return TrainState(
            optax.apply_updates(d_state.params, updates), opt_state, d_state.buffers
        )

    def step(state: TrainState, d_state: TrainState, batch: Dict, rng, do_r1: bool = False):
        params, buffers = state.params, state.buffers
        vid_c = batch["c"]
        B, T = vid_c.shape[:2]
        Tc = min(frm_per_chunk, T)
        assert T % Tc == 0, (T, Tc)
        n = T // Tc
        uvi = batch["v"]["uvcoords_image"]

        def sl(x, i):
            return x[:, i * Tc:(i + 1) * Tc]

        def v_sl(i):
            return {"uvcoords_image": sl(uvi, i)}

        def k(i):
            return jax.random.fold_in(rng, i)

        ws_gen = progs.mapping(params, buffers, batch["z"], vid_c[:, 0], k(1000))
        gt_tex, gt_static = progs.feats(params, buffers, ws_gen, k(1001))
        reals = [
            progs.render(params, buffers, ws_gen, gt_tex, gt_static,
                         sl(vid_c, i), v_sl(i), k(1100 + i))
            for i in range(n)
        ]
        frames = jnp.concatenate(
            [t["image"].reshape(B, Tc, *t["image"].shape[1:]) for t in reals], axis=1
        )
        ws = progs.encode(params, buffers, frames[:, 0], k(1002))
        tex, static = progs.feats(params, buffers, ws, k(1003))

        r_tex = r_tri = None
        uv_in = tri_in = None
        for i in range(n):
            uv_in, tri_in, _ = progs.chunk_inputs(
                params, buffers, sl(frames, i), sl(vid_c, i), v_sl(i),
                sl(batch["uv"], i), ws, tex, static, k(i),
            )
            if i < n - 1:
                r_tex, r_tri = progs.chunk_state(
                    params, buffers, uv_in, tri_in, r_tex, r_tri, k(100 + i)
                )
        fakes = [
            progs.final_render(params, buffers, uv_in, tri_in, r_tex, r_tri,
                               ws, tex, static, sl(vid_c, i), v_sl(i), k(200 + i))
            for i in range(n)
        ]
        fake_pair = {
            "image": jnp.concatenate([f["image"] for f in fakes], axis=0),
            "image_raw": jnp.concatenate([f["feature_image"][..., :3] for f in fakes], axis=0),
        }
        real_pair = {
            "image": jnp.concatenate([t["image"][..., :3] for t in reals], axis=0),
            "image_raw": jnp.concatenate([t["feature_image"][..., :3] for t in reals], axis=0),
        }
        g, aux = d_grad_fn(
            d_state.params, d_state.buffers, fake_pair, real_pair,
            vid_c.reshape(B * T, -1), k(2000), do_r1=do_r1,
        )
        return d_apply_fn(d_state, g), {f"D/{kk}": v for kk, v in aux.items()}

    return step
