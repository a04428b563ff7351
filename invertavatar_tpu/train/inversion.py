"""Inversion-encoder training losses (reference encoder_inversion/{w_loss,video_loss}.py).

Three stages (encoder_inversion/train.py:79-90 dispatch):
  * e4e stage (`w_loss.py:92-270`): phases Ireal / Igen / Ireal_novel on the
    W+ encoder against the frozen generator, plus a latent-code adversary
    (WDmain / WDreg with R1 on w).
  * few-shot video stage (`video_loss.py:176-527`): Ireal (real clips;
    first-frame full-image loss, later frames head-masked) and Igen
    (self-supervised: random z renders a synthetic "GT" clip, exact
    feature-level supervision raw_l1 / tri / lr_lpips), with the recurrent
    encoder rollout `run_G_seq`; optional image discriminator phases.
  * multi-T curriculum (`video_loss.py:289-357`): earlier chunks roll the GRU
    state forward under stop_gradient, only the last chunk backprops.

Each phase is a pure loss function; steps compose them with optax updates.
Under the data mesh, batch sharding + replicated params give the reference's
DP semantics with XLA-inserted collectives.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..ops.resize import resize_bilinear
from .state import TrainState


@dataclasses.dataclass(frozen=True)
class InversionLossWeights:
    """Keys follow the reference YAML configs (encoder_inversion/config/*.yaml)."""

    l1: float = 1.0
    lpips: float = 0.8
    id: float = 0.1
    w_delta: float = 0.0
    w_regular: float = 0.0
    w_discriminator: float = 0.0
    raw_l1: float = 1.0
    tri: float = 1.0
    texture: float = 0.0
    lr_lpips: float = 0.0
    multiview_id: float = 0.0
    mouth: float = 0.0
    adv: float = 0.0
    wd_r1_gamma: float = 10.0
    adv_r1_gamma: float = 10.0


def _to256(img):
    if img.shape[1] != 256:
        return resize_bilinear(img, (256, 256), antialias=True)
    return img


# --------------------------------------------------------------------- e4e stage


def e4e_igen_loss(
    e4e_apply: Callable,
    gen_mapping: Callable,
    gen_synthesis: Callable,
    wd_apply: Optional[Callable],
    lpips: Callable,
    weights: InversionLossWeights,
    latent_avg: jnp.ndarray,
    z, c, v,
    gen_synthesis_target: Optional[Callable] = None,
):
    """Igen (w_loss.py:99-158): invert a generated image; feature-exact supervision.

    `gen_synthesis_target` (optional) renders the stop-gradient target; the
    training loops pass a structured-fast-path closure here (the target is
    no-grad — train/fast_render.py) while the student render keeps the
    differentiable formulation."""
    ws_gen = jax.lax.stop_gradient(gen_mapping(z, c, truncation_psi=0.6))
    gen_out = jax.lax.stop_gradient(
        (gen_synthesis_target or gen_synthesis)(ws_gen, c, v)
    )
    ws_pred = e4e_apply(_to256(gen_out["image"]))
    i_out = gen_synthesis(ws_pred, c, v)

    losses = {}
    if weights.w_discriminator > 0 and wd_apply is not None:
        fake_pred = wd_apply(ws_pred.reshape(-1, ws_pred.shape[-1]))
        losses["w_discriminator"] = jnp.mean(jax.nn.softplus(-fake_pred))
    if weights.w_delta > 0:
        delta = ws_pred[:, 1:] - ws_pred[:, 0:1]
        losses["w_delta"] = jnp.mean(jnp.linalg.norm(delta, axis=2))
    if weights.w_regular > 0:
        losses["w_regular"] = jnp.mean(jnp.square(ws_pred - latent_avg[None, None]))
    if weights.l1 > 0:
        losses["l1"] = jnp.mean(jnp.abs(_to256(gen_out["image"]) - _to256(i_out["image"])))
    if weights.lpips > 0:
        losses["lpips"] = lpips(_to256(gen_out["image"]), _to256(i_out["image"]))
    if weights.raw_l1 > 0:
        losses["raw_l1"] = jnp.mean(jnp.abs(gen_out["feature_image"] - i_out["feature_image"]))
    if weights.tri > 0:
        losses["tri"] = jnp.mean(jnp.abs(gen_out["triplane"] - i_out["triplane"]))
    if weights.lr_lpips > 0:
        losses["lr_lpips"] = lpips(
            gen_out["feature_image"][..., :3], i_out["feature_image"][..., :3]
        )
    total = sum(getattr(weights, k) * val for k, val in losses.items())
    return total, losses


def e4e_ireal_loss(
    e4e_apply: Callable,
    gen_synthesis: Callable,
    wd_apply: Optional[Callable],
    lpips: Callable,
    id_fn: Optional[Callable],
    weights: InversionLossWeights,
    latent_avg: jnp.ndarray,
    real_img, real_c, real_v,
):
    """Ireal (w_loss.py:160-208): invert a real image."""
    real256 = _to256(real_img[..., :3])
    ws_pred = e4e_apply(real256)
    i_out = gen_synthesis(ws_pred, real_c, real_v)
    fake256 = _to256(i_out["image"])

    losses = {}
    if weights.w_regular > 0:
        losses["w_regular"] = jnp.mean(jnp.square(ws_pred - latent_avg[None, None]))
    if weights.w_discriminator > 0 and wd_apply is not None:
        fake_pred = wd_apply(ws_pred.reshape(-1, ws_pred.shape[-1]))
        losses["w_discriminator"] = jnp.mean(jax.nn.softplus(-fake_pred))
    if weights.w_delta > 0:
        delta = ws_pred[:, 1:] - ws_pred[:, 0:1]
        losses["w_delta"] = jnp.mean(jnp.linalg.norm(delta, axis=2))
    if weights.l1 > 0:
        losses["l1"] = jnp.mean(jnp.abs(real256 - fake256))
    if weights.lpips > 0:
        losses["lpips"] = lpips(real256, fake256)
    if weights.id > 0 and id_fn is not None:
        losses["id"] = id_fn(real256, fake256)
    total = sum(getattr(weights, k) * val for k, val in losses.items())
    return total, losses


def e4e_ireal_novel_loss(
    e4e_apply: Callable,
    gen_synthesis: Callable,
    id_fn: Callable,
    weights: InversionLossWeights,
    real_img, novel_c, real_v,
):
    """Ireal_novel (w_loss.py:215-235): render the inverted code under a
    different camera and demand ID consistency with the source image."""
    real256 = _to256(real_img[..., :3])
    ws = e4e_apply(real256)
    multiview = gen_synthesis(ws, novel_c, real_v)["image"]
    losses = {"multiview_id": id_fn(real_img[..., :3], multiview)}
    total = weights.multiview_id * losses["multiview_id"]
    return total, losses


def wd_losses(
    wd_apply: Callable,
    ws_fake: jnp.ndarray,  # encoder outputs (stop-grad outside)
    ws_real: jnp.ndarray,  # generator mapping at psi 0.8 (stop-grad outside)
    weights: InversionLossWeights,
    do_r1: bool,
):
    """Latent discriminator phases (w_loss.py:240-270)."""
    fake_flat = ws_fake.reshape(-1, ws_fake.shape[-1])
    real_flat = ws_real.reshape(-1, ws_real.shape[-1])
    loss_dgen = jnp.mean(jax.nn.softplus(wd_apply(fake_flat)))
    loss_dreal = jnp.mean(jax.nn.softplus(-wd_apply(real_flat)))
    total = loss_dgen + loss_dreal
    aux = {"wd_gen": loss_dgen, "wd_real": loss_dreal}
    if do_r1:
        def score_sum(w):
            return jnp.sum(wd_apply(w))

        grads = jax.grad(score_sum)(real_flat)
        r1 = jnp.mean(jnp.sum(jnp.square(grads), axis=1))
        total = total + weights.wd_r1_gamma / 2 * r1
        aux["wd_r1"] = r1
    return total, aux


# ---------------------------------------------------------------- one-shot stage


def oneshot_igen_loss(
    inv_forward: Callable,  # ({'image','uv'}, c, v, return_feats) -> I_output dict
    gen_mapping: Callable,
    gen_synthesis_featmap: Callable,  # (ws, c, v) -> output dict incl. featmaps
    d_apply: Optional[Callable],
    lpips: Callable,
    id_fn: Optional[Callable],
    weights: InversionLossWeights,
    z, c, v, gen_uv,
):
    """Igen phase of the one-shot U-Net stage (unet_loss.py:99-147): invert a
    frozen-generator sample with exact feature supervision + optional adv."""
    sg = jax.lax.stop_gradient
    ws = sg(gen_mapping(z, c, truncation_psi=0.8))
    gen_out = {k: sg(val) if isinstance(val, jnp.ndarray) else [sg(f) for f in val]
               for k, val in gen_synthesis_featmap(ws, c, v).items()}
    i_out = inv_forward({"image": gen_out["image"], "uv": gen_uv}, c, v,
                        weights.texture > 0)

    losses = {}
    if weights.adv > 0 and d_apply is not None:
        logits = d_apply(
            {"image": i_out["image"], "image_raw": i_out["feature_image"][..., :3]},
            jnp.zeros_like(c),
        )
        losses["adv"] = jnp.mean(jax.nn.softplus(-logits))
    gen256 = _to256(gen_out["image"][..., :3])
    i256 = _to256(i_out["image"])
    if weights.l1 > 0:
        losses["l1"] = jnp.mean(jnp.abs(gen256 - i256))
    if weights.lpips > 0:
        losses["lpips"] = lpips(gen256, i256)
    if weights.raw_l1 > 0:
        losses["raw_l1"] = jnp.mean(jnp.abs(gen_out["feature_image"] - i_out["feature_image"]))
    if weights.tri > 0:
        losses["tri"] = jnp.mean(jnp.abs(gen_out["triplane"] - i_out["triplane"]))
    if weights.texture > 0:
        losses["texture"] = sum(
            jnp.mean(jnp.abs(g - i)) for g, i in zip(gen_out["texture"], i_out["texture"])
        )
    if weights.lr_lpips > 0:
        losses["lr_lpips"] = lpips(gen_out["feature_image"][..., :3], i_out["feature_image"][..., :3])
    if weights.id > 0 and id_fn is not None:
        losses["id"] = id_fn(gen256, i256)
    total = sum(getattr(weights, k) * val for k, val in losses.items())
    return total, losses


def oneshot_ireal_loss(
    inv_forward: Callable,
    d_apply: Optional[Callable],
    lpips: Callable,
    id_fn: Optional[Callable],
    weights: InversionLossWeights,
    real_img: Dict,  # {'image' [B,H,W,3(+mask)], 'uv'}
    real_c, real_v,
):
    """Ireal phase (unet_loss.py:148-186): invert a real image; when a mask
    channel is present the fake is composited onto the real background."""
    i_out = inv_forward(real_img, real_c, real_v, False)
    image = real_img["image"]
    # raw supervision happens at the generator's neural-render resolution
    # (128 at flagship, unet_loss.py:169; smaller in tiny test configs)
    nrr = i_out["feature_image"].shape[1]
    real_raw128 = resize_bilinear(image[..., :3], (nrr, nrr), antialias=True)

    losses = {}
    if weights.adv > 0 and d_apply is not None:
        logits = d_apply(
            {"image": i_out["image"], "image_raw": i_out["feature_image"][..., :3]},
            jnp.zeros_like(real_c),
        )
        losses["adv"] = jnp.mean(jax.nn.softplus(-logits))
    fake = i_out["image"]
    if image.shape[-1] > 3:
        mask = image[..., -1:]
        fake = fake * mask + image[..., :3] * (1.0 - mask)
    fake256 = _to256(fake)
    real256 = _to256(image[..., :3])
    if weights.l1 > 0:
        losses["l1"] = jnp.mean(jnp.abs(real256 - fake256))
    if weights.lpips > 0:
        losses["lpips"] = lpips(real256, fake256)
    if weights.raw_l1 > 0:
        losses["raw_l1"] = jnp.mean(jnp.abs(real_raw128 - i_out["feature_image"][..., :3]))
    if weights.lr_lpips > 0:
        losses["lr_lpips"] = lpips(real_raw128, i_out["feature_image"][..., :3])
    if weights.id > 0 and id_fn is not None:
        losses["id"] = id_fn(real256, fake)
    total = sum(getattr(weights, k) * val for k, val in losses.items())
    return total, losses


def oneshot_d_loss(
    d_apply: Callable,  # (img_dict, c) -> logits, closed over D params
    fake_img: Dict,  # {'image', 'image_raw'} from the inverter (stop-grad outside)
    real_img: Dict,  # {'image', 'image_raw'} generator sample or real frame
    c,
    weights: InversionLossWeights,
    do_r1: bool,
):
    """Dgen/Dreal(+_reg) phases (unet_loss.py:218-258): dual-D softplus GAN
    loss with R1 on both the image and the raw branch."""
    c0 = jnp.zeros_like(c)
    loss_dgen = jnp.mean(jax.nn.softplus(d_apply(fake_img, c0)))
    loss_dreal = jnp.mean(jax.nn.softplus(-d_apply(real_img, c0)))
    total = loss_dgen + loss_dreal
    aux = {"d_gen": loss_dgen, "d_real": loss_dreal}
    if do_r1:
        def score(image, image_raw):
            return jnp.sum(d_apply({"image": image, "image_raw": image_raw}, c0))

        g_img, g_raw = jax.grad(score, argnums=(0, 1))(real_img["image"], real_img["image_raw"])
        r1 = jnp.mean(
            jnp.sum(jnp.square(g_img), axis=(1, 2, 3))
            + jnp.sum(jnp.square(g_raw), axis=(1, 2, 3))
        )
        total = total + weights.adv_r1_gamma / 2 * r1
        aux["d_r1"] = r1
    return total, aux


# ---------------------------------------------------------------- few-shot stage


def fewshot_feature_losses(
    i_out: Dict,  # {'image','feature_image','triplane'} flat [B*T, ...] (grads flow)
    gen_out: Dict,  # same keys, the frozen generator's GT (stop-grad outside)
    lpips: Callable,
    weights: InversionLossWeights,
    d_apply: Optional[Callable] = None,
):
    """Igen feature-level terms (video_loss.py:390-425): image l1/lpips after
    256-resize + exact raw_l1 / tri / lr_lpips supervision (+ adv when a dual
    discriminator is attached, :390-396)."""
    losses = {}
    if weights.adv > 0 and d_apply is not None:
        logits = d_apply({"image": i_out["image"],
                          "image_raw": i_out["feature_image"][..., :3]})
        losses["adv"] = jnp.mean(jax.nn.softplus(-logits))
    gen256 = _to256(gen_out["image"][..., :3])
    i256 = _to256(i_out["image"])
    if weights.l1 > 0:
        losses["l1"] = jnp.mean(jnp.abs(gen256 - i256))
    if weights.lpips > 0:
        losses["lpips"] = lpips(gen256, i256)
    if weights.raw_l1 > 0:
        losses["raw_l1"] = jnp.mean(jnp.abs(gen_out["feature_image"] - i_out["feature_image"]))
    if weights.tri > 0:
        losses["tri"] = jnp.mean(jnp.abs(gen_out["triplane"] - i_out["triplane"]))
    if weights.lr_lpips > 0:
        losses["lr_lpips"] = lpips(gen_out["feature_image"][..., :3], i_out["feature_image"][..., :3])
    total = sum(getattr(weights, k) * val for k, val in losses.items())
    return total, losses


def fewshot_igen_loss(
    inv_run_seq: Callable,  # (frames, c, v, uv, ws|None) -> I_output dict (grads flow)
    gen_mapping: Callable,
    gen_synth_with_feats: Callable,  # (ws, tex, static, c, v) -> output dict
    gen_tex_feats: Callable,
    gen_static_feats: Callable,
    lpips: Callable,
    weights: InversionLossWeights,
    z, vid_c, vid_v, vid_uv,
):
    """Igen (video_loss.py:373-425): synthetic GT clip + exact feature supervision."""
    sg = jax.lax.stop_gradient
    B, T = vid_c.shape[:2]
    ws = sg(gen_mapping(z, vid_c[:, 0], truncation_psi=0.6))
    gt_tex = sg(gen_tex_feats(ws))
    gt_static = sg(gen_static_feats(ws))
    gen_out = sg(gen_synth_with_feats(ws, gt_tex, gt_static, vid_c, vid_v))
    synth_frames = gen_out["image"].reshape(B, T, *gen_out["image"].shape[1:])

    i_out = inv_run_seq(synth_frames, vid_c, vid_v, vid_uv, None)
    return fewshot_feature_losses(i_out, gen_out, lpips, weights)


def fewshot_ireal_multiT_loss(
    inv_run_multiT: Callable,  # (frames, c, v, uv, fake_idx, ws|None) -> {'image': [B, Tc, ...]}
    lpips: Callable,
    weights: InversionLossWeights,
    vid_frames,  # [B, T, H, W, 3(+mask)]
    vid_c, vid_v, vid_uv,
    fake_idx,  # [Tc] frame indices rendered for the loss (video_loss.py:429)
    ws=None,
):
    """Ireal under the multi-T curriculum (video_loss.py:427-445 multiT branch):
    the rollout sees all T frames (no-grad prefix chunks), the loss is computed
    on the `fake_idx` subset — index 0 first (full-image loss), the rest
    head-masked when a mask channel is present."""
    out = inv_run_multiT(vid_frames[..., :3], vid_c, vid_v, vid_uv, fake_idx, ws)
    real = jnp.take(vid_frames, jnp.asarray(fake_idx), axis=1)  # [B, Tc, H, W, 3+m]
    return fewshot_image_losses(out["image"], real, lpips, weights)


def fewshot_image_losses(
    fake,  # [B, Tc, H, W, 3] rendered selection (grads flow)
    real,  # [B, Tc, H, W, 3(+mask)] matching real frames
    lpips: Callable,
    weights: InversionLossWeights,
):
    """Ireal image-level terms on a rendered frame selection
    (video_loss.py:432-445): selection index 0 is the full-image loss, later
    frames are composited onto the real background via the head mask."""
    B, Tc = fake.shape[:2]
    if fake.shape[2] != real.shape[2]:
        fake = resize_bilinear(
            fake.reshape(B * Tc, *fake.shape[2:]), (real.shape[2], real.shape[3])
        ).reshape(B, Tc, real.shape[2], real.shape[3], -1)
    if real.shape[-1] > 3 and Tc > 1:
        mask = real[:, 1:, ..., -1:]
        later = fake[:, 1:] * mask + real[:, 1:, ..., :3] * (1.0 - mask)
        fake = jnp.concatenate([fake[:, :1], later], axis=1)

    real256 = _to256(real[..., :3].reshape(B * Tc, *real.shape[2:4], 3))
    fake256 = _to256(fake.reshape(B * Tc, *fake.shape[2:]))
    losses = {}
    if weights.l1 > 0:
        losses["l1"] = jnp.mean(jnp.abs(real256 - fake256))
    if weights.lpips > 0:
        losses["lpips"] = lpips(real256, fake256)
    total = sum(getattr(weights, k) * val for k, val in losses.items())
    return total, losses


def fewshot_image_loss_frame(
    fake,  # [B, H, W, 3] one rendered frame (grads flow)
    real,  # [B, H, W, 3(+mask)] the matching real frame
    lpips: Callable,
    weights: InversionLossWeights,
    masked: bool,
):
    """Per-frame decomposition of `fewshot_image_losses` (video_loss.py:432-445):
    every term there is a mean over equally-sized frames, so the multi-frame
    loss equals the mean of these per-frame losses. `masked=True` applies the
    head-mask composite used for selection indices >= 1; the caller passes
    False for the first selected frame (full-image loss). Used by the
    per-frame gradient pipeline (train/loop_inversion.py) whose compiled
    programs must hold only ONE render forward+backward."""
    if fake.shape[1] != real.shape[1]:
        fake = resize_bilinear(fake, (real.shape[1], real.shape[2]))
    if masked and real.shape[-1] > 3:
        mask = real[..., -1:]
        fake = fake * mask + real[..., :3] * (1.0 - mask)
    real256 = _to256(real[..., :3])
    fake256 = _to256(fake)
    losses = {}
    if weights.l1 > 0:
        losses["l1"] = jnp.mean(jnp.abs(real256 - fake256))
    if weights.lpips > 0:
        losses["lpips"] = lpips(real256, fake256)
    total = sum(getattr(weights, k) * val for k, val in losses.items())
    return total, losses


def fewshot_ireal_loss(
    inv_run_seq: Callable,
    lpips: Callable,
    weights: InversionLossWeights,
    vid_frames,  # [B, T, H, W, 3(+mask)]
    vid_c, vid_v, vid_uv,
    ws=None,
):
    """Ireal (video_loss.py:427-466): real clips; first frame full-image loss,
    later frames masked to the head region when a mask channel is present."""
    B, T = vid_c.shape[:2]
    i_out = inv_run_seq(vid_frames[..., :3], vid_c, vid_v, vid_uv, ws)
    fake = i_out["image"].reshape(B, T, *i_out["image"].shape[1:])
    if fake.shape[2] != vid_frames.shape[2]:
        fake = resize_bilinear(
            fake.reshape(B * T, *fake.shape[2:]), (vid_frames.shape[2], vid_frames.shape[3])
        ).reshape(B, T, vid_frames.shape[2], vid_frames.shape[3], -1)

    if vid_frames.shape[-1] > 3 and T > 1:
        mask = vid_frames[:, 1:, ..., -1:]
        later = fake[:, 1:] * mask + vid_frames[:, 1:, ..., :3] * (1.0 - mask)
        fake = jnp.concatenate([fake[:, :1], later], axis=1)

    real256 = _to256(vid_frames[..., :3].reshape(B * T, *vid_frames.shape[2:4], 3))
    fake256 = _to256(fake.reshape(B * T, *fake.shape[2:]))
    losses = {}
    if weights.l1 > 0:
        losses["l1"] = jnp.mean(jnp.abs(real256 - fake256))
    if weights.lpips > 0:
        losses["lpips"] = lpips(real256, fake256)
    total = sum(getattr(weights, k) * val for k, val in losses.items())
    return total, losses
