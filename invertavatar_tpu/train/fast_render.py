"""Sampling/kernel overrides for the inversion stages' training renders.

Why this is sound: in ALL THREE inversion stages the generator is frozen
(reference encoder_inversion trains encoders/U-Net decoders only —
training_loop_video.py:284-303, w_loss.py; the optimizer masks here mirror
that). Nothing learns the radiance field, so the stochastic ray sampling the
reference inherits from GAN training (renderer.py:400-415) carries no
anti-aliasing/bias role — it only decorrelates the target and student
renders inside reconstruction losses. Rendering both sides with
DETERMINISTIC mid-stratum offsets and tile-POOLED importance depths
(the shipped eval formulation, fidelity-gated at 54 dB PSNR exact /
MS-SSIM >= 0.9968 bf16 vs the torch oracle — docs/fidelity_flagship.json)
therefore changes the loss by at most the sampling-noise floor it removes,
while making every render footprint-bounded:

  * no-grad renders (Igen targets video_loss.py:377-388, the no-grad chunk
    prefix video_loss.py:297-325, e4e's Igen target w_loss.py:99-110) can ride
    the Pallas fast paths (exact windowed kernel, or the fused bf16
    merged-march pipeline) — these run ~2 orders of magnitude faster than the
    training-formulation render on TPU (docs/PERF_NOTES.md round 4);
  * grad-carrying renders become structured in BOTH passes (coarse strata and
    pooled fine depths are tile-shared), so they route through the
    differentiable windowed sampler instead of the scatter-add-backward
    patch gather.

This is a deliberate, documented TPU-first deviation from the reference's
per-ray stochastic sampling; set the stage's `fast_no_grad`/`fast_grad`
options to "off" for literal reference semantics. GAN training (where G DOES
learn the field) keeps the reference's stochastic sampling and is untouched.
"""

from __future__ import annotations

from typing import Dict, Optional

# no-grad renders, exact arithmetic: fp32/HIGHEST windowed Pallas sampling +
# XLA decoder; deterministic + pooled sampling (structured both passes)
FAST_NOGRAD_EXACT: Dict = {
    "pallas_coarse": True,
    "pallas_exact": True,
    "pooled_importance": True,
    "det_stratified": True,
}

# no-grad renders, fastest: bf16 fused sampling+decoder kernels with the
# in-VMEM merged march (the bench.py eval pipeline; payload error ~1e-2 on
# features, MS-SSIM-gated)
FAST_NOGRAD_FUSED: Dict = {
    "pallas_coarse": True,
    "pooled_importance": True,
    "det_stratified": True,
}

# grad-carrying renders: deterministic + pooled sampling with the
# DIFFERENTIABLE structured samplers (XLA windowed formulation; the Pallas
# custom-VJP sampler rides the same gate once `pallas_grad` is on)
FAST_GRAD_STRUCTURED: Dict = {
    "windowed_coarse": True,
    "pooled_importance": True,
    "det_stratified": True,
}

# grad-carrying renders, Pallas forward: the exact fp32 windowed kernel with
# a linear-transpose backward (ops/plane_sample.sample_planes_windowed_cvjp —
# window-block scatter-add instead of per-tap scatters). Sound only where ray
# coordinates are parameter-free (true in all three inversion stages: cameras
# are data, importance depths are stop_gradient).
FAST_GRAD_PALLAS: Dict = dict(FAST_GRAD_STRUCTURED, pallas_grad=True)

_MODES: Dict[str, Optional[Dict]] = {
    "off": None,
    "exact": FAST_NOGRAD_EXACT,
    "fused": FAST_NOGRAD_FUSED,
}

_GRAD_MODES: Dict[str, Optional[Dict]] = {
    "off": None,
    "structured": FAST_GRAD_STRUCTURED,
    "pallas": FAST_GRAD_PALLAS,
}


def _resolve(ov: Optional[Dict], interpret: bool) -> Optional[Dict]:
    if ov is None:
        return None
    ov = dict(ov)
    if interpret:
        ov["pallas_interpret"] = True
    return ov


def nograd_overrides(mode: str, interpret: bool = False) -> Optional[Dict]:
    """Resolve a `fast_no_grad` mode name to renderer option overrides.

    `interpret=True` additionally routes the Pallas kernels through TPU
    interpret mode so CPU test runs exercise the same code path.
    """
    if mode not in _MODES:
        raise ValueError(f"fast_no_grad mode {mode!r} not in {sorted(_MODES)}")
    return _resolve(_MODES[mode], interpret)


def grad_overrides(mode: str, interpret: bool = False) -> Optional[Dict]:
    """Resolve a `fast_grad` mode name (off | structured | pallas) to renderer
    option overrides for GRAD-CARRYING training renders."""
    if mode not in _GRAD_MODES:
        raise ValueError(f"fast_grad mode {mode!r} not in {sorted(_GRAD_MODES)}")
    return _resolve(_GRAD_MODES[mode], interpret)
