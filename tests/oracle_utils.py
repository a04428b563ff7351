"""Shared plumbing for torch-reference oracles (VERDICT r2 #9).

Every parity harness that imports live reference modules needs the same two
pieces of scaffolding; keeping them here stops the copies from drifting:

1. `stub_reference_modules()` — the reference transitively imports
   torchvision (Deep3DFaceRecon utils) and turtle (a stray debug import);
   neither exists/works headless in this image. Minimal module stubs.

2. `pin_eval_jitter()` — the reference's coarse sampler jitters strata even
   in evaluation (renderer.py:395-407: `depths += rand_like(d) * delta`);
   the TPU side's deterministic eval pins the stratum offset to 0.5
   (`det_stratified`). Oracles pin `torch.rand_like` to 0.5 to match — and
   this helper FIRST asserts the reference still has that jitter semantics
   (a uniform additive offset scaled by depth_delta), so a silent upstream
   change breaks the test instead of skewing every parity number.
"""

import sys
import types


def stub_reference_modules():
    """Install import stubs needed by /root/reference modules; idempotent."""
    for mod in ("torchvision", "torchvision.transforms", "turtle"):
        if mod not in sys.modules:
            stub = types.ModuleType(mod)
            if mod == "turtle":
                stub.update = None
            if mod == "torchvision":
                stub.transforms = types.ModuleType("torchvision.transforms")
            sys.modules[mod] = stub


def pin_eval_jitter():
    """Pin torch.rand_like to mid-stratum 0.5 for det-eval parity.

    Returns the original function (restore with `torch.rand_like = orig`).
    Asserts the reference's stratified sampler still applies the additive
    `rand_like * depth_delta` jitter this pin is modelling.
    """
    import inspect

    import torch

    from training_avatar_texture.volumetric_rendering.renderer import ImportanceRenderer

    src = inspect.getsource(ImportanceRenderer.sample_stratified)
    assert "torch.rand_like(depths_coarse) * depth_delta" in src, (
        "reference sample_stratified no longer uses additive rand_like jitter; "
        "the det_stratified pin (and every parity harness using it) must be revisited"
    )
    orig = torch.rand_like
    torch.rand_like = lambda t: torch.full_like(t, 0.5)
    return orig
