"""Are the fast raster variants' dropped faces VISIBLE? (round 4, follows
docs/raster_r4.json)

raster_r4 found every tile-32 capacity below the fat oracle drops at least
one candidate face across 4 driven frames — including the r3 shipped default
(anchor fpt1024). This measures whether those drops reach the actual online
driving signal: `make_driven_rendering`'s 256² uvcoords_image (u, v, mask) —
the only raster-derived tensor `synthesis_withTexture` ever sees (reference
FaceVerse/renderer.py:45-84).

Per variant, over N driven expressions vs the fpt4096 oracle:
  * n_diff_px      — pixels where any uvcoords channel differs
  * max_abs_duv    — worst |Δuv| at differing pixels (uv in [-1, 1])
  * n_mask_flips   — pixels whose binarized mask channel flips
  * ms             — full make_driven_rendering wall time (coeffs → uvcoords)

Writes docs/raster_visibility.json. A variant with 0 diff pixels is exactly
shippable; small counts with tiny |Δuv| defer to the MS-SSIM fidelity gate.

Usage: python scripts/raster_visibility.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_repo, ".jax_cache"))

import numpy as np
import jax
import jax.numpy as jnp

from bench_extra import synthetic_head_assets
from invertavatar_tpu.faceverse.manager import FaceverseManager


def _fence(x):
    return np.asarray(jnp.ravel(x)[:1])


VARIANTS = {
    "anchor_fpt1024_shipped_r3": dict(faces_per_tile=1024, raster_kwargs={}),
    "anchor_fpt512_exact": dict(
        faces_per_tile=512, raster_kwargs=dict(exact_cover=True)
    ),
    "t16_fpt512_exact": dict(
        faces_per_tile=512,
        raster_kwargs=dict(tile=16, chunk=128, exact_cover=True),
    ),
}
ORACLE = dict(faces_per_tile=4096, raster_kwargs={})


def build_manager(assets, rng, **kw):
    mgr = FaceverseManager(
        assets,
        fv2fl=np.eye(4, dtype=np.float32),
        face_mask=np.ones(assets.uv_per_ver.shape[0], np.float32),
        **kw,
    )
    return mgr


def main():
    rng = np.random.RandomState(0)
    assets = synthetic_head_assets(rng)
    n_coeff = assets.id_dims + assets.exp_dims + assets.tex_dims + 38
    id_coeff = (rng.randn(n_coeff) * 0.1).astype(np.float32)
    n_frames = int(os.environ.get("VIS_FRAMES", "8"))
    drives = [(rng.randn(n_coeff) * 0.1).astype(np.float32) for _ in range(n_frames)]

    out = {
        "device": jax.devices()[0].device_kind,
        "F": int(np.asarray(assets.tri).shape[0]),
        "n_frames": n_frames,
        "variants": {},
    }

    mgr_o = build_manager(assets, rng, **ORACLE)
    mgr_o.set_identity(id_coeff)
    oracle_frames = [np.asarray(mgr_o.make_driven_rendering(d)) for d in drives]
    print("oracle done", flush=True)
    del mgr_o

    iters = int(os.environ.get("PROF_ITERS", "30"))
    for name, kw in VARIANTS.items():
        mgr = build_manager(assets, rng, **kw)
        mgr.set_identity(id_coeff)
        n_diff = 0
        max_duv = 0.0
        n_flips = 0
        for d, ref in zip(drives, oracle_frames):
            got = np.asarray(mgr.make_driven_rendering(d))
            diff = np.any(got != ref, axis=-1)
            n_diff += int(diff.sum())
            max_duv = max(max_duv, float(np.abs(got[..., :2] - ref[..., :2]).max()))
            n_flips += int((got[..., 2] != ref[..., 2]).sum())
        # timing: full driven rendering (coeff split + blendshapes + raster +
        # attribute interpolation), the real per-frame online cost
        r = mgr.make_driven_rendering(drives[0])
        _fence(r)
        t0 = time.perf_counter()
        for i in range(iters):
            r = mgr.make_driven_rendering(drives[i % n_frames])
        _fence(r)
        ms = (time.perf_counter() - t0) / iters * 1000
        rec = {
            "ms": round(ms, 3),
            "n_diff_px": n_diff,
            "diff_px_per_frame": round(n_diff / n_frames, 2),
            "max_abs_duv": round(max_duv, 6),
            "n_mask_flips": n_flips,
        }
        out["variants"][name] = rec
        print(name, rec, flush=True)
        del mgr

    path = os.path.join(_repo, "docs", "raster_visibility.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
