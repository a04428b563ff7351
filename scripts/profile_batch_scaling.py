"""Explain the batch-10 ceiling (VERDICT r3 weak #1 / next #3).

Round 3 measured batch-10 aggregate at only 1.12x the single-stream rate and
left the serializing resource unexplained. This profiles the jitted
animation-loop frame (bench.py program) at B ∈ {1, 2, 5, 10} plus its two
dominant sub-stages at B ∈ {1, 10}, and writes docs/batch_scaling.json.

Interpretation key: if frame time grows ~linearly in B, the per-frame work is
already compute-bound at B=1 (batching cannot amortize anything but the XLA
glue); if it grows sub-linearly, idle resources existed and the remaining gap
is dispatch overhead. The fused render kernel's grid is (tiles × planes ×
strata) per batch element — batch is an outer loop, so MXU-bound kernel time
is expected to scale with B.

Usage: python scripts/profile_batch_scaling.py
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

from invertavatar_tpu.flagship import example_inputs, flagship_generator, init_flagship


def _fence(x):
    return np.asarray(jnp.ravel(x)[:1])


def main():
    G = flagship_generator()
    variables = init_flagship(G)
    out = {"device": jax.devices()[0].device_kind, "frame_ms": {}, "stages_ms": {}}

    def precompute(v, z, c):
        def run(m, z, c):
            ws = m.mapping(z, c)
            tex = m.texture_backbone.synthesis(ws, return_list=True, noise_mode="const")
            static = m.backbone.synthesis(ws, return_list=True, noise_mode="const")
            cache = m.precompute_raster_static(static)
            tex_cat = m.precompute_texture_concat(tex)
            return ws, tex, static, cache, tex_cat

        return G.apply(v, z, c, method=run)

    def frame(v, ws, tex, static, cache, tex_cat, c, uvc):
        def run(m, ws, tex, static, cache, tex_cat, c, vv):
            return m.synthesis_withTexture(
                ws, tex, c, vv, static_feats=static, noise_mode="const", evaluation=True,
                raster_static_cache=cache, texture_concat_cache=tex_cat,
            )["image"]

        return G.apply(v, ws, tex, static, cache, tex_cat, c,
                       {"uvcoords_image": uvc}, method=run)

    frame_jit = jax.jit(frame)
    pre_jit = jax.jit(precompute)

    avatars = {}
    for B in (1, 2, 5, 10):
        z, c, uvc = example_inputs(B)
        avatars[B] = (pre_jit(variables, z, c), c, uvc)

    iters = int(os.environ.get("PROF_ITERS", "20"))
    for B, ((ws, tex, static, cache, tex_cat), c, uvc) in avatars.items():
        img = frame_jit(variables, ws, tex, static, cache, tex_cat, c, uvc)
        _fence(img)
        t0 = time.perf_counter()
        for _ in range(iters):
            img = frame_jit(variables, ws, tex, static, cache, tex_cat, c, uvc)
        _fence(img)
        ms = (time.perf_counter() - t0) / iters * 1000
        out["frame_ms"][f"B{B}"] = round(ms, 2)
        print(f"B={B}: {ms:.2f} ms/frame-batch, {B / ms * 1000:.2f} agg fps", flush=True)

    # ---- sub-stages at B=1 vs B=10: rasterize+face vs the volume render+SR
    def to_raw(v, ws, tex, static, cache, tex_cat, c, uvc):
        """Everything BEFORE the neural render: UV raster + face backbone."""
        def run(m, ws, tex, static, cache, tex_cat, c, vv):
            rendering_images, full_alpha, _ = m.rasterize(
                tex, vv["uvcoords_image"], m._static_feats_for_raster(static),
                static_small=cache, texture_concat_cache=tex_cat,
            )
            stitch = m.face_backbone.synthesis(ws, cond_list=rendering_images,
                                               noise_mode="const")
            return stitch, full_alpha

        return G.apply(v, ws, tex, static, cache, tex_cat, c,
                       {"uvcoords_image": uvc}, method=run)

    stage_jit = jax.jit(to_raw)
    for B in (1, 10):
        (ws, tex, static, cache, tex_cat), c, uvc = avatars[B]
        o = stage_jit(variables, ws, tex, static, cache, tex_cat, c, uvc)
        _fence(o[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            o = stage_jit(variables, ws, tex, static, cache, tex_cat, c, uvc)
        _fence(o[0])
        ms = (time.perf_counter() - t0) / iters * 1000
        out["stages_ms"][f"raster_face_B{B}"] = round(ms, 2)
        print(f"raster+face B={B}: {ms:.2f} ms", flush=True)

    # derived: linearity + implied render/SR share
    b1, b10 = out["frame_ms"]["B1"], out["frame_ms"]["B10"]
    out["batch10_speedup_aggregate"] = round(10 * b1 / b10, 3)
    out["batch10_time_ratio"] = round(b10 / b1, 3)
    # kernel formulation flops (PERF_NOTES floor analysis): ~480 GFLOP/pass
    # x 2 passes; achieved formulation-FLOP rate vs bf16 peak
    formulation_gflop = 2 * 480.0
    out["achieved_formulation_tflops_B1"] = round(formulation_gflop / b1, 2)
    out["achieved_formulation_tflops_B10"] = round(10 * formulation_gflop / b10, 2)
    out["peak_bf16_tflops"] = 197.0

    path = os.path.join(_repo, "docs", "batch_scaling.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
