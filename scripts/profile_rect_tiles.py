"""Measure rectangular kernel-tile candidates on the real chip.

The fused render kernels' per-step cost is dominated by the window LANE
width (win_c*C): the tent y-contract streams [P, win_r] x [win_r, win_c*C]
(K < one MXU pass, so win_r is nearly free) and the ohx tent build is pure
VPU lane work. Tall-thin pixel tiles shrink win_c at the price of win_r:
(64, 4) needs ~16 texel columns vs 36 for 16x16 at the flagship geometry.

For each candidate this measures the full bench.py frame (512^2 reenact,
cached avatar) and reports fps + max|d| vs the square-tile output on the
SAME inputs (pooled-CDF regions follow the tile shape, so outputs differ
within the pooled error class; flagship-geometry fidelity is gated by
scripts/fidelity_flagship.py before any default flips).

Usage: python scripts/profile_rect_tiles.py   (writes docs/rect_tiles.json)
"""

import json
import os
import sys
import time

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _repo)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_repo, ".jax_cache"))

import numpy as np
import jax

from invertavatar_tpu.flagship import example_inputs, flagship_generator, init_flagship

# per-256-point MXU model (lane_tiles × (P + win_r) / (P/256)):
#   16x16: 2736   32x8: 2016   64x8: 1640   64x4: 1600   128x4: 1504
# bigger P also halves/quarters the per-step fixed overhead (DMA issue,
# march bookkeeping); P=128 variants measured out (overhead dominates).
CANDIDATES = [None, (64, 4), (64, 8), (32, 8), (128, 4), (128, 8), (256, 4)]
N_FRAMES = int(os.environ.get("BENCH_FRAMES", "30"))


def build_frame(G):
    def precompute(variables, z, c):
        def run(m, z, c):
            ws = m.mapping(z, c)
            tex = m.texture_backbone.synthesis(ws, return_list=True, noise_mode="const")
            static = m.backbone.synthesis(ws, return_list=True, noise_mode="const")
            cache = m.precompute_raster_static(static)
            return ws, tex, static, cache

        return G.apply(variables, z, c, method=run)

    def frame(variables, ws, tex, static, cache, c, uvcoords_image):
        def run(m, ws, tex, static, cache, c, v):
            return m.synthesis_withTexture(
                ws, tex, c, v, static_feats=static, noise_mode="const", evaluation=True,
                raster_static_cache=cache,
            )["image"]

        return G.apply(
            variables, ws, tex, static, cache, c, {"uvcoords_image": uvcoords_image},
            method=run,
        )

    return jax.jit(precompute), jax.jit(frame)


def main():
    G0 = flagship_generator()
    variables = init_flagship(G0)
    z, c, uvc = example_inputs(1)

    results = {}
    ref_img = None
    for ts in CANDIDATES:
        rk = dict(G0.rendering_kwargs)
        if ts is not None:
            rk["tile_shape"] = ts
        G = G0.clone(rendering_kwargs=rk)
        pre_jit, frame_jit = build_frame(G)
        ws, tex, static, cache = pre_jit(variables, z, c)

        t_c0 = time.perf_counter()
        out = frame_jit(variables, ws, tex, static, cache, c, uvc)
        np.asarray(out[0, 0, 0, :1])
        compile_s = time.perf_counter() - t_c0

        t0 = time.perf_counter()
        for _ in range(N_FRAMES):
            out = frame_jit(variables, ws, tex, static, cache, c, uvc)
        np.asarray(out[0, 0, 0, :1])
        fps = N_FRAMES / (time.perf_counter() - t0)

        img = np.asarray(out)
        key = "square" if ts is None else f"{ts[0]}x{ts[1]}"
        if ref_img is None:
            ref_img = img
            maxd = 0.0
        else:
            maxd = float(np.abs(img - ref_img).max())
        results[key] = {
            "fps": round(fps, 2),
            "compile_s": round(compile_s, 1),
            "max_abs_vs_square": round(maxd, 5),
        }
        print(json.dumps({key: results[key]}), flush=True)

    out_path = os.path.join(_repo, "docs", "rect_tiles.json")
    with open(out_path, "w") as f:
        json.dump({"n_frames": N_FRAMES, "results": results}, f, indent=2)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
