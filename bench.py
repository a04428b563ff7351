"""Benchmark: 512² avatar reenactment throughput (frames/sec/chip).

The north-star loop (SURVEY.md §3.3 / BASELINE.md): the avatar is compiled once
into (ws, texture_feats, static_feats); the per-frame animation touches only
`synthesis_withTexture` — UV rasterize + face refinement + volume render + SR.
Baseline target: ≥30 fps/chip on v5e (BASELINE.json north_star).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
_cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
os.makedirs(_cache_dir, exist_ok=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache_dir)
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_FPS = 30.0


def main():
    import jax
    import jax.numpy as jnp

    from invertavatar_tpu.flagship import example_inputs, flagship_generator, init_flagship

    G = flagship_generator()
    variables = init_flagship(G)
    z, c, uvc = example_inputs(1)

    # one-time avatar "compilation": ws + texture/static feature lists
    def precompute(variables, z, c):
        def run(m, z, c):
            ws = m.mapping(z, c)
            tex = m.texture_backbone.synthesis(ws, return_list=True, noise_mode="const")
            static = m.backbone.synthesis(ws, return_list=True, noise_mode="const")
            return ws, tex, static

        return G.apply(variables, z, c, method=run)

    ws, tex, static = jax.jit(precompute)(variables, z, c)

    def frame(variables, ws, tex, static, c, uvcoords_image):
        def run(m, ws, tex, static, c, v):
            return m.synthesis_withTexture(
                ws, tex, c, v, static_feats=static, noise_mode="const", evaluation=True
            )["image"]

        return G.apply(variables, ws, tex, static, c, {"uvcoords_image": uvcoords_image}, method=run)

    frame_jit = jax.jit(frame)

    # warmup / compile
    out = frame_jit(variables, ws, tex, static, c, uvc)
    jax.block_until_ready(out)

    n_frames = int(os.environ.get("BENCH_FRAMES", "30"))
    t0 = time.perf_counter()
    for i in range(n_frames):
        out = frame_jit(variables, ws, tex, static, c, uvc)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    fps = n_frames / dt

    print(
        json.dumps(
            {
                "metric": "reenact_512_fps_per_chip",
                "value": round(fps, 3),
                "unit": "frames/sec",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
