"""Round-2 breakdown: rasterize internals + renderer coarse/fine split.

Run on the real chip. Identifies where the remaining ~61 ms/frame goes after
the fused-kernel work (docs/PERF_NOTES.md round-2 table).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


_fetch = None


def _fence(out):
    # scalar readback that actually fences through the axon relay WITHOUT
    # transferring the tensor (np.asarray(full) costs ~1 ms/MB of relay RTT)
    global _fetch
    if _fetch is None:
        _fetch = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))
    float(_fetch(jax.tree_util.tree_leaves(out)[0].ravel()[:8]))


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    _fence(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _fence(out)
    print(f"{name:48s} {(time.perf_counter()-t0)/iters*1000:8.2f} ms", flush=True)
    return out


def main():
    from invertavatar_tpu.flagship import (
        example_inputs,
        flagship_generator,
        init_flagship,
    )
    from invertavatar_tpu.render.mouth import fill_mouth

    G = flagship_generator()
    variables = init_flagship(G)
    z, c, uvc = example_inputs(1)

    def precompute(variables, z, c):
        def run(m, z, c):
            ws = m.mapping(z, c)
            tex = m.texture_backbone.synthesis(ws, return_list=True, noise_mode="const")
            static = m.backbone.synthesis(ws, return_list=True, noise_mode="const")
            return ws, tex, static

        return G.apply(variables, z, c, method=run)

    ws, tex, static = jax.jit(precompute)(variables, z, c)
    print("tex dtypes/shapes:", [(str(t.dtype), t.shape) for t in tex], flush=True)

    # --- mouth fill alone
    alpha = uvc[..., 2:3]
    timeit("fill_mouth", jax.jit(fill_mouth), alpha)

    # --- full rasterize
    def raster(variables, tex, static, uvc):
        def run(m, tex, static, uvc):
            return m.rasterize(tex, uvc, m._static_feats_for_raster(static))

        return G.apply(variables, tex, static, uvc, method=run)

    timeit("rasterize(all levels+mouth)", jax.jit(raster), variables, tex, static, uvc)

    # --- per-level warp+resize cost (outside the module: same ops)
    from invertavatar_tpu.ops.grid_sample import grid_sample
    from invertavatar_tpu.ops.resize import resize_bilinear

    grid = uvc[..., :2]
    for i, t in enumerate(tex):
        res = t.shape[1]

        def lvl(t, grid):
            warped = grid_sample(t.astype(jnp.float32), grid)
            return resize_bilinear(warped, (res, res), antialias=True)

        timeit(f"  level{i} warp+resize {t.shape[1]}px c{t.shape[-1]}", jax.jit(lvl), t, grid)

    # --- renderer: coarse-only vs full, via rendering_kwargs override
    def frame_with(rk_over):
        G2 = flagship_generator()
        G2.rendering_kwargs.update(rk_over)

        def frame(variables, ws, tex, static, c, uvcoords_image):
            def run(m, ws, tex, static, c, v):
                return m.synthesis_withTexture(
                    ws, tex, c, v, static_feats=static, noise_mode="const", evaluation=True
                )["image"]

            return G2.apply(
                variables, ws, tex, static, c, {"uvcoords_image": uvcoords_image}, method=run
            )

        return jax.jit(frame)

    timeit("frame full", frame_with({}), variables, ws, tex, static, c, uvc)
    timeit(
        "frame coarse-only (no importance)",
        frame_with({"depth_resolution_importance": 0}),
        variables, ws, tex, static, c, uvc,
    )

    # --- SR alone
    feat = jnp.zeros((1, 128, 128, 32), jnp.float32)

    def sr(variables, feat, ws):
        def run(m, feat, ws):
            return m.superresolution(feat[..., :3], feat, ws, noise_mode="none")

        return G.apply(variables, feat, ws, method=run)

    timeit("superresolution", jax.jit(sr), variables, feat, ws)


if __name__ == "__main__":
    main()
