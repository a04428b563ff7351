"""Stage-level timing of the reenactment frame on the real chip."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from invertavatar_tpu.flagship import example_inputs, flagship_generator, init_flagship


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:32s} {dt*1000:8.2f} ms")
    return out


def main():
    G = flagship_generator()
    variables = init_flagship(G)
    z, c, uvc = example_inputs(1)

    # dispatch floor
    f0 = jax.jit(lambda x: x + 1)
    timeit("dispatch_floor(add)", f0, jnp.zeros((8, 128)))

    def mapping(v, z, c):
        return G.apply(v, z, c, method=lambda m, z, c: m.mapping(z, c))

    ws = timeit("mapping", jax.jit(mapping), variables, z, c)

    def tex(v, ws):
        return G.apply(v, ws, method=lambda m, ws: m.texture_backbone.synthesis(ws, return_list=True, noise_mode="const"))

    tex_feats = timeit("texture_backbone(list)", jax.jit(tex), variables, ws)

    def static(v, ws):
        return G.apply(v, ws, method=lambda m, ws: m.backbone.synthesis(ws, return_list=True, noise_mode="const"))

    static_feats = timeit("static_backbone(list)", jax.jit(static), variables, ws)

    def raster(v, tex_feats, static_feats, uvc):
        def run(m, tex_feats, static_feats, uvc):
            return m.rasterize(tex_feats, uvc, m._static_feats_for_raster(static_feats))
        return G.apply(v, tex_feats, static_feats, uvc, method=run)

    rendering_images, full_alpha, _ = timeit("rasterize(uv warp+mouth)", jax.jit(raster), variables, tex_feats, static_feats, uvc)

    def face(v, ws, conds):
        return G.apply(v, ws, conds, method=lambda m, ws, conds: m.face_backbone.synthesis(ws, cond_list=conds, noise_mode="const"))

    stitch = timeit("face_backbone(cond)", jax.jit(face), variables, ws, rendering_images)

    def render_core(v, ws, c, stitch, alpha, static_feats):
        def run(m, ws, c, stitch, alpha, static_feats):
            from invertavatar_tpu.models.triplane import _to_planes
            static_plane = _to_planes(static_feats[-1])
            return m._render_core(ws, c, stitch, alpha, static_plane, True, "const", jax.random.PRNGKey(0))["image"]
        return G.apply(v, ws, c, stitch, alpha, static_feats, method=run)

    timeit("volume_render+SR", jax.jit(render_core), variables, ws, c, stitch, full_alpha, static_feats)

    # full frame
    def frame(v, ws, tex_feats, static_feats, c, uvc):
        def run(m, ws, tex, static, c, v_):
            return m.synthesis_withTexture(ws, tex, c, v_, static_feats=static, noise_mode="const", evaluation=True)["image"]
        return G.apply(v, ws, tex_feats, static_feats, c, {"uvcoords_image": uvc}, method=run)

    timeit("full_frame(withTexture)", jax.jit(frame), variables, ws, tex_feats, static_feats, c, uvc)


if __name__ == "__main__":
    main()
