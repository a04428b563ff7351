"""Anatomy of the few-shot absorb (bench_extra.py fewshot config).

VERDICT r4 weak-3 / next-6: fewshot_absorb_8frames_sec = 0.576 s vs the
0.32 s real-time-ingestion budget. This script times each absorb
sub-program separately (warm, fenced via scalar readback) so the lever is
chosen from data, and records variant timings. Writes docs/absorb_anatomy.json.
"""

import json
import os
import sys
import time

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_repo, ".jax_cache"))
sys.path.insert(0, _repo)

import jax
import jax.numpy as jnp
import numpy as np

from bench_extra import _inversion_net, _fence


def timed(fn, *args, reps=10, **kw):
    out = fn(*args, **kw)
    _fence(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
    _fence(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / reps, out


def main():
    net, variables, (img, c, uvc, uv) = _inversion_net("gru")
    T = 4
    images = jnp.repeat(img, T, axis=0)
    uvs = jnp.repeat(uv, T, axis=0)
    cs = jnp.repeat(c, T, axis=0)
    uvcs = jnp.repeat(uvc, T, axis=0)

    rec = {"device": jax.devices()[0].device_kind}

    @jax.jit
    def encode_first(variables, img):
        return net.apply(variables, img, method=lambda m, x: m.encode(x))

    @jax.jit
    def init_feats(variables, ws):
        def run(m, ws):
            tex = m.generator.texture_backbone.synthesis(ws, return_list=True, noise_mode="const")
            static = m.generator.backbone.synthesis(ws, return_list=True, noise_mode="const")
            return tex, static

        return net.apply(variables, ws, method=run)

    @jax.jit
    def e4e_render(variables, ws, tex, static, cs, uvcs):
        def run(m, ws, tex, static, cs, uvcs):
            vid_ws = jnp.repeat(ws, T, axis=0)
            rep = lambda fs: [jnp.repeat(f, T, axis=0) for f in fs]
            return m.generator.synthesis_withTexture(
                vid_ws, rep(tex), cs, {"uvcoords_image": uvcs},
                static_feats=rep(static), noise_mode="const", evaluation=True,
            )["image"]

        return net.apply(variables, ws, tex, static, cs, uvcs, method=run)

    @jax.jit
    def unets(variables, uv_input, tri_input, r_tex, r_tri):
        def run(m, ui, ti, rt, rr):
            off, r1 = m.unet_encoder.texture_unet(ui[None], rt)
            sft, r2 = m.unet_encoder.triplane_unet(ti[None], rr)
            return off, sft, r1, r2

        return net.apply(variables, uv_input, tri_input, r_tex, r_tri, method=run)

    @jax.jit
    def sft_backbone(variables, ws, sft):
        def run(m, ws, sft):
            return m.generator.backbone.synthesis(
                ws, return_list=True, feat_conditions=sft, noise_mode="const")

        return net.apply(variables, ws, sft, method=run)

    @jax.jit
    def uv_assemble(variables, x_uv, delta_x, x_img):
        def run(m, x_uv, delta_x, x_img):
            ui = m.get_unet_uvinput(x_uv, delta_x)
            ti = jnp.concatenate([x_img[..., :3], delta_x], axis=-1)
            return ui, ti

        return net.apply(variables, x_uv, delta_x, x_img, method=run)

    t_enc, ws = timed(encode_first, variables, img)
    t_feats, (tex, static) = timed(init_feats, variables, ws)
    t_render, y = timed(e4e_render, variables, ws, tex, static, cs, uvcs)
    from invertavatar_tpu.ops.resize import resize_bilinear

    @jax.jit
    def delta(y, x):
        d = y
        if d.shape[1] != x.shape[1]:
            d = resize_bilinear(d, (256, 256), antialias=True)
        return d - x[..., :3]

    t_delta, dx = timed(delta, y, images)
    t_asm, (ui, ti) = timed(uv_assemble, variables, uvs, dx, images)
    t_unets, (off, sft, r1, r2) = timed(unets, variables, ui, ti, None, None)
    t_sft, statics2 = timed(sft_backbone, variables, ws, sft)

    rec["per_chunk_ms"] = {
        "e4e_render_T4": round(t_render * 1e3, 1),
        "delta_resize": round(t_delta * 1e3, 1),
        "uv_assemble": round(t_asm * 1e3, 1),
        "unets": round(t_unets * 1e3, 1),
        "sft_backbone": round(t_sft * 1e3, 1),
    }
    rec["once_ms"] = {
        "encode_e4e": round(t_enc * 1e3, 1),
        "init_feats": round(t_feats * 1e3, 1),
    }
    chunk = t_render + t_delta + t_asm + t_unets + t_sft
    rec["sum_est_absorb_s"] = round(t_enc + t_feats + 2 * chunk, 3)
    print(json.dumps(rec, indent=2), flush=True)
    with open(os.path.join(_repo, "docs", "absorb_anatomy.json"), "w") as f:
        json.dump(rec, f, indent=2)


if __name__ == "__main__":
    main()
