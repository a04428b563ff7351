"""Substage anatomy of the ONLINE driving frame on the real chip (round 4).

The online loop (bench_extra.bench_online, reference
reenact_avatar_next3d.py:194-218) runs one fused XLA program per frame:
FaceVerse driving raster (coeffs -> 256^2 uvcoords) + synthesis_withTexture
(UV-warp raster + mouth fill -> face backbone -> merged-march volume render
-> SR). At 31.77 fps the frame is ~31.5 ms of device time; >=35 fps needs
~3 ms cut. This records where the milliseconds are, per substage, with the
SAME caches the online loop uses (raster_static + texture_concat).

Writes docs/online_anatomy.json.

Usage: python scripts/profile_online.py
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

from bench_extra import synthetic_head_assets, _flagship, _avatar_feats
from invertavatar_tpu.faceverse.manager import FaceverseManager


def _fence(x):
    return np.asarray(jnp.ravel(jax.tree_util.tree_leaves(x)[0])[:1])


def timeit(name, fn, *args, iters=30):
    out = fn(*args)
    _fence(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _fence(out)
    ms = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:28s} {ms:8.2f} ms", flush=True)
    return out, round(ms, 3)


def main():
    G, variables, example_inputs = _flagship()
    z, c, _ = example_inputs(1)
    ws, tex, static, cache, tex_cat = _avatar_feats(G, variables, z, c)

    rng = np.random.RandomState(0)
    assets = synthetic_head_assets(rng)
    mgr = FaceverseManager(
        assets,
        fv2fl=np.eye(4, dtype=np.float32),
        face_mask=np.ones(assets.uv_per_ver.shape[0], np.float32),
    )
    n_coeff = assets.id_dims + assets.exp_dims + assets.tex_dims + 38
    mgr.set_identity((rng.randn(n_coeff) * 0.1).astype(np.float32))
    coeff = jnp.asarray((rng.randn(n_coeff) * 0.1).astype(np.float32))

    out = {"device": jax.devices()[0].device_kind, "stages_ms": {}}
    S = out["stages_ms"]

    # --- driving side -----------------------------------------------------
    drv = jax.jit(lambda cf: mgr.make_driven_rendering(cf))
    uvc, S["driven_total"] = timeit("driven_total", drv, coeff)

    # blendshape mesh only (everything before rasterize)
    model = mgr.model

    def verts(cf):
        cf = cf[None]
        sp = model.split_coeffs(cf)
        id_coeff, exp_coeff, eye_coeff = mgr.id_coeff, sp[1], sp[6]
        l_eye_mat = model.compute_eye_rotation_matrix(eye_coeff[:, :2])
        r_eye_mat = model.compute_eye_rotation_matrix(eye_coeff[:, 2:])
        vs = model.get_vs(id_coeff, exp_coeff, l_eye_mat, r_eye_mat,
                          model.get_l_eye_center(id_coeff),
                          model.get_r_eye_center(id_coeff))
        return vs

    _, S["driven_blendshapes"] = timeit("driven_blendshapes", jax.jit(verts), coeff)

    # --- synthesis side (with the animation-loop caches) -------------------
    def raster(v, tex_, static_, uvc_, cache_, cat_):
        def run(m, tex_, static_, uvc_, cache_, cat_):
            return m.rasterize(tex_, uvc_, m._static_feats_for_raster(static_),
                               static_small=cache_, texture_concat_cache=cat_)
        return G.apply(v, tex_, static_, uvc_, cache_, cat_, method=run)

    (rendering_images, full_alpha, _), S["uvwarp_raster_mouth"] = timeit(
        "uvwarp_raster_mouth", jax.jit(raster), variables, tex, static, uvc, cache, tex_cat)

    def face(v, ws_, conds):
        return G.apply(v, ws_, conds,
                       method=lambda m, w, cl: m.face_backbone.synthesis(w, cond_list=cl, noise_mode="const"))

    stitch, S["face_backbone"] = timeit("face_backbone", jax.jit(face), variables, ws, rendering_images)

    from invertavatar_tpu.models.triplane import _to_planes

    def render_core(v, ws_, c_, stitch_, alpha_, static_):
        def run(m, w, cc, st, al, sf):
            static_plane = _to_planes(sf[-1])
            return m._render_core(w, cc, st, al, static_plane, True, "const", jax.random.PRNGKey(0))
        return G.apply(v, ws_, c_, stitch_, alpha_, static_, method=run)

    core_out, S["volume_plus_sr"] = timeit(
        "volume_plus_sr", jax.jit(render_core), variables, ws, c, stitch, full_alpha, static)

    del core_out
    # time the volume pass WITHOUT SR (mirrors _render_core up to the SR call)
    from invertavatar_tpu.render.ray_sampler import sample_rays

    def volume_only(v, ws_, c_, stitch_, alpha_, static_):
        def run(m, w, cc, st, al, sf):
            static_plane = _to_planes(sf[-1])
            rk = dict(m.rendering_kwargs or {})
            rk.pop("ray_start", None)
            rk.pop("ray_end", None)
            cam = cc[:, -25:]
            cam2world = cam[:, :16].reshape(-1, 4, 4)
            intrinsics = cam[:, 16:25].reshape(-1, 3, 3)
            res = m.neural_rendering_resolution
            ray_o, ray_d = sample_rays(cam2world, intrinsics, res)
            blended = m._blend_planes(st, al, static_plane)
            dec_params = m.decoder(None, return_params=True)
            dec = lambda feats: m.decoder(feats)
            feats_, depth_, _ = m.renderer(blended, dec, ray_o, ray_d, rk,
                                           evaluation=True, rng=jax.random.PRNGKey(0),
                                           decoder_params=dec_params)
            return feats_
        return G.apply(v, ws_, c_, stitch_, alpha_, static_, method=run)

    try:
        _, S["volume_only"] = timeit("volume_only", jax.jit(volume_only),
                                     variables, ws, c, stitch, full_alpha, static)
        S["sr_derived"] = round(S["volume_plus_sr"] - S["volume_only"], 3)
    except Exception as e:  # noqa: BLE001 — internal API drift must not kill the run
        S["volume_only_error"] = f"{type(e).__name__}: {str(e)[:200]}"

    # --- full frames --------------------------------------------------------
    def synth(v, ws_, tex_, static_, cache_, cat_, c_, uvc_):
        def run(m, w, t, s, ch, tc, cc, vv):
            return m.synthesis_withTexture(w, t, cc, vv, static_feats=s, noise_mode="const",
                                           evaluation=True, raster_static_cache=ch,
                                           texture_concat_cache=tc)["image"]
        return G.apply(v, ws_, tex_, static_, cache_, cat_, c_, {"uvcoords_image": uvc_}, method=run)

    _, S["synthesis_frame"] = timeit("synthesis_frame", jax.jit(synth),
                                     variables, ws, tex, static, cache, tex_cat, c, uvc)

    def online(v, ws_, tex_, static_, cache_, cat_, c_, cf):
        uv = mgr.make_driven_rendering(cf)
        def run(m, w, t, s, ch, tc, cc, vv):
            return m.synthesis_withTexture(w, t, cc, vv, static_feats=s, noise_mode="const",
                                           evaluation=True, raster_static_cache=ch,
                                           texture_concat_cache=tc)["image"]
        return G.apply(v, ws_, tex_, static_, cache_, cat_, c_, {"uvcoords_image": uv}, method=run)

    _, S["online_frame"] = timeit("online_frame", jax.jit(online),
                                  variables, ws, tex, static, cache, tex_cat, c, coeff)
    S["driven_in_frame_derived"] = round(S["online_frame"] - S["synthesis_frame"], 3)

    path = os.path.join(_repo, "docs", "online_anatomy.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
