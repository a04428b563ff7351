"""Extended benchmarks: the four BASELINE.json configs beyond bench.py's
single-avatar reenact, plus the full online-driving loop (VERDICT r2 #3).

Each config prints ONE JSON line in bench.py's shape
({"metric","value","unit","vs_baseline"}); the full set is also written to
docs/BENCH_EXTRA.json.  Reference loops being measured:

  reenact_online_512_fps    reenact incl. per-frame FaceVerse raster
                            (reenact_avatar_next3d.py:209 make_driven_rendering
                            + :214 G.synthesis per frame)
  fewshot_ar8_update_s      few-shot avatar update over an 8-frame clip in
                            4-frame ConvGRU chunks (eval_seq.py:173-190)
  oneshot_invert_s          one-shot inversion forward (eval_updated_os.py:
                            87-226 single G(...) with SegFormer decoders)
  reenact_batch10_fps       batched 5x2 multi-identity reenact (BASELINE
                            config 4), aggregate frames/sec/chip

The FaceVerse assets published with the reference (faceverse_v3_1.npy) are not
in this zero-egress image; the online-driving raster runs on synthetic assets
at the real topology scale (~15.4k verts / ~30.3k tris — SURVEY.md §2.1
"~30k tris, 512^2 ortho"), which is what the raster cost depends on.

Usage: python bench_extra.py [online|ar8|oneshot|batch10|all]
"""

import json
import os
import sys
import time

_repo = os.path.dirname(os.path.abspath(__file__))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_repo, ".jax_cache"))
sys.path.insert(0, _repo)

import numpy as np

BASELINE_FPS = 30.0  # BASELINE.json north-star for the reenact loops


def _fence(x):
    """Force completion through the axon relay (block_until_ready is a no-op
    there — docs/PERF_NOTES.md): tiny scalar readback."""
    np.asarray(jax.numpy.ravel(x)[:1])


def _synthetic_manager(n_grid: int = 124):
    """FaceverseManager on synthetic assets at the real topology scale."""
    from invertavatar_tpu.faceverse.synthetic import synthetic_manager

    mgr, coeffs = synthetic_manager(n_grid)
    return mgr, coeffs, int(np.asarray(mgr.tri).shape[0])


def _flagship_frame_fn():
    """(frame_jit, variables, ws, tex, static, cache, c) for the drive loop."""
    from invertavatar_tpu.flagship import example_inputs, flagship_generator, init_flagship

    G = flagship_generator()
    variables = init_flagship(G)
    z, c, uvc = example_inputs(1)

    def precompute(variables, z, c):
        def run(m, z, c):
            ws = m.mapping(z, c)
            tex = m.texture_backbone.synthesis(ws, return_list=True, noise_mode="const")
            static = m.backbone.synthesis(ws, return_list=True, noise_mode="const")
            cache = m.precompute_raster_static(static)
            return ws, tex, static, cache

        return G.apply(variables, z, c, method=run)

    ws, tex, static, cache = jax.jit(precompute)(variables, z, c)

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

    return G, jax.jit(frame), variables, ws, tex, static, cache, c, uvc


def bench_online(out):
    """Reenact WITH the per-frame FaceVerse ortho raster in the loop."""
    mgr, coeffs, n_tris = _synthetic_manager()
    G, frame_jit, variables, ws, tex, static, cache, c, _ = _flagship_frame_fn()

    uvc = mgr.make_driven_rendering(coeffs[1])
    img = frame_jit(variables, ws, tex, static, cache, c, uvc)
    _fence(img)  # compile both programs

    # raster alone
    n = int(os.environ.get("BENCH_FRAMES", "30"))
    t0 = time.perf_counter()
    for i in range(n):
        uvc = mgr.make_driven_rendering(coeffs[1 + (i % 7)])
    _fence(uvc)
    raster_ms = (time.perf_counter() - t0) / n * 1e3

    t0 = time.perf_counter()
    for i in range(n):
        uvc = mgr.make_driven_rendering(coeffs[1 + (i % 7)])
        img = frame_jit(variables, ws, tex, static, cache, c, uvc)
    _fence(img)
    dt = time.perf_counter() - t0
    fps = n / dt
    rec = {
        "metric": "reenact_online_512_fps",
        "value": round(fps, 3),
        "unit": "frames/sec (incl. FaceVerse raster, %d tris)" % n_tris,
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        "raster_ms_per_frame": round(raster_ms, 3),
    }
    print(json.dumps(rec), flush=True)
    out["reenact_online"] = rec
    return G, frame_jit, variables, c


def _flagship_inversion_net(unet_type: str):
    from invertavatar_tpu.flagship import FLAGSHIP_RENDERING_KWARGS
    from invertavatar_tpu.models.encoders.uvnet import InversionNet

    rk = dict(FLAGSHIP_RENDERING_KWARGS)
    gen_cfg = dict(
        z_dim=512, c_dim=25, w_dim=512, img_resolution=512, img_channels=3,
        rendering_kwargs=rk, neural_rendering_resolution=128,
        channel_base=32768, channel_max=512, map_num_layers=2,
    )
    net = InversionNet(generator_cfg=gen_cfg, unet_type=unet_type)
    rng = jax.random.PRNGKey(0)
    rngs = {"params": rng, "buffers": jax.random.fold_in(rng, 1),
            "noise": jax.random.fold_in(rng, 2), "ray": jax.random.fold_in(rng, 3)}
    img = jnp.zeros((1, 512, 512, 3), jnp.float32)
    c = jnp.zeros((1, 25), jnp.float32).at[0, :16].set(jnp.eye(4).reshape(-1)).at[0, 16:].set(
        jnp.asarray([4.26, 0, 0.5, 0, 4.26, 0.5, 0, 0, 1.0])
    )
    v = {"uvcoords_image": jnp.zeros((1, 256, 256, 3), jnp.float32)}
    uv = jnp.zeros((1, 256, 256, 6), jnp.float32)
    t0 = time.time()
    from invertavatar_tpu.flagship import init_by_shape

    variables = init_by_shape(lambda: net.init(rngs, {"image": img, "uv": uv}, c, v))
    return net, variables, time.time() - t0, (img, c, v, uv)


def bench_ar8(out):
    """Few-shot incremental inversion: 8 frames in two 4-frame GRU chunks."""
    net, variables, init_s, (img, c, v, uv) = _flagship_inversion_net("gru")
    T = 4

    @jax.jit
    def encode_and_feats(variables, img):
        def run(m, x):
            ws = m.encode(x)
            tex = m.generator.texture_backbone.synthesis(ws, return_list=True, noise_mode="const")
            static = m.generator.backbone.synthesis(ws, return_list=True, noise_mode="const")
            return {"w": ws, "texture": tex, "static": static}

        return net.apply(variables, img, method=run)

    @jax.jit
    def ar_chunk(variables, x, cT, vT, ws, r_list, e4e_results):
        def run(m, x, cT, vT, ws, r_list, e4e_results):
            return m.ar_forward(x, cT, vT, ws, r_list, e4e_results)

        return net.apply(variables, x, cT, vT, ws, r_list, e4e_results, method=run)

    imgT = jnp.tile(img[:, None], (1, T, 1, 1, 1)).reshape(T, 512, 512, 3)
    imgT256 = jax.image.resize(imgT, (T, 256, 256, 3), "bilinear")
    uvT = jnp.tile(uv, (T, 1, 1, 1))
    cT = jnp.tile(c, (T, 1))
    vT = {"uvcoords_image": jnp.tile(v["uvcoords_image"], (T, 1, 1, 1))}

    e4e = encode_and_feats(variables, img)
    ws = e4e["w"]
    x = {"image": imgT256, "uv": uvT}
    res, r_list = ar_chunk(variables, x, cT, vT, ws, [None, None], e4e)
    res2, r2 = ar_chunk(variables, x, cT, vT, ws, r_list, res)
    _fence(res2["texture"][0])  # compile (both r_list structures)

    reps = int(os.environ.get("BENCH_AR_REPS", "5"))
    t0 = time.perf_counter()
    for _ in range(reps):
        e4e = encode_and_feats(variables, img)
        res, r_list = ar_chunk(variables, x, cT, vT, e4e["w"], [None, None], e4e)
        res, r_list = ar_chunk(variables, x, cT, vT, e4e["w"], r_list, res)
    _fence(res["texture"][0])
    upd_s = (time.perf_counter() - t0) / reps
    rec = {
        "metric": "fewshot_ar8_update_s",
        "value": round(upd_s, 4),
        "unit": "sec per 8-frame avatar update (encode + 2x ConvGRU chunks)",
        "vs_baseline": None,
        "init_s": round(init_s, 1),
    }
    print(json.dumps(rec), flush=True)
    out["fewshot_ar8"] = rec


def bench_oneshot(out):
    """One-shot inversion forward (SegFormer decoders) -> updated features."""
    net, variables, init_s, (img, c, v, uv) = _flagship_inversion_net("segformer")

    @jax.jit
    def invert(variables, img, c, v, uv):
        def run(m, x, c, v):
            return m(x, c, v, return_feats=True)

        out = net.apply(variables, {"image": img, "uv": uv}, c, v, method=run)
        return out["w"], out["texture"], out["static"]

    ws, tex, static = invert(variables, img, c, v, uv)
    _fence(ws)
    reps = int(os.environ.get("BENCH_OS_REPS", "5"))
    t0 = time.perf_counter()
    for _ in range(reps):
        ws, tex, static = invert(variables, img, c, v, uv)
    _fence(ws)
    inv_s = (time.perf_counter() - t0) / reps
    rec = {
        "metric": "oneshot_invert_s",
        "value": round(inv_s, 4),
        "unit": "sec per one-shot inversion (512^2 source -> avatar features)",
        "vs_baseline": None,
        "init_s": round(init_s, 1),
        "note": "subsequent reenact fps == reenact_online_512_fps (same drive loop)",
    }
    print(json.dumps(rec), flush=True)
    out["oneshot_invert"] = rec


def bench_batch10(out):
    """Batched 5x2 multi-identity reenact (BASELINE config 4)."""
    from invertavatar_tpu.flagship import example_inputs, flagship_generator, init_flagship

    B = 10
    G = flagship_generator()
    variables = init_flagship(G)
    z, c, uvc = example_inputs(B)

    def precompute(variables, z, c):
        def run(m, z, c):
            ws = m.mapping(z, c)
            tex = m.texture_backbone.synthesis(ws, return_list=True, noise_mode="const")
            static = m.backbone.synthesis(ws, return_list=True, noise_mode="const")
            cache = m.precompute_raster_static(static)
            return ws, tex, static, cache

        return G.apply(variables, z, c, method=run)

    ws, tex, static, cache = jax.jit(precompute)(variables, z, c)

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

    frame_jit = jax.jit(frame)
    img = frame_jit(variables, ws, tex, static, cache, c, uvc)
    _fence(img)
    n = int(os.environ.get("BENCH_FRAMES", "20"))
    t0 = time.perf_counter()
    for _ in range(n):
        img = frame_jit(variables, ws, tex, static, cache, c, uvc)
    _fence(img)
    dt = time.perf_counter() - t0
    fps = n * B / dt
    rec = {
        "metric": "reenact_batch10_fps",
        "value": round(fps, 3),
        "unit": "aggregate frames/sec/chip at batch 10 (5x2 grid)",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        "steps_per_sec": round(n / dt, 3),
    }
    print(json.dumps(rec), flush=True)
    out["reenact_batch10"] = rec


def main():
    global jax, jnp
    import jax
    import jax.numpy as jnp

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    out = {"device_kind": jax.devices()[0].device_kind}
    if which in ("all", "online"):
        bench_online(out)
    if which in ("all", "batch10"):
        bench_batch10(out)
    if which in ("all", "ar8"):
        bench_ar8(out)
    if which in ("all", "oneshot"):
        bench_oneshot(out)
    path = os.path.join(_repo, "docs", "BENCH_EXTRA.json")
    prev = {}
    if os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
    prev.update(out)
    with open(path, "w") as f:
        json.dump(prev, f, indent=2)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
