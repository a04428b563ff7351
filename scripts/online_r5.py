"""Online-driving round 5: exact raster + fine-pass budget, fidelity-gated.

VERDICT r4 next-4: online driving must reach >=35 fps WITH the oracle-exact
driving raster (tile16_fpt512_exact — docs/raster_visibility.json showed the
shipped fpt1024 drops faces that are visible in the driving signal). The
anatomy (docs/online_anatomy.json) puts volume+SR at 21.6 ms of the 31.7 ms
frame; the candidate lever is the fine-pass sample budget
(depth_resolution_importance 48 -> 32/24), which this script gates against
the committed flagship torch-oracle frames (tests/fixtures/golden_fidelity
.npz, MS-SSIM >= 0.996 / PSNR >= 45 dB — the same v2 gate as
tests/test_fidelity_gate.py) and times in BOTH loops:

  * synthesis frame (bench.py loop, cached avatar) per importance budget
  * online frame (driven raster in-program) x {shipped fpt1024,
    tile16_fpt512_exact} x importance budget

Writes docs/online_r5.json.  Usage: python scripts/online_r5.py
"""

import json
import os
import sys
import time

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _repo)
sys.path.insert(0, os.path.join(_repo, "scripts"))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_repo, ".jax_cache"))

import numpy as np

import jax
import jax.numpy as jnp

from invertavatar_tpu.flagship import FLAGSHIP_RENDERING_KWARGS
from invertavatar_tpu.models.triplane import TriPlaneGenerator


def _fence(x):
    return np.asarray(jnp.ravel(jax.tree_util.tree_leaves(x)[0])[:1])


def _psnr(a, b):
    mse = float(np.mean((np.asarray(a, np.float32) - np.asarray(b, np.float32)) ** 2))
    return 10.0 * np.log10(4.0 / mse)


def flagship_variant(imp: int, coarse: int = 48):
    rk = dict(FLAGSHIP_RENDERING_KWARGS, depth_resolution_importance=imp,
              depth_resolution=coarse)
    return TriPlaneGenerator(
        z_dim=512, c_dim=25, w_dim=512, img_resolution=512, img_channels=3,
        sr_num_fp16_res=4, rendering_kwargs=rk, neural_rendering_resolution=128,
        channel_base=32768, channel_max=512, num_fp16_res=4, conv_clamp=256.0,
        map_num_layers=2,
    )


def main():
    t0 = time.time()
    out = {"device": jax.devices()[0].device_kind, "variants": {}}
    path = os.path.join(_repo, "docs", "online_r5.json")

    # ---- weights + goldens (fidelity gate inputs) -------------------------
    data = np.load(os.path.join(_repo, "tests", "fixtures", "golden_fidelity.npz"))
    sys.path.insert(0, "/root/reference")
    from tests.oracle_utils import stub_reference_modules

    stub_reference_modules()
    from fidelity_flagship import build_torch_oracle

    _, variables, ws = build_torch_oracle()
    np.testing.assert_allclose(ws, data["ws"], rtol=0, atol=0)
    # torch-transplanted trees are HOST numpy — without this every frame call
    # re-uploads the full ~150 MB param set through the relay (measured: the
    # "0.21 fps" of this script's first two runs was a transfer benchmark)
    variables = jax.device_put(variables)
    refs = np.transpose(data["frames_ref"].astype(np.float32), (0, 2, 3, 1))
    print(f"[{time.time()-t0:.0f}s] oracle weights regenerated", flush=True)

    from invertavatar_tpu.losses.ms_ssim import ms_ssim

    msssim_fn = jax.jit(lambda a, b: ms_ssim((a + 1) * 0.5, (b + 1) * 0.5, val_range=1.0))

    # device-resident inputs ONCE: a per-frame jnp.asarray(numpy) upload
    # through the axon relay costs seconds of latency and turns the fps loop
    # into a transfer benchmark (first run of this script: 0.21 "fps")
    nf = int(data["cameras"].shape[0])
    ws_dev = jnp.asarray(ws)
    cams_dev = [jnp.asarray(data["cameras"][k:k + 1]) for k in range(nf)]
    uvcs_dev = [jnp.asarray(data["uvcoords"][k:k + 1], jnp.float32) for k in range(nf)]
    refs_dev = [jnp.asarray(refs[k:k + 1]) for k in range(nf)]

    def eval_variant(name, imp, coarse=48):
        G = flagship_variant(imp, coarse)
        rec = {"depth_resolution_importance": imp, "depth_resolution": coarse}
        out["variants"][name] = rec

        def precompute(v, ws):
            def run(m, ws):
                tex = m.texture_backbone.synthesis(ws, return_list=True, noise_mode="const")
                static = m.backbone.synthesis(ws, return_list=True, noise_mode="const")
                cache = m.precompute_raster_static(static)
                tex_cat = m.precompute_texture_concat(tex)
                return tex, static, cache, tex_cat

            return G.apply(v, ws, method=run)

        tex, static, cache, tex_cat = jax.jit(precompute)(variables, ws_dev)

        def frame(v, ws, tex, static, cache, tex_cat, c, uvc):
            def run(m, ws, tex, static, cache, tex_cat, c, v_):
                return m.synthesis_withTexture(
                    ws, tex, c, v_, static_feats=static, noise_mode="const",
                    evaluation=True, raster_static_cache=cache,
                    texture_concat_cache=tex_cat,
                )["image"]

            return G.apply(v, ws, tex, static, cache, tex_cat, c,
                           {"uvcoords_image": uvc}, method=run)

        frame_jit = jax.jit(frame)

        # fidelity vs the committed torch-oracle frames
        ms_all, ps_all = [], []
        for k in range(nf):
            img = frame_jit(variables, ws_dev, tex, static, cache, tex_cat,
                            cams_dev[k], uvcs_dev[k])
            ms_all.append(float(msssim_fn(img, refs_dev[k])))
            ps_all.append(_psnr(np.asarray(img, np.float32), refs[k:k + 1]))
        rec["ms_ssim_min"] = min(ms_all)
        rec["psnr_db_min"] = min(ps_all)
        rec["gate_pass"] = bool(min(ms_all) >= 0.996 and min(ps_all) >= 45.0)

        # synthesis-frame fps (bench.py loop shape: device-resident inputs)
        img = frame_jit(variables, ws_dev, tex, static, cache, tex_cat,
                        cams_dev[0], uvcs_dev[0])
        _fence(img)
        n = 30
        t1 = time.perf_counter()
        for i in range(n):
            img = frame_jit(variables, ws_dev, tex, static, cache, tex_cat,
                            cams_dev[i % nf], uvcs_dev[i % nf])
        _fence(img)
        rec["synthesis_fps"] = round(n / (time.perf_counter() - t1), 2)
        print(f"[{time.time()-t0:.0f}s] {name}: {rec}", flush=True)
        with open(path, "w") as f:
            json.dump(out, f, indent=2)
        return G, (tex, static, cache, tex_cat)

    gens = {}
    sweep = [("imp48_ship", 48, 48), ("imp32", 32, 48), ("imp24", 24, 48)]
    if "--deep" in sys.argv:
        sweep += [("imp16", 16, 48), ("c40_imp24", 24, 40), ("c40_imp16", 16, 40)]
    for name, imp, coarse in sweep:
        gens[name] = eval_variant(name, imp, coarse)

    # ---- online loop: driven raster in-program ----------------------------
    from bench_extra import synthetic_head_assets
    from invertavatar_tpu.faceverse.manager import FaceverseManager

    rng = np.random.RandomState(0)
    assets = synthetic_head_assets(rng)
    n_coeff = assets.id_dims + assets.exp_dims + assets.tex_dims + 38
    coeffs = jnp.asarray((rng.randn(8, n_coeff) * 0.1).astype(np.float32))

    def online_fps(G, avatar, mgr):
        tex, static, cache, tex_cat = avatar

        def frame(v, ws, tex, static, cache, tex_cat, c, coeff):
            uvc = mgr.make_driven_rendering(coeff)

            def run(m, ws, tex, static, cache, tex_cat, c, v_):
                return m.synthesis_withTexture(
                    ws, tex, c, v_, static_feats=static, noise_mode="const",
                    evaluation=True, raster_static_cache=cache,
                    texture_concat_cache=tex_cat,
                )["image"]

            return G.apply(v, ws, tex, static, cache, tex_cat, c,
                           {"uvcoords_image": uvc}, method=run)

        frame_jit = jax.jit(frame)
        img = frame_jit(variables, ws_dev, tex, static, cache, tex_cat,
                        cams_dev[0], coeffs[0])
        _fence(img)
        n = 30
        t1 = time.perf_counter()
        for i in range(n):
            img = frame_jit(variables, ws_dev, tex, static, cache,
                            tex_cat, cams_dev[0], coeffs[i % 8])
        _fence(img)
        return round(n / (time.perf_counter() - t1), 2)

    rasters = {
        "fpt1024_ship": dict(faces_per_tile=1024, raster_kwargs={}),
        "t16_fpt512_exact": dict(faces_per_tile=512,
                                 raster_kwargs=dict(tile=16, chunk=128,
                                                    exact_cover=True)),
    }
    out["online"] = {}
    for rname, rkw in rasters.items():
        mgr = FaceverseManager(
            assets, fv2fl=np.eye(4, dtype=np.float32),
            face_mask=np.ones(assets.uv_per_ver.shape[0], np.float32), **rkw,
        )
        mgr.set_identity((rng.randn(n_coeff) * 0.1).astype(np.float32))
        for gname in gens:
            G, avatar = gens[gname]
            fps = online_fps(G, avatar, mgr)
            out["online"][f"{rname}+{gname}"] = fps
            print(f"[{time.time()-t0:.0f}s] online {rname}+{gname}: {fps} fps",
                  flush=True)
            with open(path, "w") as f:
                json.dump(out, f, indent=2)

    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
