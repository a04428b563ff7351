"""Round-4 raster variants: push the online-driving loop toward ≥35 fps.

Profiles the full FaceVerse ortho raster (F≈59k synthetic head at real mesh
scale, the online-loop cost driver) across candidate configs:

  * anchor fpt1024 (shipped r3 default)
  * anchor fpt1024 + exact_cover (separating-edge candidate pruning)
  * anchor fpt768 / fpt512 + exact_cover
  * tile 16, fpt 512 / 384 + exact_cover

Every variant's output (face_id, bary, zbuf) is checked for exact equality
against a fat-capacity oracle (fpt4096) over several driven expressions —
a variant that drops a visible face is disqualified regardless of speed.
Writes docs/raster_r4.json.

Usage: python scripts/profile_raster_r4.py
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
from invertavatar_tpu.render.rasterizer import rasterize


def _fence(x):
    return np.asarray(jnp.ravel(x)[:1])


def main():
    rng = np.random.RandomState(0)
    assets = synthetic_head_assets(rng)
    mgr = FaceverseManager(
        assets, fv2fl=np.eye(4, dtype=np.float32),
        face_mask=np.ones(assets.uv_per_ver.shape[0], np.float32),
    )
    n_coeff = assets.id_dims + assets.exp_dims + assets.tex_dims + 38
    mgr.set_identity((rng.randn(n_coeff) * 0.1).astype(np.float32))

    # driven screen-space vertices for several expressions (the raster input)
    vert_sets = []
    for k in range(4):
        coeff = jnp.asarray((rng.randn(n_coeff) * 0.1).astype(np.float32))[None]
        _, exp_coeff, _, _, _, _, eye_coeff, _ = mgr.model.split_coeffs(coeff)
        l_eye = mgr.model.compute_eye_rotation_matrix(eye_coeff[:, :2])
        r_eye = mgr.model.compute_eye_rotation_matrix(eye_coeff[:, 2:])
        vs = mgr.model.get_vs(mgr.id_coeff, exp_coeff, l_eye, r_eye,
                              mgr.model.get_l_eye_center(mgr.id_coeff),
                              mgr.model.get_r_eye_center(mgr.id_coeff))
        vert = jnp.matmul(vs[0], jnp.asarray(mgr.fv2fl)[:3, :3].T) + jnp.asarray(mgr.fv2fl)[:3, 3:].T
        t = (vert + jnp.asarray(mgr.ORTH_SHIFT)) * mgr.ORTH_SCALE
        t = t.at[:, 2].multiply(-1.0)
        vert_sets.append(jax.device_put(t))
    tri = jax.device_put(mgr.tri)

    left, top, w, h = mgr.CROP
    R = mgr.RENDER_RES
    window = (2 * left / R - 1.0, 2 * (left + w) / R - 1.0,
              2 * top / R - 1.0, 2 * (top + h) / R - 1.0)

    variants = {
        "anchor_fpt1024": dict(binning="anchor", faces_per_tile=1024),
        "anchor_fpt1024_exact": dict(binning="anchor", faces_per_tile=1024,
                                     exact_cover=True),
        "anchor_fpt768_exact": dict(binning="anchor", faces_per_tile=768,
                                    exact_cover=True),
        "anchor_fpt512_exact": dict(binning="anchor", faces_per_tile=512,
                                    exact_cover=True),
        "t16_fpt512_exact": dict(binning="anchor", faces_per_tile=512, tile=16,
                                 chunk=128, exact_cover=True),
        "t16_fpt384_exact": dict(binning="anchor", faces_per_tile=384, tile=16,
                                 chunk=128, exact_cover=True),
    }
    oracle_kw = dict(binning="anchor", faces_per_tile=4096, exact_cover=False)

    def make_fn(kw):
        return jax.jit(lambda v: rasterize(
            v, tri, height=h, width=w, window=window, cull_backfaces=False, **kw
        ))

    oracle_fn = make_fn(oracle_kw)
    oracles = []
    for v in vert_sets:
        o = oracle_fn(v)
        oracles.append(jax.tree_util.tree_map(np.asarray, o))
    print("oracle done", flush=True)

    out = {"device": jax.devices()[0].device_kind, "F": int(tri.shape[0]),
           "variants": {}}
    iters = int(os.environ.get("PROF_ITERS", "30"))
    for name, kw in variants.items():
        fn = make_fn(kw)
        equal = True
        for v, o in zip(vert_sets, oracles):
            r = fn(v)
            for field in ("face_id", "bary", "zbuf"):
                a = np.asarray(getattr(r, field))
                b = np.asarray(getattr(o, field))
                # inf zbuf (no hit) compares equal via face_id instead
                if field == "zbuf":
                    hit = b != np.inf
                    ok = np.array_equal(a[hit], b[hit]) and np.all(a[~hit] == np.inf)
                else:
                    ok = np.array_equal(a, b)
                if not ok:
                    equal = False
        r = fn(vert_sets[0])
        _fence(r.zbuf)
        t0 = time.perf_counter()
        for i in range(iters):
            r = fn(vert_sets[i % 4])
        _fence(r.zbuf)
        ms = (time.perf_counter() - t0) / iters * 1000
        out["variants"][name] = {"ms": round(ms, 3), "equal_to_oracle": bool(equal)}
        print(name, out["variants"][name], flush=True)

    path = os.path.join(_repo, "docs", "raster_r4.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
