"""On-chip cost breakdown of the FaceVerse driving raster (bench_extra `online`
config measured the full loop at 18.5 fps vs 32.1 fps without the raster —
~23 ms/frame for a path whose arithmetic is ~1.3 GFLOP ≈ 1 ms on a v5e VPU).

Measures, each as its own jitted program on synthetic head assets (same as
bench_extra.py): the blendshape model, the tile binning (sort-based vs
scatter-based compaction), the per-tile z-buffer loop at several map batch
sizes, and the full make_driven_rendering program.

Writes docs/raster_profile.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_repo, ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

from invertavatar_tpu.faceverse.manager import FaceverseManager
from bench_extra import synthetic_head_assets  # same mesh as the measured bench


def timed(fn, *args, n=30, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
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

    rec = {
        "device": jax.devices()[0].device_kind,
        "F": int(assets.tri.shape[0]),
        "V": int(assets.uv_per_ver.shape[0]),
    }

    # 0) full path (one jitted program, as the bench runs it)
    full = jax.jit(lambda c: mgr.make_driven_rendering(c))
    rec["full_ms"] = round(timed(full, coeff), 3)

    # 1) model part only: coeffs -> screen verts
    model = mgr.model
    fv2fl = jnp.asarray(mgr.fv2fl)
    orth_shift = jnp.asarray(mgr.ORTH_SHIFT)

    def to_verts(c):
        id_c, exp_c, _, _, _, _, eye_c, _ = model.split_coeffs(c[None])
        l_eye_mat = model.compute_eye_rotation_matrix(eye_c[:, :2])
        r_eye_mat = model.compute_eye_rotation_matrix(eye_c[:, 2:])
        vs = model.get_vs(id_c, exp_c, l_eye_mat, r_eye_mat,
                          model.get_l_eye_center(id_c), model.get_r_eye_center(id_c))
        vert = jnp.matmul(vs[0], fv2fl[:3, :3].T) + fv2fl[:3, 3:].T
        t = (vert + orth_shift) * mgr.ORTH_SCALE
        return t.at[:, 2].multiply(-1.0)

    to_verts_j = jax.jit(to_verts)
    rec["model_ms"] = round(timed(to_verts_j, coeff), 3)
    verts = to_verts_j(coeff)

    # 2) binning variants (isolated from the z-loop)
    from invertavatar_tpu.render import rasterizer as R

    left, top, w, h = mgr.CROP
    RES = mgr.RENDER_RES
    window = (2 * left / RES - 1.0, 2 * (left + w) / RES - 1.0,
              2 * top / RES - 1.0, 2 * (top + h) / RES - 1.0)
    tri = mgr.tri

    def setup(verts):
        x0, x1, y0, y1 = window
        px = (verts[:, 0] - x0) / (x1 - x0) * w
        py = (verts[:, 1] - y0) / (y1 - y0) * h
        t = jnp.stack([px, py, verts[:, 2]], -1)[tri]
        return t

    tile = 32
    tw = th = w // tile
    fpt = 1024

    def bins_sort(t):
        tx, ty = t[..., 0], t[..., 1]
        F = t.shape[0]
        area2 = (tx[:, 1] - tx[:, 0]) * (ty[:, 2] - ty[:, 0]) - (tx[:, 2] - tx[:, 0]) * (ty[:, 1] - ty[:, 0])
        valid = jnp.abs(area2) > 1e-12
        fx0 = jnp.clip(jnp.floor(jnp.min(tx, 1) / tile), 0, tw - 1).astype(jnp.int32)
        fx1 = jnp.clip(jnp.floor(jnp.max(tx, 1) / tile), 0, tw - 1).astype(jnp.int32)
        fy0 = jnp.clip(jnp.floor(jnp.min(ty, 1) / tile), 0, th - 1).astype(jnp.int32)
        fy1 = jnp.clip(jnp.floor(jnp.max(ty, 1) / tile), 0, th - 1).astype(jnp.int32)

        def members(ty_i, tx_i):
            m = (fy0 <= ty_i) & (fy1 >= ty_i) & (fx0 <= tx_i) & (fx1 >= tx_i) & valid
            idx = jnp.where(m, jnp.arange(F, dtype=jnp.int32), F)
            idx = jnp.sort(idx)[:fpt]
            return jnp.where(idx == F, -1, idx)

        ids = jnp.arange(th * tw, dtype=jnp.int32)
        return jax.vmap(members)(ids // tw, ids % tw)

    def bins_scatter(t):
        tx, ty = t[..., 0], t[..., 1]
        F = t.shape[0]
        area2 = (tx[:, 1] - tx[:, 0]) * (ty[:, 2] - ty[:, 0]) - (tx[:, 2] - tx[:, 0]) * (ty[:, 1] - ty[:, 0])
        valid = jnp.abs(area2) > 1e-12
        fx0 = jnp.clip(jnp.floor(jnp.min(tx, 1) / tile), 0, tw - 1).astype(jnp.int32)
        fx1 = jnp.clip(jnp.floor(jnp.max(tx, 1) / tile), 0, tw - 1).astype(jnp.int32)
        fy0 = jnp.clip(jnp.floor(jnp.min(ty, 1) / tile), 0, th - 1).astype(jnp.int32)
        fy1 = jnp.clip(jnp.floor(jnp.max(ty, 1) / tile), 0, th - 1).astype(jnp.int32)

        def members(ty_i, tx_i):
            m = (fy0 <= ty_i) & (fy1 >= ty_i) & (fx0 <= tx_i) & (fx1 >= tx_i) & valid
            pos = jnp.cumsum(m.astype(jnp.int32)) - 1
            slot = jnp.where(m & (pos < fpt), pos, fpt)
            out = jnp.full((fpt + 1,), -1, jnp.int32)
            out = out.at[slot].max(jnp.arange(F, dtype=jnp.int32), mode="drop")
            return out[:fpt]

        ids = jnp.arange(th * tw, dtype=jnp.int32)
        return jax.vmap(members)(ids // tw, ids % tw)

    t = jax.jit(setup)(verts)
    bs_j = jax.jit(bins_sort)
    bc_j = jax.jit(bins_scatter)
    rec["bins_sort_ms"] = round(timed(bs_j, t), 3)
    rec["bins_scatter_ms"] = round(timed(bc_j, t), 3)
    same = np.array_equal(np.asarray(bs_j(t)), np.asarray(bc_j(t)))
    rec["bins_equal"] = bool(same)

    # 2b) top_k binning variant: k smallest member indices per tile
    def bins_topk(t):
        tx, ty = t[..., 0], t[..., 1]
        F = t.shape[0]
        area2 = (tx[:, 1] - tx[:, 0]) * (ty[:, 2] - ty[:, 0]) - (tx[:, 2] - tx[:, 0]) * (ty[:, 1] - ty[:, 0])
        valid = jnp.abs(area2) > 1e-12
        fx0 = jnp.clip(jnp.floor(jnp.min(tx, 1) / tile), 0, tw - 1).astype(jnp.int32)
        fx1 = jnp.clip(jnp.floor(jnp.max(tx, 1) / tile), 0, tw - 1).astype(jnp.int32)
        fy0 = jnp.clip(jnp.floor(jnp.min(ty, 1) / tile), 0, th - 1).astype(jnp.int32)
        fy1 = jnp.clip(jnp.floor(jnp.max(ty, 1) / tile), 0, th - 1).astype(jnp.int32)

        def members(ty_i, tx_i):
            m = (fy0 <= ty_i) & (fy1 >= ty_i) & (fx0 <= tx_i) & (fx1 >= tx_i) & valid
            vals = jnp.where(m, -jnp.arange(F, dtype=jnp.int32), -F)
            top, _ = jax.lax.top_k(vals, fpt)  # descending -idx = ascending idx
            return jnp.where(top == -F, -1, -top)

        ids = jnp.arange(th * tw, dtype=jnp.int32)
        return jax.vmap(members)(ids // tw, ids % tw)

    bt_j = jax.jit(bins_topk)
    rec["bins_topk_ms"] = round(timed(bt_j, t), 3)
    rec["bins_topk_equal"] = bool(np.array_equal(np.asarray(bs_j(t)), np.asarray(bt_j(t))))

    # 2c) actual tile occupancy (how much of faces_per_tile is used)
    def occupancy(t):
        tx, ty = t[..., 0], t[..., 1]
        fx0 = jnp.clip(jnp.floor(jnp.min(tx, 1) / tile), 0, tw - 1).astype(jnp.int32)
        fx1 = jnp.clip(jnp.floor(jnp.max(tx, 1) / tile), 0, tw - 1).astype(jnp.int32)
        fy0 = jnp.clip(jnp.floor(jnp.min(ty, 1) / tile), 0, th - 1).astype(jnp.int32)
        fy1 = jnp.clip(jnp.floor(jnp.max(ty, 1) / tile), 0, th - 1).astype(jnp.int32)

        def count(ty_i, tx_i):
            return jnp.sum((fy0 <= ty_i) & (fy1 >= ty_i) & (fx0 <= tx_i) & (fx1 >= tx_i))

        ids = jnp.arange(th * tw, dtype=jnp.int32)
        return jax.vmap(count)(ids // tw, ids % tw)

    occ = np.asarray(jax.jit(occupancy)(t))
    rec["tile_occupancy"] = {"max": int(occ.max()), "mean": round(float(occ.mean()), 1)}

    # 3) full rasterize (binning + z-loop as shipped) + capacity variants
    for cap in (1024, 512):
        def rast_full(v, cap=cap):
            return R.rasterize(v, tri, height=h, width=w, window=window,
                               faces_per_tile=cap, cull_backfaces=False)

        rec[f"rasterize_total_fpt{cap}_ms"] = round(timed(jax.jit(rast_full), verts), 3)
    rec["zloop_ms_estimate"] = round(
        rec["rasterize_total_fpt1024_ms"] - rec["bins_sort_ms"], 3
    )

    # 3b) anchor binning (one 4F-key sort; manager default since r3 session 2)
    for cap in (1024, 512):
        def rast_anchor(v, cap=cap):
            return R.rasterize(v, tri, height=h, width=w, window=window,
                               faces_per_tile=cap, cull_backfaces=False,
                               binning="anchor")

        out_a = jax.jit(rast_anchor)(verts)
        out_s = jax.jit(lambda v, cap=cap: R.rasterize(
            v, tri, height=h, width=w, window=window, faces_per_tile=cap,
            cull_backfaces=False))(verts)
        rec[f"anchor_fpt{cap}_equal"] = bool(
            (np.asarray(out_a.face_id) == np.asarray(out_s.face_id)).all()
        )
        rec[f"rasterize_anchor_fpt{cap}_ms"] = round(timed(jax.jit(rast_anchor), verts), 3)

    print(json.dumps(rec, indent=2))
    with open(os.path.join(_repo, "docs", "raster_profile.json"), "w") as f:
        json.dump(rec, f, indent=2)


if __name__ == "__main__":
    main()
