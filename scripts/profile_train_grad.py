"""Locate the few-shot grad program's 19.6 s/frame cost (PERF_NOTES r4).

Hypothesis: the backward of the tri-plane gather (lax.gather VJP = TPU
scatter-add, which serializes — the raster profile measured 34 ms for 59k
scatter rows) dominates the training render. This times, on the chip:

  1. forward plane patch-gather (the exact training-path formulation)
  2. jax.grad of sum(gather) w.r.t. planes   — the scatter-add VJP
  3. the same VJP computed scatter-free (sort + cumsum segment sum)
  4. forward + backward of the full exact renderer at training shapes

Writes docs/train_grad_profile.json.
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


def _fence(x):
    return np.asarray(jnp.ravel(x)[:1])


def timeit(name, fn, *args, iters=10, out=None):
    o = fn(*args)
    _fence(jax.tree_util.tree_leaves(o)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(*args)
    _fence(jax.tree_util.tree_leaves(o)[0])
    ms = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:44s} {ms:9.2f} ms", flush=True)
    if out is not None:
        out[name] = round(ms, 2)
    return o


def main():
    from invertavatar_tpu.render.renderer import sample_from_planes

    out = {"device": jax.devices()[0].device_kind}
    rng = np.random.RandomState(0)
    B, C, R = 1, 32, 256
    M = 128 * 128 * 48  # one coarse pass worth of points
    planes = jnp.asarray(rng.randn(B, 3, R, R, C).astype(np.float32))
    coords = jnp.asarray(rng.uniform(-1, 1, (B, M, 3)).astype(np.float32))

    fwd = jax.jit(lambda p, c: sample_from_planes(p, c, box_warp=1.0))
    timeit("plane_gather_fwd", fwd, planes, coords, out=out)

    g = jax.jit(jax.grad(lambda p, c: jnp.sum(sample_from_planes(p, c, box_warp=1.0) ** 2)))
    timeit("plane_gather_vjp_scatter", g, planes, coords, out=out)

    # scatter-free reference formulation of the same accumulation: corner ids
    # + weighted cotangents -> sort + cumsum segment sums
    def vjp_sorted(planes, coords, cot):
        # bilinear corners on ONE plane-projected axis pair; this reproduces
        # the accumulation COST SHAPE (3 planes x 4 corners), not the exact
        # plane math — the ops-level custom VJP implements the exact version.
        P3 = 3
        xy = (coords[..., :2] * 0.5 + 0.5) * (R - 1)
        x0 = jnp.floor(xy[..., 0]).astype(jnp.int32)
        y0 = jnp.floor(xy[..., 1]).astype(jnp.int32)
        fx = xy[..., 0] - x0.astype(jnp.float32)
        fy = xy[..., 1] - y0.astype(jnp.float32)
        acc = jnp.zeros((P3 * R * R, C), jnp.float32)
        idxs, vals = [], []
        for dy in (0, 1):
            for dx in (0, 1):
                w = jnp.where(dy == 0, 1 - fy, fy) * jnp.where(dx == 0, 1 - fx, fx)
                xi = jnp.clip(x0 + dx, 0, R - 1)
                yi = jnp.clip(y0 + dy, 0, R - 1)
                for p in range(P3):
                    idxs.append((p * R + yi[0]) * R + xi[0])
                    vals.append(cot[0, p] * w[0][:, None])
        idx = jnp.concatenate(idxs)
        val = jnp.concatenate(vals, axis=0)
        order = jnp.argsort(idx)
        idx_s = idx[order]
        val_s = val[order]
        csum = jnp.cumsum(val_s, axis=0)
        rows = jnp.arange(P3 * R * R, dtype=jnp.int32)
        ends = jnp.searchsorted(idx_s, rows, side="right") - 1
        starts = jnp.searchsorted(idx_s, rows, side="left") - 1
        total = jnp.where((ends >= 0)[:, None], csum[jnp.maximum(ends, 0)], 0.0)
        prev = jnp.where((starts >= 0)[:, None], csum[jnp.maximum(starts, 0)], 0.0)
        return (total - prev).reshape(P3, R, R, C)

    cot = jnp.asarray(rng.randn(B, 3, M, C).astype(np.float32))
    vs = jax.jit(vjp_sorted)
    timeit("plane_vjp_sortfree_equiv_cost", vs, planes, coords, cot, out=out)

    # full exact renderer fwd+bwd at training shapes (the render_loss_cot1 core)
    from invertavatar_tpu.render.renderer import ImportanceRenderer

    class Dec:
        def __call__(self, feats, _=None):
            sigma = jnp.sum(feats, axis=-1, keepdims=True)
            rgb = jnp.tanh(feats[..., : 32])
            return {"rgb": rgb, "sigma": sigma}

    r = ImportanceRenderer()
    ro = jnp.asarray(rng.randn(1, 128 * 128, 3).astype(np.float32)) * 0.1
    rd0 = rng.randn(1, 128 * 128, 3).astype(np.float32)
    rd = jnp.asarray(rd0 / np.linalg.norm(rd0, axis=-1, keepdims=True))
    opts = {
        "depth_resolution": 48, "depth_resolution_importance": 48,
        "ray_start": 2.25, "ray_end": 3.3, "clamp_mode": "softplus",
        "box_warp": 1.0,
    }

    def render_loss(planes):
        rgb, dep, wsum = r(planes, Dec(), ro, rd, dict(opts), evaluation=False,
                           rng=jax.random.PRNGKey(0))
        return jnp.mean(rgb ** 2)

    fwd_r = jax.jit(render_loss)
    timeit("exact_render_fwd(train shapes)", fwd_r, planes, iters=5, out=out)
    bwd_r = jax.jit(jax.grad(render_loss))
    timeit("exact_render_fwd_bwd(train shapes)", bwd_r, planes, iters=5, out=out)

    path = os.path.join(_repo, "docs", "train_grad_profile.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
