"""Breakdown of the two-pass importance renderer at flagship geometry.

Times each stage of ImportanceRenderer.__call__ separately (coarse fused
kernel, march, pooled CDF inversion, fine fused kernel, per-ray merge, final
march) to locate the fine-pass cost (frame full - coarse-only was ~27 ms)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from invertavatar_tpu.flagship import FLAGSHIP_RENDERING_KWARGS, example_inputs
from invertavatar_tpu.render.ray_marcher import mip_ray_march
from invertavatar_tpu.render.ray_sampler import sample_rays
from invertavatar_tpu.render.renderer import ImportanceRenderer

_fetch = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))


def fence(out):
    float(_fetch(jax.tree_util.tree_leaves(out)[0].ravel()[:8]))


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fence(out)
    print(f"{name:44s} {(time.perf_counter()-t0)/iters*1000:8.2f} ms", flush=True)
    return out


def main():
    rng = np.random.RandomState(0)
    res = 128
    S = 48
    C = 32
    planes = jnp.asarray(rng.randn(1, 3, 256, 256, C).astype(np.float32) * 0.3)
    w1 = jnp.asarray(rng.randn(C, 64).astype(np.float32) * 0.2)
    b1 = jnp.asarray(rng.randn(64).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(64, 33).astype(np.float32) * 0.2)
    b2 = jnp.asarray(rng.randn(33).astype(np.float32) * 0.1)

    _, c, _ = example_inputs(1)
    cam2world = c[:, :16].reshape(-1, 4, 4)
    K = c[:, 16:25].reshape(-1, 3, 3)
    ray_o, ray_d = sample_rays(cam2world, K, res)

    rk = {k: v for k, v in FLAGSHIP_RENDERING_KWARGS.items()}
    rk.pop("ray_start"), rk.pop("ray_end")
    r = ImportanceRenderer()

    def decoder(feats):
        x = jnp.mean(feats.astype(jnp.float32), axis=1)
        h = jax.nn.softplus(x @ w1 + b1)
        o = h @ w2 + b2
        return {"rgb": jax.nn.sigmoid(o[..., 1:]) * 1.002 - 0.001, "sigma": o[..., :1]}

    dec_params = (w1, b1, w2, b2)

    full = jax.jit(
        lambda p: r(p, decoder, ray_o, ray_d, rk, evaluation=True,
                    decoder_params=dec_params)
    )
    timeit("renderer full (pooled fine)", full, planes)

    rk_nofine = dict(rk, depth_resolution_importance=0)
    timeit(
        "renderer coarse only",
        jax.jit(lambda p: r(p, decoder, ray_o, ray_d, rk_nofine, evaluation=True,
                            decoder_params=dec_params)),
        planes,
    )

    rk_nopool = dict(rk, pooled_importance=False)
    timeit(
        "renderer fine per-ray patch gather",
        jax.jit(lambda p: r(p, decoder, ray_o, ray_d, rk_nopool, evaluation=True,
                            decoder_params=dec_params)),
        planes,
    )

    # stage pieces
    from invertavatar_tpu.ops.pallas_fused_render import fused_render_pallas
    from invertavatar_tpu.render.renderer import project_onto_planes

    dist = float(jnp.mean(jnp.linalg.norm(ray_o, axis=-1)))
    rs, re_ = dist - 0.45, dist + 0.6
    base = jnp.linspace(0.0, 1.0, S).reshape(1, 1, S, 1) * (re_ - rs) + rs
    depths = base + 0.5 * (re_ - rs) / (S - 1)
    coords = ray_o[:, :, None, :] + depths * ray_d[:, :, None, :]

    def kernel_pass(planes):
        scaled = 2.0 * coords
        proj = project_onto_planes(scaled.reshape(1, -1, 3), None).reshape(1, 3, res * res, S, 2)
        return fused_render_pallas(planes[0], proj[0], dec_params, res=res, tile=16, window=32)

    timeit("fused kernel one 48-strata pass", jax.jit(kernel_pass), planes)

    col = jnp.asarray(rng.rand(1, res * res, S, 32).astype(np.float32))
    den = jnp.asarray(rng.randn(1, res * res, S, 1).astype(np.float32))
    timeit("mip_ray_march (48)", jax.jit(lambda c_, d_: mip_ray_march(c_, d_, depths * jnp.ones_like(den))), col, den)

    col2 = jnp.concatenate([col, col], axis=2)
    den2 = jnp.concatenate([den, den], axis=2)
    d96 = jnp.concatenate([depths * jnp.ones_like(den), depths * jnp.ones_like(den) + 0.01], axis=2)
    timeit("mip_ray_march (96)", jax.jit(lambda c_, d_, dd: mip_ray_march(c_, d_, dd)), col2, den2, d96)

    def unify(d1, c1, s1):
        return r._unify_samples(d1, c1, s1, d1 + 0.005, c1, s1)

    timeit("unify per-ray rank merge 48+48", jax.jit(unify), depths * jnp.ones_like(den), col, den)


if __name__ == "__main__":
    main()
