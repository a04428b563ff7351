"""Stage-level breakdown of the full volume renderer (flagship geometry)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:52s} {(time.perf_counter()-t0)/iters*1000:8.2f} ms", flush=True)
    return out


def main():
    from invertavatar_tpu.flagship import FLAGSHIP_RENDERING_KWARGS, example_inputs
    from invertavatar_tpu.render.ray_sampler import sample_rays
    from invertavatar_tpu.render.renderer import ImportanceRenderer
    from invertavatar_tpu.render.ray_marcher import mip_ray_march

    rng = np.random.RandomState(0)
    N, H, C = 3, 256, 32
    res, S = 128, 48
    planes5 = jnp.asarray(rng.randn(1, N, H, H, C).astype(np.float32))

    _, c, _ = example_inputs(1)
    ro, rd = sample_rays(c[:, :16].reshape(-1, 4, 4), c[:, 16:25].reshape(-1, 3, 3), res)

    w1 = jnp.asarray(rng.randn(32, 64).astype(np.float32) * 0.3)
    w2 = jnp.asarray(rng.randn(64, 33).astype(np.float32) * 0.3)

    def decoder(feats):
        x = jnp.mean(feats.astype(jnp.float32), axis=1)
        x = jax.nn.softplus(x @ w1)
        x = x @ w2
        return {"rgb": jax.nn.sigmoid(x[..., 1:]) * 1.002 - 0.001, "sigma": x[..., 0:1]}

    r = ImportanceRenderer()
    base = dict(FLAGSHIP_RENDERING_KWARGS)

    # full renderer (current default options)
    timeit("full renderer (default opts)",
           jax.jit(lambda p, ro, rd: r(p, decoder, ro, rd, base, evaluation=True)[0]),
           planes5, ro, rd)

    # coarse-only: n_imp = 0
    opts = dict(base, depth_resolution_importance=0)
    timeit("coarse-only (48, pallas v2 + XLA dec + march)",
           jax.jit(lambda p, ro, rd: r(p, decoder, ro, rd, opts, evaluation=True)[0]),
           planes5, ro, rd)

    # full with pooled importance
    opts = dict(base, pooled_importance=True)
    timeit("full renderer (pooled importance)",
           jax.jit(lambda p, ro, rd: r(p, decoder, ro, rd, opts, evaluation=True)[0]),
           planes5, ro, rd)

    # marcher + merge glue cost alone
    d1 = jnp.sort(jax.random.uniform(jax.random.PRNGKey(0), (1, res * res, S, 1)), axis=2)
    c1 = jax.random.normal(jax.random.PRNGKey(1), (1, res * res, S, 32))
    s1 = jax.random.normal(jax.random.PRNGKey(2), (1, res * res, S, 1))

    def glue(d1, c1, s1):
        _, _, w = mip_ray_march(c1, s1, d1)
        d2 = r._sample_importance(d1, w, S, det=True, rng=jax.random.PRNGKey(3))
        ad, ac, asg = r._unify_samples(d1, c1, s1, d2, c1, s1)
        rgb, dep, w2_ = mip_ray_march(ac, asg, ad)
        return rgb

    timeit("glue: march + sample_pdf + merge + march", jax.jit(glue), d1, c1, s1)


if __name__ == "__main__":
    main()
