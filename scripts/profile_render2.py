"""Timing: sampling paths + full renderer after the fast-path change."""

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
    print(f"{name:44s} {(time.perf_counter()-t0)/iters*1000:8.2f} ms", flush=True)


def main():
    from invertavatar_tpu.ops.plane_sample import (
        grid_sample_patch,
        pad_planes_for_patch,
        sample_planes_coarse_windowed,
    )
    from invertavatar_tpu.render.renderer import ImportanceRenderer
    from invertavatar_tpu.render.ray_sampler import sample_rays
    from invertavatar_tpu.flagship import FLAGSHIP_RENDERING_KWARGS, example_inputs

    rng = np.random.RandomState(0)
    N, H, C = 3, 256, 32
    res, S = 128, 48
    planes = jnp.asarray(rng.randn(N, H, H, C).astype(np.float32))
    padded = pad_planes_for_patch(planes)

    # realistic structured grid
    _, c, _ = example_inputs(1)
    ro, rd = sample_rays(c[:, :16].reshape(-1, 4, 4), c[:, 16:25].reshape(-1, 3, 3), res)
    depths = jnp.linspace(2.25, 3.3, S).reshape(1, 1, S, 1)
    coords = (ro[:, :, None, :] + depths * rd[:, :, None, :]) * 2.0
    from invertavatar_tpu.render.renderer import project_onto_planes

    proj = project_onto_planes(coords.reshape(1, -1, 3)).reshape(N, res * res, S, 2)

    timeit(
        "windowed coarse 786k",
        jax.jit(lambda p, g: sample_planes_coarse_windowed(p, g, res=res, tile=16, window=48)),
        planes, proj,
    )
    timeit(
        "patch gather 786k",
        jax.jit(lambda p, g: grid_sample_patch(p, g, 32)),
        padded, proj.reshape(N, -1, 2),
    )

    W1 = jnp.asarray(rng.randn(32, 64).astype(np.float32) * 0.1)
    W2 = jnp.asarray(rng.randn(64, 33).astype(np.float32) * 0.1)

    def decoder(feats):
        x = jnp.mean(feats, axis=1)
        x = jax.nn.softplus(x @ W1)
        x = x @ W2
        return {"rgb": jax.nn.sigmoid(x[..., 1:]) * 1.002 - 0.001, "sigma": x[..., 0:1]}

    r = ImportanceRenderer()
    opts = dict(FLAGSHIP_RENDERING_KWARGS)
    planes5 = planes[None]
    timeit(
        "full renderer fast",
        jax.jit(lambda p, ro, rd: r(p, decoder, ro, rd, opts, evaluation=True)[0]),
        planes5, ro, rd,
    )
    opts2 = dict(FLAGSHIP_RENDERING_KWARGS, fast_sampling=False)
    timeit(
        "full renderer naive",
        jax.jit(lambda p, ro, rd: r(p, decoder, ro, rd, opts2, evaluation=True)[0]),
        planes5, ro, rd,
    )


if __name__ == "__main__":
    main()
