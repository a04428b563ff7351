"""Timing + error check: fused sampling+decoder kernel vs v2 kernel + XLA decoder."""

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
    from invertavatar_tpu.flagship import example_inputs
    from invertavatar_tpu.ops.pallas_fused_render import fused_render_pallas
    from invertavatar_tpu.ops.pallas_plane_sample import sample_planes_windowed_pallas
    from invertavatar_tpu.ops.plane_sample import grid_sample_patch, pad_planes_for_patch
    from invertavatar_tpu.render.ray_sampler import sample_rays
    from invertavatar_tpu.render.renderer import project_onto_planes

    rng = np.random.RandomState(0)
    N, H, C = 3, 256, 32
    res, S = 128, 48
    planes = jnp.asarray(rng.randn(N, H, H, C).astype(np.float32))

    _, c, _ = example_inputs(1)
    ro, rd = sample_rays(c[:, :16].reshape(-1, 4, 4), c[:, 16:25].reshape(-1, 3, 3), res)
    depths = jnp.linspace(2.25, 3.3, S).reshape(1, 1, S, 1)
    coords = (ro[:, :, None, :] + depths * rd[:, :, None, :]) * 2.0
    proj = project_onto_planes(coords.reshape(1, -1, 3)).reshape(N, res * res, S, 2)

    w1 = jnp.asarray(rng.randn(32, 64).astype(np.float32) * 0.3)
    b1 = jnp.asarray(rng.randn(64).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(64, 33).astype(np.float32) * 0.3)
    b2 = jnp.asarray(rng.randn(33).astype(np.float32) * 0.1)

    def decoder(feats):  # [N, M, C] grouped as [1, 3, M, C]
        x = jnp.mean(feats, axis=0)
        x = jax.nn.softplus(x @ w1 + b1)
        x = x @ w2 + b2
        return jax.nn.sigmoid(x[..., 1:]) * 1.002 - 0.001, x[..., 0:1]

    # exact oracle: patch gather + XLA decoder
    padded = pad_planes_for_patch(planes)
    def oracle(p, g):
        feats = grid_sample_patch(p, g.reshape(N, -1, 2), C)
        return decoder(feats)
    rgb0, sig0 = timeit("patch gather + XLA decoder (exact)", jax.jit(oracle), padded, proj)

    # v2 kernel + XLA decoder
    def v2(p, g):
        feats = sample_planes_windowed_pallas(
            p, g, res=res, tile=16, window=48, payload_dtype=jnp.bfloat16, exact=False
        )
        return decoder(feats.reshape(N, -1, C))
    rgb2, sig2 = timeit("v2 kernel (bf16) + XLA decoder", jax.jit(v2), planes, proj)

    # fused kernel
    def fused(p, g):
        return fused_render_pallas(
            p, g, (w1, b1, w2, b2), res=res, tile=16, window=48,
            payload_dtype=jnp.bfloat16, exact=False,
        )
    rgb3, sig3 = timeit("fused kernel (bf16 payload)", jax.jit(fused), planes, proj)

    def fused_exact(p, g):
        return fused_render_pallas(
            p, g, (w1, b1, w2, b2), res=res, tile=16, window=48, exact=True
        )
    rgb4, sig4 = timeit("fused kernel (exact fp32)", jax.jit(fused_exact), planes, proj)

    rgb0r = rgb0.reshape(res * res, S, 32)
    sig0r = sig0.reshape(res * res, S, 1)
    for name, r, s in [("v2", rgb2.reshape(res*res, S, 32), sig2.reshape(res*res, S, 1)),
                       ("fused bf16", rgb3, sig3), ("fused exact", rgb4, sig4)]:
        print(f"{name:12s} max|drgb|={float(jnp.max(jnp.abs(r - rgb0r))):.2e} "
              f"max|dsig|={float(jnp.max(jnp.abs(s - sig0r))):.2e}")


if __name__ == "__main__":
    main()
