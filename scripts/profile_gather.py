"""Micro-bench: tri-plane bilinear sampling formulations on TPU."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:44s} {(time.perf_counter()-t0)/iters*1000:8.2f} ms")
    return out


def main():
    rng = np.random.RandomState(0)
    B3, H, W, C = 3, 256, 256, 32
    M = 128 * 128 * 48
    img = jnp.asarray(rng.randn(B3, H, W, C).astype(np.float32))
    grid = jnp.asarray((rng.rand(B3, M, 2).astype(np.float32) * 2 - 1) * 0.9)

    from invertavatar_tpu.ops.grid_sample import grid_sample

    timeit("take_along_axis rows (current)", jax.jit(grid_sample), img, grid)

    # variant: bf16 payload
    timeit("rows bf16", jax.jit(grid_sample), img.astype(jnp.bfloat16), grid)

    # variant: x-gather then y-gather separable? (two gathers of rows)
    def gs_transposed(img, grid):
        # operand [B3, C, H*W]; gather along last axis, scalar slices
        B3, H, W, C = img.shape
        imgt = jnp.transpose(img, (0, 3, 1, 2)).reshape(B3, C, H * W)
        gx = (grid[..., 0] + 1) * (W * 0.5) - 0.5
        gy = (grid[..., 1] + 1) * (H * 0.5) - 0.5
        x0 = jnp.floor(gx).astype(jnp.int32)
        y0 = jnp.floor(gy).astype(jnp.int32)
        wx = (gx - x0)[..., None]
        wy = (gy - y0)[..., None]

        def tap(yi, xi):
            valid = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
            flat = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
            vals = jnp.take_along_axis(imgt, flat[:, None, :], axis=2)  # [B3, C, M]
            return jnp.transpose(vals, (0, 2, 1)) * valid[..., None]

        out = (
            tap(y0, x0) * (1 - wx) * (1 - wy)
            + tap(y0, x0 + 1) * wx * (1 - wy)
            + tap(y0 + 1, x0) * (1 - wx) * wy
            + tap(y0 + 1, x0 + 1) * wx * wy
        )
        return out

    timeit("transposed scalar gather", jax.jit(gs_transposed), img, grid)

    # structured coords: ray-coherent (realistic pattern) vs random — rows path
    from invertavatar_tpu.flagship import example_inputs
    from invertavatar_tpu.render.ray_sampler import sample_rays
    from invertavatar_tpu.render.renderer import project_onto_planes

    _, c, _ = example_inputs(1)
    ro, rd = sample_rays(c[:, :16].reshape(-1, 4, 4), c[:, 16:25].reshape(-1, 3, 3), 128)
    depths = jnp.linspace(2.25, 3.3, 48).reshape(1, 1, 48, 1)
    coords = (ro[:, :, None, :] + depths * rd[:, :, None, :]).reshape(1, -1, 3) * 2.0
    proj = project_onto_planes(coords).reshape(3, -1, 2)
    timeit("rows, ray-coherent coords", jax.jit(grid_sample), img, proj)

    # windowed dynamic-slice variant (coarse pass): tiles of 256 rays × 1 depth
    def gs_windowed(img, proj):
        # proj [3, M, 2] ordered ray-major (rays, depth)
        B3 = img.shape[0]
        R = 128 * 128
        S = 48
        p = proj.reshape(B3, R, S, 2)
        p = jnp.transpose(p, (0, 2, 1, 3)).reshape(B3, S, 64, 256, 2)  # s-major, ray tiles of 256
        gx = (p[..., 0] + 1) * (W * 0.5) - 0.5
        gy = (p[..., 1] + 1) * (H * 0.5) - 0.5
        YW, XW = 16, 64  # window sizes
        y_start = jnp.clip(jnp.min(jnp.floor(gy), axis=-1).astype(jnp.int32), 0, H - YW)
        x_start = jnp.clip(jnp.min(jnp.floor(gx), axis=-1).astype(jnp.int32), 0, W - XW)

        def one_window(img_b, ys, xs, gy_t, gx_t):
            blk = jax.lax.dynamic_slice(img_b, (ys, xs, 0), (YW, XW, C))  # [YW, XW, C]
            ly = gy_t - ys
            lx = gx_t - xs
            y0 = jnp.floor(ly)
            x0 = jnp.floor(lx)
            wy = ly - y0
            wx = lx - x0
            iy = jax.lax.broadcasted_iota(jnp.float32, (256, YW), 1)
            ohy = jnp.maximum(0.0, 1.0 - jnp.abs(iy - ly[:, None]))  # tent weights [256, YW]
            ix = jax.lax.broadcasted_iota(jnp.float32, (256, XW), 1)
            ohx = jnp.maximum(0.0, 1.0 - jnp.abs(ix - lx[:, None]))  # [256, XW]
            tmp = jnp.einsum("ry,yxc->rxc", ohy, blk)  # [256, XW, C]
            return jnp.einsum("rx,rxc->rc", ohx, tmp)

        f = jax.vmap(jax.vmap(jax.vmap(one_window, in_axes=(None, 0, 0, 0, 0)), in_axes=(None, 0, 0, 0, 0)), in_axes=(0, 0, 0, 0, 0))
        out = f(img, y_start, x_start, gy, gx)  # [B3, S, 64, 256, C]
        return out

    timeit("windowed one-hot tent (coarse)", jax.jit(gs_windowed), img, proj)


if __name__ == "__main__":
    main()
