"""Gather timing with varying inputs (defeats any execution caching)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from invertavatar_tpu.ops.grid_sample import grid_sample


def timeit_varying(name, fn, make_args, iters=10):
    args = make_args(0)
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = []
    for i in range(iters):
        outs.append(fn(*make_args(i + 1)))
    jax.block_until_ready(outs)
    print(f"{name:44s} {(time.perf_counter()-t0)/iters*1000:8.2f} ms", flush=True)


def main():
    rng = np.random.RandomState(0)
    B3, H, W, C = 3, 256, 256, 32
    M = 128 * 128 * 48
    img = jnp.asarray(rng.randn(B3, H, W, C).astype(np.float32))
    grid_np = (rng.rand(B3, M, 2).astype(np.float32) * 2 - 1) * 0.9
    grid = jnp.asarray(grid_np)

    gs = jax.jit(grid_sample)

    # same inputs every call (tests whether the relay caches executions)
    timeit_varying("random coords, SAME inputs", gs, lambda i: (img, grid))
    # shifted coords per call
    shifts = [jnp.asarray(grid_np + 0.0001 * i) for i in range(12)]
    timeit_varying("random coords, varying", gs, lambda i: (img, shifts[i % 12]))

    # sorted / coherent coords, varying
    grid_sorted = np.sort(grid_np, axis=1)
    sorted_shifts = [jnp.asarray(grid_sorted + 0.0001 * i) for i in range(12)]
    timeit_varying("sorted coords, varying", gs, lambda i: (img, sorted_shifts[i % 12]))

    # bf16 payload
    img16 = img.astype(jnp.bfloat16)
    timeit_varying("random coords varying, bf16 img", gs, lambda i: (img16, shifts[i % 12]))


if __name__ == "__main__":
    main()
