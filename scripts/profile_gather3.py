"""Patch-gather payload-dtype variants: bf16 halves the HBM segments/point."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from invertavatar_tpu.ops.plane_sample import grid_sample_patch, pad_planes_for_patch

N, H, W, C = 3, 256, 256, 32
M = 128 * 128 * 48


def timeit_varying(name, fn, arg_sets, iters=10):
    out = fn(*arg_sets[0])
    np.asarray(out[0].ravel()[:1])
    t0 = time.perf_counter()
    outs = [fn(*arg_sets[(i + 1) % len(arg_sets)]) for i in range(iters)]
    np.asarray(outs[-1][0].ravel()[:1])
    for o in outs:
        jax.block_until_ready(o)
    print(f"{name:52s} {(time.perf_counter()-t0)/iters*1000:8.2f} ms", flush=True)
    return out


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    planes = jnp.asarray(rng.randn(N, H, W, C).astype(np.float32))
    grids = [
        jnp.asarray((np.random.RandomState(i).rand(N, M, 2).astype(np.float32) * 2 - 1) * 0.9)
        for i in range(4)
    ]

    variants = [
        ("patch f32 pad64 (default)", jnp.float32, 64),
        ("patch bf16 pad64", jnp.bfloat16, 64),
        ("patch bf16 pad128", jnp.bfloat16, 128),
        ("patch f32 pad32", jnp.float32, 32),
        ("patch bf16 pad32", jnp.bfloat16, 32),
    ]
    ref = None
    for name, dt, pad in variants:
        padded = pad_planes_for_patch(planes.astype(dt), channel_pad=pad)

        fn = jax.jit(lambda g, p=padded: grid_sample_patch(p, g, C).astype(jnp.float32))
        out = timeit_varying(name, fn, [(g,) for g in grids])
        if ref is None:
            ref = out
        else:
            err = float(jnp.max(jnp.abs(out - ref)))
            print(f"    max abs err vs f32: {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
