"""Pallas windowed sampler v2: bf16 payload + double-buffered DMA timings.

Run on the real TPU (axon). Compares against the patch-gather default for
both exactness and speed at the flagship coarse-pass shape.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from invertavatar_tpu.ops.plane_sample import grid_sample_patch, pad_planes_for_patch
from invertavatar_tpu.ops.pallas_plane_sample import sample_planes_windowed_pallas

RES, S, TILE = 128, 48, 16
N, H, W, C = 3, 256, 256, 32


def make_grid(rng, spread=0.9):
    """Structured ray-tile grids: smooth over the image, small per-stratum."""
    yy, xx = np.mgrid[0:RES, 0:RES].astype(np.float32) / RES
    base = np.stack([(xx * 2 - 1) * spread, (yy * 2 - 1) * spread], -1).reshape(1, RES * RES, 1, 2)
    depth = np.linspace(-0.06, 0.06, S, dtype=np.float32).reshape(1, 1, S, 1)
    g = base + depth + rng.randn(N, 1, 1, 2).astype(np.float32) * 0.01
    return np.clip(g, -0.99, 0.99).astype(np.float32)


def timeit_varying(name, fn, arg_sets, iters=10):
    out = fn(*arg_sets[0])
    np.asarray(jax.tree_util.tree_leaves(out)[0][0].ravel()[:1])  # force through relay
    t0 = time.perf_counter()
    outs = []
    for i in range(iters):
        outs.append(fn(*arg_sets[(i + 1) % len(arg_sets)]))
    np.asarray(jax.tree_util.tree_leaves(outs[-1])[0][0].ravel()[:1])
    for o in outs:
        jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:52s} {dt:8.2f} ms", flush=True)
    return out


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    planes = jnp.asarray(rng.randn(N, H, W, C).astype(np.float32))
    grids = [jnp.asarray(make_grid(np.random.RandomState(i))) for i in range(4)]

    # reference: patch gather
    padded = pad_planes_for_patch(planes)

    @jax.jit
    def patch(g):
        return grid_sample_patch(padded, g.reshape(N, -1, 2), C).reshape(N, RES * RES, S, C)

    ref = timeit_varying("patch gather (default)", patch, [(g,) for g in grids])

    for name, kw in [
        ("pallas f32 HIGHEST dbuf", dict(payload_dtype=jnp.float32, exact=True)),
        ("pallas f32 default-prec dbuf", dict(payload_dtype=jnp.float32, exact=False)),
        ("pallas bf16 dbuf", dict(payload_dtype=jnp.bfloat16)),
    ]:
        try:
            fn = jax.jit(
                lambda g, kw=kw: sample_planes_windowed_pallas(
                    planes, g, res=RES, tile=TILE, window=48, **kw
                )
            )
            out = timeit_varying(name, fn, [(g,) for g in grids])
            err = float(jnp.max(jnp.abs(out - patch(grids[0]))))
            rel = err / float(jnp.max(jnp.abs(ref)))
            print(f"    max abs err vs patch: {err:.2e} (rel {rel:.2e})", flush=True)
        except Exception as e:
            print(f"    {name} FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)

    # smaller tiles (more steps, smaller windows)
    for tile, window in [(8, 32), (16, 64)]:
        try:
            fn = jax.jit(
                lambda g, t=tile, w=window: sample_planes_windowed_pallas(
                    planes, g, res=RES, tile=t, window=w, payload_dtype=jnp.bfloat16
                )
            )
            out = timeit_varying(f"pallas bf16 tile={tile} win={window}", fn, [(g,) for g in grids])
            err = float(jnp.max(jnp.abs(out - patch(grids[0]))))
            print(f"    max abs err vs patch: {err:.2e}", flush=True)
        except Exception as e:
            print(f"    tile={tile} FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__" and not os.environ.get("GROUPS_SWEEP") and not os.environ.get("PROBE"):
    main()


def extra_groups():
    print("== s_group sweep ==", flush=True)
    rng = np.random.RandomState(0)
    planes = jnp.asarray(rng.randn(N, H, W, C).astype(np.float32))
    grids = [jnp.asarray(make_grid(np.random.RandomState(i))) for i in range(4)]
    padded = pad_planes_for_patch(planes)

    @jax.jit
    def patch(g):
        return grid_sample_patch(padded, g.reshape(N, -1, 2), C).reshape(N, RES * RES, S, C)

    ref = patch(grids[0])
    for grp, window in [(2, 56), (4, 72), (8, 104), (2, 64), (4, 80)]:
        try:
            fn = jax.jit(
                lambda g, gr=grp, w=window: sample_planes_windowed_pallas(
                    planes, g, res=RES, tile=TILE, window=w,
                    payload_dtype=jnp.bfloat16, s_group=gr,
                )
            )
            out = timeit_varying(f"pallas bf16 s_group={grp} win={window}", fn, [(g,) for g in grids])
            err = float(jnp.max(jnp.abs(out - ref)))
            print(f"    max abs err vs patch: {err:.2e}", flush=True)
        except Exception as e:
            print(f"    s_group={grp} FAILED: {type(e).__name__}: {str(e)[:250]}", flush=True)


if __name__ == "__main__" and os.environ.get("GROUPS_SWEEP"):
    extra_groups()


def timing_probe():
    """Timing-only probe (window too small for exactness): locates the
    kernel bottleneck by scaling window dims."""
    print("== timing probe ==", flush=True)
    rng = np.random.RandomState(0)
    planes = jnp.asarray(rng.randn(N, H, W, C).astype(np.float32))
    grids = [jnp.asarray(make_grid(np.random.RandomState(i))) for i in range(4)]
    for window in [16, 32, 48, 80]:
        fn = jax.jit(
            lambda g, w=window: sample_planes_windowed_pallas(
                planes, g, res=RES, tile=TILE, window=w, payload_dtype=jnp.bfloat16
            )
        )
        timeit_varying(f"probe bf16 window={window}", fn, [(g,) for g in grids])


if __name__ == "__main__" and os.environ.get("PROBE"):
    timing_probe()
