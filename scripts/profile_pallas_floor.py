"""Isolate the windowed kernel's ~40ms floor: DMA-only vs compute-only vs full."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RES, S, TILE = 128, 48, 16
N, H, W, C = 3, 256, 256, 32
WIN_R, WIN_C = 64, 52  # bf16 alignment


def make_kernel(mode):
    def _kernel(ys_ref, xsc_ref, plane_ref, gy_ref, gx_ref, out_ref, win, sems):
        g = pl.program_id(0)
        G = pl.num_programs(0)
        slot = jax.lax.rem(g, 2)
        P = gy_ref.shape[-1]

        def dma(step, sem_slot):
            ys = pl.multiple_of(ys_ref[step], 16)
            xsc = pl.multiple_of(xsc_ref[step], 128)
            return pltpu.make_async_copy(
                plane_ref.at[pl.ds(ys, WIN_R), pl.ds(xsc, WIN_C * C)],
                win.at[sem_slot], sems.at[sem_slot],
            )

        do_dma = mode in ("full", "dma_only")
        if do_dma:
            @pl.when(g == 0)
            def _():
                dma(0, 0).start()

            @pl.when(g + 1 < G)
            def _():
                dma(g + 1, 1 - slot).start()

        if mode == "dma_only":
            dma(g, slot).wait()
            col = jnp.sum(win[slot].astype(jnp.float32), axis=0, keepdims=True)[:, :C]
            out_ref[0, :, :] = jnp.zeros((P, C), jnp.float32) + col
            return

        ys_f = ys_ref[g].astype(jnp.float32)
        xs_f = (xsc_ref[g] // C).astype(jnp.float32)
        ly = gy_ref[0, 0, :] - ys_f
        lx = gx_ref[0, 0, :] - xs_f
        iy = jax.lax.broadcasted_iota(jnp.int32, (P, WIN_R), 1).astype(jnp.float32)
        ohy = jnp.maximum(0.0, 1.0 - jnp.abs(iy - ly[:, None]))
        ix = jax.lax.broadcasted_iota(jnp.int32, (P, WIN_C), 1).astype(jnp.float32)
        ohx_small = jnp.maximum(0.0, 1.0 - jnp.abs(ix - lx[:, None]))
        jx_e = jax.lax.broadcasted_iota(jnp.int32, (WIN_C, WIN_C * C), 1) // C
        x_e = jax.lax.broadcasted_iota(jnp.int32, (WIN_C, WIN_C * C), 0)
        expander = (jx_e == x_e).astype(jnp.bfloat16)

        if mode == "compute_only":
            blk = win[slot]  # stale garbage, no DMA
        else:
            dma(g, slot).wait()
            blk = win[slot]
        ohx = jax.lax.dot_general(ohx_small.astype(jnp.bfloat16), expander,
                                  (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        tmp = jax.lax.dot_general(ohy.astype(jnp.bfloat16), blk,
                                  (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        prod = tmp * ohx
        acc = prod[:, 0:128]
        for k in range(1, (WIN_C * C) // 128):
            acc = acc + prod[:, k * 128 : (k + 1) * 128]
        lane_c = jax.lax.broadcasted_iota(jnp.int32, (128, C), 0) % C
        ch = jax.lax.broadcasted_iota(jnp.int32, (128, C), 1)
        fold = (lane_c == ch).astype(jnp.bfloat16)
        out_ref[0, :, :] = jax.lax.dot_general(acc.astype(jnp.bfloat16), fold,
                                               (((1,), (0,)), ((), ())),
                                               preferred_element_type=jnp.float32)

    return _kernel


@functools.partial(jax.jit, static_argnames=("mode",))
def run_one(plane2d, ys, xsc, gy, gx, mode):
    G, P = gy.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, 1, P), lambda g, ys, xsc: (g, 0, 0)),
            pl.BlockSpec((1, 1, P), lambda g, ys, xsc: (g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, P, C), lambda g, ys, xsc: (g, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, WIN_R, WIN_C * C), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        make_kernel(mode), grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((G, P, C), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(ys, xsc, plane2d, gy.reshape(G, 1, P), gx.reshape(G, 1, P))


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    plane = jnp.asarray(rng.randn(H, W * C).astype(np.float32)).astype(jnp.bfloat16)
    t_side = RES // TILE
    T = t_side * t_side
    G = T * S
    P = TILE * TILE
    ys = jnp.asarray((rng.randint(0, (H - WIN_R) // 16, G) * 16).astype(np.int32))
    xs = jnp.asarray((rng.randint(0, (W - WIN_C) // 4, G) * 4 * C).astype(np.int32))
    gy = jnp.asarray(rng.rand(G, P).astype(np.float32) * 200)
    gx = jnp.asarray(rng.rand(G, P).astype(np.float32) * 200)

    # production wrapper for comparison (same workload, 3 planes)
    from invertavatar_tpu.ops.pallas_plane_sample import sample_planes_windowed_pallas
    planes3 = jnp.asarray(rng.randn(3, H, W, C).astype(np.float32))
    grid01 = jnp.asarray((rng.rand(3, RES * RES, S, 2) * 1.4 - 0.7).astype(np.float32))
    wf = jax.jit(lambda g: sample_planes_windowed_pallas(
        planes3, g, res=RES, tile=TILE, window=48, payload_dtype=jnp.bfloat16))
    out = wf(grid01); np.asarray(out[0, 0, 0, :1])
    t0 = time.perf_counter()
    outs = [wf(grid01 * (1 + 1e-6 * i)) for i in range(10)]
    np.asarray(outs[-1][0, 0, 0, :1]); jax.block_until_ready(outs)
    print(f"{'wrapper(3pl)':14s} {(time.perf_counter()-t0)/10*1000:8.2f} ms", flush=True)

    for mode in ("full", "dma_only", "compute_only"):
        f = lambda m=mode: run_one(plane, ys, xs, gy, gx, m)
        out = f(); np.asarray(out[0, 0, :1])
        t0 = time.perf_counter()
        outs = [f() for _ in range(10)]
        np.asarray(outs[-1][0, 0, :1]); jax.block_until_ready(outs)
        # ×3 to compare with the 3-plane numbers elsewhere
        print(f"{mode:14s} {(time.perf_counter()-t0)/10*1000*3:8.2f} ms (3-plane equiv)", flush=True)


if __name__ == "__main__" and not os.environ.get("GLUE"):
    main()


def glue_breakdown():
    """Time the wrapper's XLA glue (prologue + epilogue) separately."""
    import time as _t

    rng = np.random.RandomState(0)
    grid01 = jnp.asarray((rng.rand(3, RES * RES, S, 2) * 1.4 - 0.7).astype(np.float32))
    t_side = RES // TILE
    T = t_side * t_side

    @jax.jit
    def prologue(grid):
        Np = grid.shape[0]
        g = grid.reshape(Np, t_side, TILE, t_side, TILE, S, 2)
        g = jnp.transpose(g, (0, 1, 3, 5, 2, 4, 6)).reshape(Np, T, S, TILE * TILE, 2)
        gx = (g[..., 0] + 1.0) * (W * 0.5) - 0.5
        gy = (g[..., 1] + 1.0) * (H * 0.5) - 0.5
        xs = jnp.clip(jnp.floor(jnp.min(gx, axis=-1)).astype(jnp.int32) - 1, 0, W - 56)
        ys = jnp.clip(jnp.floor(jnp.min(gy, axis=-1)).astype(jnp.int32) - 1, 0, H - 64)
        return gx, gy, (ys // 16) * 16, (xs // 4) * 4

    @jax.jit
    def epilogue(outs):
        out = jnp.stack(outs)
        out = out.reshape(3, t_side, t_side, S, 1, TILE, TILE, C)
        return jnp.transpose(out, (0, 1, 5, 2, 6, 3, 4, 7)).reshape(3, RES * RES, S, C)

    outs3 = [jnp.asarray(rng.rand(T * S, TILE * TILE, C).astype(np.float32)) for _ in range(3)]

    for name, f, args in [("prologue", prologue, (grid01,)), ("epilogue", epilogue, (outs3,))]:
        o = f(*args); jax.block_until_ready(o); np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[:1])
        t0 = _t.perf_counter()
        res = [f(*args) for _ in range(10)]
        np.asarray(jax.tree_util.tree_leaves(res[-1])[0].ravel()[:1]); jax.block_until_ready(res)
        print(f"{name:14s} {(_t.perf_counter()-t0)/10*1000:8.2f} ms", flush=True)


if __name__ == "__main__" and os.environ.get("GLUE"):
    glue_breakdown()
