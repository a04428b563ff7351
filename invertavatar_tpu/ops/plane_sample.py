"""Fast tri-plane bilinear sampling paths for the volume renderer.

The naive formulation (4 row-gathers per point, ops/grid_sample.py) is
latency-bound on TPU: the gather engine retires one 256–512 B slice every
~7 ns regardless of locality, costing ~100 ms per render pass at the flagship
config. Two exact replacements:

  * `grid_sample_patch`: ONE `lax.gather` of a 2×2×C patch per point over
    spatially-padded, channel-padded (C→64) planes — 4× fewer, 4× larger
    slices (~1.5–2× faster). Exact bilinear with zero padding; used for
    arbitrary point sets (importance pass, sample_mixed).

  * `sample_planes_coarse_windowed`: exploits the coarse pass's structure —
    points are (ray-tile × depth-stratum) blocks whose plane-space footprint
    is a small window (ray divergence over a 16×16-pixel tile at the
    reference's 18.8° FOV spans <28 texels; one stratum spans <8 texels of
    depth). Each (plane, tile, stratum) extracts its window with a
    `dynamic_slice` (big efficient DMAs) and evaluates bilinear weights as
    tent-function contractions on the MXU — no per-point gather at all.
    Exact as long as the footprint fits the window; `window` is sized from
    camera geometry with margin (see `coarse_window_for`).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def pad_planes_for_patch(planes: jnp.ndarray, channel_pad: int = 64) -> jnp.ndarray:
    """[N, H, W, C] -> spatially +1-padded, channel-padded planes."""
    N, H, W, C = planes.shape
    pc = max(channel_pad - C, 0)
    return jnp.pad(planes, ((0, 0), (1, 1), (1, 1), (0, pc)))


def grid_sample_patch(
    planes_padded: jnp.ndarray,  # [N, H+2, W+2, Cp] from pad_planes_for_patch
    grid: jnp.ndarray,  # [N, M, 2] xy in [-1, 1]
    out_channels: int,
) -> jnp.ndarray:
    """Exact bilinear (align_corners=False, zeros padding) via one patch gather."""
    N, Hp, Wp, Cp = planes_padded.shape
    H, W = Hp - 2, Wp - 2
    gx = (grid[..., 0].astype(jnp.float32) + 1.0) * (W * 0.5) - 0.5
    gy = (grid[..., 1].astype(jnp.float32) + 1.0) * (H * 0.5) - 0.5
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    wx = (gx - x0)[..., None]
    wy = (gy - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    vx0 = (x0i >= 0) & (x0i < W)
    vx1 = (x0i + 1 >= 0) & (x0i + 1 < W)
    vy0 = (y0i >= 0) & (y0i < H)
    vy1 = (y0i + 1 >= 0) & (y0i + 1 < H)

    starts = jnp.stack(
        [jnp.clip(y0i + 1, 0, Hp - 2), jnp.clip(x0i + 1, 0, Wp - 2)], axis=-1
    )
    dnums = lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(), start_index_map=(0, 1)
    )

    def one(op, idx):
        return lax.gather(
            op, idx, dnums, slice_sizes=(2, 2, Cp), mode=lax.GatherScatterMode.CLIP
        )

    patch = jax.vmap(one)(planes_padded, starts)  # [N, M, 2, 2, Cp]
    dt = patch.dtype
    out = (
        patch[:, :, 0, 0] * ((vy0 & vx0)[..., None] * (1 - wx) * (1 - wy)).astype(dt)
        + patch[:, :, 0, 1] * ((vy0 & vx1)[..., None] * wx * (1 - wy)).astype(dt)
        + patch[:, :, 1, 0] * ((vy1 & vx0)[..., None] * (1 - wx) * wy).astype(dt)
        + patch[:, :, 1, 1] * ((vy1 & vx1)[..., None] * wx * wy).astype(dt)
    )
    return out[..., :out_channels]


def coarse_window_for(resolution: int, tile: int = 16) -> int:
    """Window size covering a ray-tile × stratum footprint with margin.

    At the reference camera (normalized focal ~4.26, depth ≤ 3.3, box_warp 1,
    256² planes) a 16/128 ray-tile spans ≤ 25 texels; a stratum spans ≤ 8
    texels of depth. 48 is a comfortable bound for tiles up to 16 rays at
    128² (scaled for other render resolutions).
    """
    frac = tile / max(resolution, 1)
    texels = int(math.ceil(frac * 0.25 * 3.4 * 2 * 128))
    # +4: bilinear taps (+1 each side), start-floor (-1), one texel of slack.
    # Measured worst-case span at the flagship geometry is 24.1 texels
    # (frontal AND a 30°-yaw orbit camera; scripts r2) vs the 27.2 bound —
    # no 16-rounding here, the kernel wrapper aligns win_r/win_c itself.
    return max(16, min(128, texels + 4))


def coarse_window_rect(resolution: int, th: int, tw: int) -> Tuple[int, int]:
    """Per-axis window bound for a rectangular th×tw pixel tile.

    Same geometry bound as `coarse_window_for`, applied independently per
    image axis: a tile's plane-space footprint along an axis scales with its
    pixel extent along that axis (ray divergence is isotropic at the shipped
    cameras). Tall-thin tiles (e.g. 64×4) shrink the window's LANE extent —
    the dominant per-step cost in the fused Pallas kernels — while the extra
    window rows ride the same DMA and stay under one MXU K-pass.
    """
    span = 0.25 * 3.4 * 2 * 128 / max(resolution, 1)
    wy = max(12, min(192, int(math.ceil(th * span)) + 4))
    wx = max(12, min(192, int(math.ceil(tw * span)) + 4))
    return wy, wx


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def sample_planes_windowed_cvjp(
    planes: jnp.ndarray,  # [N, H, W, C]
    grid: jnp.ndarray,  # [N, R, S, 2] plane-space xy in [-1, 1]
    res: int,
    tile: int = 16,
    window: int = 48,
    use_pallas: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """Differentiable windowed sampling: Pallas forward, block-granular backward.

    The training render cannot ride the Pallas samplers directly (no VJP is
    registered for a pallas_call), so grad-carrying passes historically fell
    back to the per-point patch gather whose backward is a per-tap TPU
    scatter-add. This wrapper gives the structured formulation a custom VJP:

      forward  = `sample_planes_windowed_pallas` (fp32/HIGHEST exact kernel;
                 the XLA windowed formulation off-TPU), bitwise-comparable to
                 `sample_planes_coarse_windowed` up to float add order;
      backward = `jax.linear_transpose` of `sample_planes_coarse_windowed`
                 w.r.t. planes — sampling is LINEAR in the planes, so the
                 transpose is the exact gradient and never re-runs a forward.
                 XLA transposes the window `dynamic_slice` into a window-block
                 scatter-add (T·S blocks of win²·C) instead of R·S·4 per-tap
                 scatters, and the tent einsums into plain matmuls.

    The `grid` cotangent is defined as ZERO: every training caller's ray grid
    is parameter-free (cameras are data; importance depths are stop_gradient
    — renderer.py:555), so no gradient may flow through it. Do not use this
    op anywhere coordinates require gradients.
    """
    if use_pallas and (jax.devices()[0].platform == "tpu" or interpret):
        from .pallas_plane_sample import sample_planes_windowed_pallas

        out = sample_planes_windowed_pallas(
            planes, grid, res=res, tile=tile, window=window,
            payload_dtype=jnp.float32, exact=True, interpret=interpret,
        )
        # kernel returns [N, R, S, C]; match the XLA formulation's shape
        return out
    return sample_planes_coarse_windowed(planes, grid, res=res, tile=tile, window=window)


def _cvjp_fwd(planes, grid, res, tile, window, use_pallas, interpret):
    out = sample_planes_windowed_cvjp(planes, grid, res, tile, window, use_pallas, interpret)
    return out, (grid, jax.ShapeDtypeStruct(planes.shape, planes.dtype))


def windowed_sample_transpose(
    grid: jnp.ndarray,  # [N, R, S, 2]
    cot: jnp.ndarray,  # [N, R, S, C]
    planes_shape: Tuple[int, int, int, int],
    res: int,
    tile: int,
    window: int,
) -> jnp.ndarray:
    """Exact transpose of the windowed bilinear sampler w.r.t. the planes.

    d plane[y, x, c] = Σ_p ohy[p, y]·ohx[p, x]·cot[p, c] per block, placed at
    the block's window start — the same tents as the forward, accumulated as
    T·S window-block scatter-adds (each a win²·C dense update) instead of the
    patch gather's R·S·4 per-tap scatters.
    """
    N, H, W, C = planes_shape
    R, S = grid.shape[1], grid.shape[2]
    assert R == res * res and res % tile == 0
    t_side = res // tile
    T = t_side * t_side
    P = tile * tile

    g = grid.reshape(N, t_side, tile, t_side, tile, S, 2)
    g = jnp.transpose(g, (0, 1, 3, 2, 4, 5, 6)).reshape(N, T, P, S, 2)
    gx = (g[..., 0].astype(jnp.float32) + 1.0) * (W * 0.5) - 0.5  # [N, T, P, S]
    gy = (g[..., 1].astype(jnp.float32) + 1.0) * (H * 0.5) - 0.5
    xs = jnp.clip(jnp.floor(jnp.min(gx, axis=2)).astype(jnp.int32) - 1, 0, W - window)
    ys = jnp.clip(jnp.floor(jnp.min(gy, axis=2)).astype(jnp.int32) - 1, 0, H - window)

    c = cot.reshape(N, t_side, tile, t_side, tile, S, C)
    c = jnp.transpose(c, (0, 1, 3, 2, 4, 5, 6)).reshape(N, T, P, S, C)

    gx_s = jnp.transpose(gx, (0, 1, 3, 2)).reshape(N * T, S, P)
    gy_s = jnp.transpose(gy, (0, 1, 3, 2)).reshape(N * T, S, P)
    cot_s = jnp.transpose(c, (0, 1, 3, 2, 4)).reshape(N * T, S, P, C)
    ys_f = ys.reshape(N * T, S)
    xs_f = xs.reshape(N * T, S)
    n_ids = jnp.repeat(jnp.arange(N, dtype=jnp.int32), T)  # [N*T]

    dnums = lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2, 3),
        inserted_window_dims=(0,),
        scatter_dims_to_operand_dims=(0, 1, 2),
    )

    def tents(lv, start, size):  # lv [U, P] local coords; -> [U, P, window]
        it = lax.broadcasted_iota(jnp.float32, (P, window), 1)
        oh = jnp.maximum(0.0, 1.0 - jnp.abs(it[None] - lv[..., None]))
        abs_pos = it[None] + start[:, None, None].astype(jnp.float32)
        return oh * ((abs_pos >= 0) & (abs_pos < size))

    def one_stratum(acc, args):
        gy_u, gx_u, cot_u, ys_u, xs_u = args  # [U, P(,C)], [U]
        ohy = tents(gy_u - ys_u[:, None].astype(jnp.float32), ys_u, H)  # [U, P, win]
        ohx = tents(gx_u - xs_u[:, None].astype(jnp.float32), xs_u, W)
        # blk[y, x, c] = Σ_p ohy[p,y] · ohx[p,x] · cot[p,c]
        pxc = jnp.einsum("upx,upc->upxc", ohx, cot_u)
        blk = jnp.einsum("upy,upxc->uyxc", ohy, pxc)  # [U, win, win, C]
        idx = jnp.stack([n_ids, ys_u, xs_u], axis=-1)  # [U, 3]
        acc = lax.scatter_add(
            acc, idx, blk.astype(acc.dtype), dnums,
            indices_are_sorted=False, unique_indices=False,
        )
        return acc, None

    init = jnp.zeros((N, H, W, C), cot.dtype)
    out, _ = lax.scan(
        one_stratum,
        init,
        (
            jnp.moveaxis(gy_s, 1, 0),  # [S, U, P]
            jnp.moveaxis(gx_s, 1, 0),
            jnp.moveaxis(cot_s, 1, 0),  # [S, U, P, C]
            jnp.moveaxis(ys_f, 1, 0),  # [S, U]
            jnp.moveaxis(xs_f, 1, 0),
        ),
    )
    return out


def _cvjp_bwd(res, tile, window, use_pallas, interpret, residual, cot):
    grid, planes_sds = residual
    g_planes = windowed_sample_transpose(
        grid, cot.astype(planes_sds.dtype), planes_sds.shape, res, tile, window
    ).astype(planes_sds.dtype)
    return g_planes, jnp.zeros_like(grid)


sample_planes_windowed_cvjp.defvjp(_cvjp_fwd, _cvjp_bwd)


def sample_planes_coarse_windowed(
    planes: jnp.ndarray,  # [N=B*3, H, W, C]
    grid: jnp.ndarray,  # [N, R, S, 2] plane-space xy in [-1,1]; rays row-major res×res
    res: int,  # render resolution (res*res == R)
    tile: int = 16,
    window: int = 48,
    s_chunk: int = 8,
) -> jnp.ndarray:
    """Windowed exact bilinear for structured (ray-tile × stratum) points.

    Returns [N, R, S, C]. Taps outside a block's window contribute zero (the
    window is sized so this never happens for in-spec cameras; out-of-plane
    taps are zero by the same mechanism, matching zeros padding).
    """
    N, H, W, C = planes.shape
    R, S = grid.shape[1], grid.shape[2]
    assert R == res * res and res % tile == 0
    t_side = res // tile
    T = t_side * t_side
    P = tile * tile  # rays per tile

    # [N, R, S, 2] -> [N, T, P, S, 2]
    g = grid.reshape(N, t_side, tile, t_side, tile, S, 2)
    g = jnp.transpose(g, (0, 1, 3, 2, 4, 5, 6)).reshape(N, T, P, S, 2)
    gx = (g[..., 0].astype(jnp.float32) + 1.0) * (W * 0.5) - 0.5  # [N, T, P, S]
    gy = (g[..., 1].astype(jnp.float32) + 1.0) * (H * 0.5) - 0.5

    # per (N, T, S) window starts
    x_min = jnp.min(gx, axis=2)  # [N, T, S]
    y_min = jnp.min(gy, axis=2)
    xs = jnp.clip(jnp.floor(x_min).astype(jnp.int32) - 1, 0, W - window)
    ys = jnp.clip(jnp.floor(y_min).astype(jnp.int32) - 1, 0, H - window)

    gx_s = jnp.transpose(gx, (0, 1, 3, 2))  # [N, T, S, P]
    gy_s = jnp.transpose(gy, (0, 1, 3, 2))

    def block(plane, ys_i, xs_i, gy_b, gx_b):
        # plane [H, W, C]; gy_b/gx_b [P]
        blk = lax.dynamic_slice(plane, (ys_i, xs_i, 0), (window, window, C))
        ly = gy_b - ys_i  # [P] local coords
        lx = gx_b - xs_i
        iy = lax.broadcasted_iota(jnp.float32, (P, window), 1)
        # tent weights == bilinear; zero for taps outside the window.
        # in-plane validity: absolute tap position must be inside [0, size)
        ay = iy + ys_i
        ohy = jnp.maximum(0.0, 1.0 - jnp.abs(iy - ly[:, None]))
        ohy = ohy * ((ay >= 0) & (ay < H))
        ix = lax.broadcasted_iota(jnp.float32, (P, window), 1)
        ax = ix + xs_i
        ohx = jnp.maximum(0.0, 1.0 - jnp.abs(ix - lx[:, None]))
        ohx = ohx * ((ax >= 0) & (ax < W))
        prec = lax.Precision.HIGHEST if blk.dtype == jnp.float32 else None
        tmp = jnp.einsum("py,yxc->pxc", ohy.astype(blk.dtype), blk, precision=prec)
        return jnp.einsum("px,pxc->pc", ohx.astype(blk.dtype), tmp, precision=prec)

    block_t = jax.vmap(block, in_axes=(None, 0, 0, 0, 0))  # over T

    def per_schunk(args):
        ys_c, xs_c, gy_c, gx_c = args  # [N, T, sc, ...]
        def per_n(plane, ys_n, xs_n, gy_n, gx_n):
            # vmap over the s-chunk
            return jax.vmap(
                lambda ys_s, xs_s, gy_s_, gx_s_: block_t(plane, ys_s, xs_s, gy_s_, gx_s_),
                in_axes=(1, 1, 1, 1),
            )(ys_n, xs_n, gy_n, gx_n)  # [sc, T, P, C]
        return jax.vmap(per_n)(planes, ys_c, xs_c, gy_c, gx_c)  # [N, sc, T, P, C]

    n_chunks = -(-S // s_chunk)
    pad_s = n_chunks * s_chunk - S
    def pad(x, axis):
        if pad_s == 0:
            return x
        cfg = [(0, 0)] * x.ndim
        cfg[axis] = (0, pad_s)
        return jnp.pad(x, cfg, mode="edge")

    ys_p = pad(ys, 2).reshape(N, T, n_chunks, s_chunk)
    xs_p = pad(xs, 2).reshape(N, T, n_chunks, s_chunk)
    gy_p = pad(gy_s, 2).reshape(N, T, n_chunks, s_chunk, P)
    gx_p = pad(gx_s, 2).reshape(N, T, n_chunks, s_chunk, P)

    out = lax.map(
        per_schunk,
        (
            jnp.moveaxis(ys_p, 2, 0),
            jnp.moveaxis(xs_p, 2, 0),
            jnp.moveaxis(gy_p, 2, 0),
            jnp.moveaxis(gx_p, 2, 0),
        ),
    )  # [n_chunks, N, sc, T, P, C]
    out = jnp.moveaxis(out, 0, 1).reshape(N, n_chunks * s_chunk, T, P, C)[:, :S]
    # [N, S, T, P, C] -> [N, R, S, C]
    out = out.reshape(N, S, t_side, t_side, tile, tile, C)
    out = jnp.transpose(out, (0, 2, 4, 3, 5, 1, 6)).reshape(N, R, S, C)
    return out
