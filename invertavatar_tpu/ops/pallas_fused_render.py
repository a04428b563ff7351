"""Pallas TPU kernel: fused tri-plane sampling + OSG decoder MLP.

The flagship volume-render cost (SURVEY §7 hard-part #1) is dominated by the
tri-plane feature lookup. The v2 windowed kernel (`pallas_plane_sample.py`)
runs one grid step per (plane × ray-tile × stratum) and is per-step-overhead
bound (~6 µs/step over 9216 steps). This kernel fuses the whole point pipeline
of reference `renderer.py:353-363` + `triplane_v20.py:426-438` into one step
per (ray-tile × stratum):

  1. async-copy the three plane windows HBM→VMEM (double-buffered),
  2. per plane: bilinear tent contraction on the MXU (v2's compact-weight
     expander + lane-fold formulation),
  3. mean over the 3 planes (the OSGDecoder reduction),
  4. the 32→64-softplus→33 decoder MLP on the MXU, MipNeRF sigmoid clamp,

so per-point features never leave VMEM and the step count drops 3×. Output is
the decoder's (sigma, rgb) directly — the XLA side goes straight to the ray
marcher.

Eval-only fast path: no custom VJP (training uses the XLA-composed sampler).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# ---------------------------------------------------------------- FLOP ledger
# XLA's HLO cost analysis cannot see inside a pallas_call (its FLOPs count as
# ZERO), so any MFU derived from cost analysis alone massively undercounts a
# frame whose dominant compute lives in these kernels. The wrappers below
# record their actual matmul FLOPs (from the same dims the kernels launch
# with) into this ledger AT TRACE TIME; bench.py traces the frame once with
# the ledger armed and adds the total to the XLA-counted FLOPs.
_FLOPS_LEDGER = None


def start_flops_ledger():
    global _FLOPS_LEDGER
    _FLOPS_LEDGER = []


def stop_flops_ledger() -> float:
    """Total kernel matmul FLOPs recorded since `start_flops_ledger`."""
    global _FLOPS_LEDGER
    total = float(sum(_FLOPS_LEDGER or []))
    _FLOPS_LEDGER = None
    return total


def ledger_add(flops: float):
    if _FLOPS_LEDGER is not None:
        _FLOPS_LEDGER.append(float(flops))


def _tile_shape(tile):
    """Normalize the tile argument: int -> square, (th, tw) -> rectangular.

    Rectangular (tall × thin in PIXEL space) tiles trade window rows for
    window LANES: the per-step tent matmul streams [P, win_r] × [win_r,
    win_c*C], and its cost scales with the lane width win_c*C far more than
    with win_r (K stays under one MXU pass; the ohx tent build is pure VPU
    lane work). A 64×4 pixel tile needs only ~16 texel columns vs 36 for
    16×16 — same P, same exactness guarantee (the window still bounds the
    footprint per axis), ~2× fewer lanes.
    """
    if isinstance(tile, (tuple, list)):
        th, tw = int(tile[0]), int(tile[1])
    else:
        th = tw = int(tile)
    return th, tw


def _window_shape(window):
    """Normalize the window argument: int -> square, (wy, wx) -> per-axis."""
    if isinstance(window, (tuple, list)):
        return int(window[0]), int(window[1])
    return int(window), int(window)


def _tent_contract(blk, gy, gx, ys_f, xs_f, *, P, win_r, win_c, C, H, W, exact):
    """Bilinear interpolation of P points from a [win_r, win_c*C] window.

    Same math as pallas_plane_sample._kernel: compact tent weights on the VPU,
    lane expansion + row contraction + channel fold on the MXU.
    Returns [P, C] fp32.
    """
    dt = blk.dtype
    ly = gy - ys_f  # [P] window-local continuous coords
    lx = gx - xs_f

    # No explicit in-bounds masks: the window is clipped to lie fully inside
    # the plane, so every window texel is valid, and any tent tap OUTSIDE the
    # window (points near/beyond the plane border) is simply absent from the
    # contraction — which IS the zeros-padding semantics. Exactness holds
    # provided footprints fit the window (the standing windowed-kernel
    # contract, coarse_window_for).
    iy = jax.lax.broadcasted_iota(jnp.int32, (P, win_r), 1).astype(jnp.float32)
    ohy = jnp.maximum(0.0, 1.0 - jnp.abs(iy - ly[:, None]))

    # x tent weights computed DIRECTLY at full lane width [P, win_c*C] from an
    # iota — replaces the former compact-[P, win_c] + 0/1-expander-matmul
    # (K=win_c MXU pass) formulation: ~18% faster per step and exact fp32
    # weights instead of a bf16-rounded expansion
    jx_full = jax.lax.broadcasted_iota(jnp.int32, (P, win_c * C), 1)
    if C & (C - 1) == 0:
        jx_full = jx_full >> int(C.bit_length() - 1)
    else:
        jx_full = jx_full // C
    ohx = jnp.maximum(0.0, 1.0 - jnp.abs(jx_full.astype(jnp.float32) - lx[:, None]))

    prec = jax.lax.Precision.HIGHEST if exact else None
    tmp = jax.lax.dot_general(
        ohy.astype(dt), blk,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    )  # [P, win_c*C] fp32
    prod = tmp * ohx

    lanes = win_c * C
    if lanes % 128 == 0 and 128 % C == 0:
        acc = prod[:, 0:128]
        for k in range(1, lanes // 128):
            acc = acc + prod[:, k * 128 : (k + 1) * 128]
        lane_c = jax.lax.broadcasted_iota(jnp.int32, (128, C), 0) % C
        ch = jax.lax.broadcasted_iota(jnp.int32, (128, C), 1)
        fold = (lane_c == ch).astype(dt)
        return jax.lax.dot_general(
            acc.astype(dt), fold,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )
    lane_c = jax.lax.broadcasted_iota(jnp.int32, (lanes, C), 0) % C
    ch = jax.lax.broadcasted_iota(jnp.int32, (lanes, C), 1)
    sel = (lane_c == ch).astype(dt)
    return jax.lax.dot_general(
        prod.astype(dt), sel,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    )


def _kernel(
    ys_ref,  # scalar prefetch [3, G] int32 window row starts per plane
    xsc_ref,  # scalar prefetch [3, G] int32 col starts × C (flattened cols)
    planes_ref,  # [3, H, W*C]: HBM (windowed mode) or VMEM block (resident mode)
    gy_ref,  # [1, 3, P] fp32 absolute pixel rows per plane
    gx_ref,  # [1, 3, P]
    w1_ref,  # [C, HID] effective fc0 weight (gain folded)
    b1_ref,  # [1, HID]
    w2_ref,  # [HID, O] effective fc1 weight
    b2_ref,  # [1, O]
    out_ref,  # [1, P, O]: lane 0 = raw sigma, lanes 1: = clamped-sigmoid rgb
    win,  # scratch [2, 3, WIN_R, WIN_C*C] double buffer (None in resident mode)
    sems,  # DMA semaphores (2, 3) (None in resident mode)
    *,
    win_r: int,
    win_c: int,
    P: int,
    C: int,
    H: int,
    W: int,
    exact: bool,
    resident: bool = False,
):
    g = pl.program_id(0)
    G = pl.num_programs(0)
    slot = jax.lax.rem(g, 2)
    dt = planes_ref.dtype
    row_align = 8 if dt == jnp.float32 else 16

    def dma(step, sem_slot, p):
        ys = pl.multiple_of(ys_ref[p, step], row_align)
        xsc = pl.multiple_of(xsc_ref[p, step], 128)
        return pltpu.make_async_copy(
            planes_ref.at[p, pl.ds(ys, win_r), pl.ds(xsc, win_c * C)],
            win.at[sem_slot, p],
            sems.at[sem_slot, p],
        )

    if not resident:
        @pl.when(g == 0)
        def _():
            for p in range(3):
                dma(0, 0, p).start()

        @pl.when(g + 1 < G)
        def _():
            for p in range(3):
                dma(g + 1, 1 - slot, p).start()

    acc = jnp.zeros((P, C), jnp.float32)
    for p in range(3):
        ys_f = ys_ref[p, g].astype(jnp.float32)
        xs_f = (xsc_ref[p, g] // C).astype(jnp.float32)
        gy = gy_ref[0, p, :]
        gx = gx_ref[0, p, :]
        if resident:
            # whole plane set lives in VMEM (12.6 MB bf16 at the flagship
            # geometry): slice the window directly — no DMA, no wait
            ys_i = pl.multiple_of(ys_ref[p, g], row_align)
            xsc_i = pl.multiple_of(xsc_ref[p, g], 128)
            blk = planes_ref[p, pl.ds(ys_i, win_r), pl.ds(xsc_i, win_c * C)]
        else:
            dma(g, slot, p).wait()
            blk = win[slot, p]
        acc = acc + _tent_contract(
            blk, gy, gx, ys_f, xs_f,
            P=P, win_r=win_r, win_c=win_c, C=C, H=H, W=W, exact=exact,
        )

    x = acc * (1.0 / 3.0)  # OSGDecoder mean over planes (triplane_v20.py:429)
    # the MLP stays fp32 even on the bf16 fast path — it is tiny (K=32/64) and
    # fp32 here keeps the fast path's error in the payload, not the decoder
    prec = jax.lax.Precision.HIGHEST if exact else None
    h = jax.lax.dot_general(
        x, w1_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    ) + b1_ref[0, :][None, :]
    h = jax.nn.softplus(h)
    o = jax.lax.dot_general(
        h, w2_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    ) + b2_ref[0, :][None, :]
    sigma = o[:, 0:1]
    rgb = jax.nn.sigmoid(o[:, 1:]) * (1 + 2 * 0.001) - 0.001
    out_ref[0, :, :] = jnp.concatenate([sigma, rgb], axis=-1).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("win_r", "win_c", "C", "H", "W", "O", "exact", "out_dtype", "interpret",
                     "resident"),
)
def _fused_call(planes3, ys, xsc, gy, gx, w1, b1, w2, b2,
                win_r: int, win_c: int, C: int, H: int, W: int, O: int, exact: bool,
                out_dtype=jnp.float32, interpret: bool = False, resident: bool = False):
    _, G, P = gy.shape  # gy: [3, G, P] -> rearranged to [G, 3, P] blocks
    gy = jnp.transpose(gy, (1, 0, 2))
    gx = jnp.transpose(gx, (1, 0, 2))
    HID = w1.shape[1]
    H_, WC = planes3.shape[1], planes3.shape[2]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(G,),
        in_specs=[
            # resident: one constant VMEM block holding the whole plane set
            # (fetched once, revisited every step); windowed: planes in HBM
            pl.BlockSpec((3, H_, WC), lambda g, ys, xsc: (0, 0, 0))
            if resident
            else pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 3, P), lambda g, ys, xsc: (g, 0, 0)),
            pl.BlockSpec((1, 3, P), lambda g, ys, xsc: (g, 0, 0)),
            pl.BlockSpec((C, HID), lambda g, ys, xsc: (0, 0)),
            pl.BlockSpec((1, HID), lambda g, ys, xsc: (0, 0)),
            pl.BlockSpec((HID, O), lambda g, ys, xsc: (0, 0)),
            pl.BlockSpec((1, O), lambda g, ys, xsc: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, P, O), lambda g, ys, xsc: (g, 0, 0)),
        scratch_shapes=[]
        if resident
        else [
            pltpu.VMEM((2, 3, win_r, win_c * C), planes3.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )
    kernel = functools.partial(
        _kernel, win_r=win_r, win_c=win_c, P=P, C=C, H=H, W=W, exact=exact,
        resident=resident,
    )
    if resident:
        kernel = functools.partial(kernel, win=None, sems=None)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((G, P, O), out_dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(ys, xsc, planes3, gy, gx, w1.astype(jnp.float32), b1.reshape(1, -1).astype(jnp.float32),
      w2.astype(jnp.float32), b2.reshape(1, -1).astype(jnp.float32))


def fused_render_pallas(
    planes: jnp.ndarray,  # [3, H, W, C] (single batch item)
    grid: jnp.ndarray,  # [3, R, S, 2] plane-space xy in [-1, 1], rays row-major
    decoder_params,  # (w1 [C,HID], b1 [HID], w2 [HID,1+out], b2 [1+out]) effective
    res: int,
    tile: int = 16,
    window: int = 48,
    payload_dtype=jnp.bfloat16,
    s_group: int = 1,
    return_raw: bool = False,
    interpret: bool = False,
    resident: bool = False,
):
    """Fused windowed sampling + OSG decoder -> (rgb [R,S,out], sigma [R,S,1]).

    `return_raw=True` skips the ray-major transpose and returns the kernel's
    native [T*S, P, O] layout (O = 1+out, sigma first) — the merged-march
    pass consumes this directly as its coarse source.

    Exactness of the interpolation requires each (ray-tile × stratum) plane
    footprint to fit `window` texels — guaranteed for the structured coarse
    pass at the flagship geometry (16-px tile spans <28 texels, one stratum
    <8). This is the bf16 FAST PATH only: the payload error class is ~1e-2 on
    features, and Mosaic's log() limits in-kernel softplus to ~3e-4 relative —
    exact configs route through the v2 sampling kernel + XLA decoder instead.
    """
    N, H, W, C = planes.shape
    assert N == 3
    R, S = grid.shape[1], grid.shape[2]
    th, tw = _tile_shape(tile)
    wy, wx = _window_shape(window)
    assert R == res * res and res % th == 0 and res % tw == 0
    tsy, tsx = res // th, res // tw
    T = tsy * tsx
    P = th * tw

    g = grid.reshape(N, tsy, th, tsx, tw, S, 2)
    g = jnp.transpose(g, (0, 1, 3, 5, 2, 4, 6)).reshape(N, T * S, P, 2)
    S_g, P_g = S, P
    if s_group > 1:
        # fold s_group adjacent strata into one grid step (fewer, bigger
        # steps); the window must additionally cover the inter-stratum drift
        assert S % s_group == 0
        S_g = S // s_group
        P_g = P * s_group
        g = g.reshape(N, T * S_g, P_g, 2)
    gx = (g[..., 0].astype(jnp.float32) + 1.0) * (W * 0.5) - 0.5
    gy = (g[..., 1].astype(jnp.float32) + 1.0) * (H * 0.5) - 0.5

    row_align = 8 if payload_dtype == jnp.float32 else 16
    xalign = max(1, 128 // C)
    # win_r must be a row_align multiple: the clip ceiling H - win_r is then
    # itself aligned, so aligning ys down never pulls a bottom-edge window off
    # its footprint (H is a row_align multiple for all shipped plane sizes)
    # a window bound larger than the plane degrades to "whole plane" (always
    # exact); H/W are row_align/xalign multiples for all shipped plane sizes
    win_r = min(-(-(wy + row_align) // row_align) * row_align, H)
    win_c = min(-(-(wx + xalign) // xalign) * xalign, W)
    xs = jnp.clip(jnp.floor(jnp.min(gx, axis=-1)).astype(jnp.int32) - 1, 0, max(W - win_c, 0))
    ys = jnp.clip(jnp.floor(jnp.min(gy, axis=-1)).astype(jnp.int32) - 1, 0, max(H - win_r, 0))
    ys = (ys // row_align) * row_align
    xs = (xs // xalign) * xalign

    w1, b1, w2, b2 = decoder_params
    O = w2.shape[1]  # 1 + decoder_output_dim
    HID = w1.shape[1]
    # per grid step: 3 planes × (x-expander + tent contraction + lane fold)
    # matmuls + one decoder MLP over the P_g points (see _kernel)
    ledger_add(
        (T * S_g) * (
            3 * (2 * P_g * win_c * (win_c * C)      # x expander
                 + 2 * P_g * win_r * (win_c * C)    # tent contraction
                 + 2 * P_g * 128 * C)               # lane->channel fold
            + 2 * P_g * (C * HID + HID * O)         # OSG decoder MLP
        )
    )
    out = _fused_call(
        planes.astype(payload_dtype).reshape(N, H, W * C),
        ys, xs * C, gy, gx, w1, b1, w2, b2,
        win_r=win_r, win_c=win_c, C=C, H=H, W=W, O=O,
        exact=False,
        # raw layout feeds the merged-march pass which upcasts on read —
        # bf16 halves the 104 MB Phase-A round-trip (error class = payload)
        out_dtype=jnp.bfloat16 if return_raw else jnp.float32,
        interpret=interpret,
        resident=resident,
    )  # [T*S_g, P_g, O]
    if return_raw:
        assert s_group == 1
        return out
    out = out.reshape(tsy, tsx, S_g, s_group, th, tw, O)
    out = jnp.transpose(out, (0, 4, 1, 5, 2, 3, 6)).reshape(R, S, O)
    return out[..., 1:], out[..., 0:1]


# ---------------------------------------------------------------------------
# Merged-pass kernel: walk the tile-shared merged (coarse ∪ fine) depth order,
# recompute only fine samples, read coarse samples from the Phase-A output,
# and run the MipNeRF march (ray_marcher.py semantics) in VMEM — the merge,
# the fine-color HBM round-trip, and the final XLA march all disappear.
# Valid exactly when depths are tile-shared (pooled importance + det eval).
# ---------------------------------------------------------------------------


def _kernel_march(
    ys_ref,  # [3, G] int32 fine-window row starts (absolute; 0 on coarse slots)
    xsc_ref,  # [3, G] int32 fine-window col starts × C
    isf_ref,  # [G] int32: 1 = fine slot (contract+decode), 0 = coarse slot (read)
    fslot_ref,  # [G] int32 DMA buffer slot (fine ordinal mod 2U)
    csrc_ref,  # [G] int32 Phase-A block row for this slot (forward-filled on fine)
    planes_ref,  # [3, H, W*C] HBM
    *rest,  # U coarse blocks [1,P,O], gy [U,3,P], gx [U,3,P], dinfo [8,U*8],
    # w1 [C,HID], b1 [1,HID], w2 [HID,O], b2 [1,O], out [1,P,C+2],
    # then scratch: win [2U,3,WIN_R,WIN_C*C], sems (2U,3), cur/prev [P,O],
    # acc [P,C], sca [P,8]
    win_r: int,
    win_c: int,
    P: int,
    C: int,
    H: int,
    W: int,
    Sm: int,
    U: int,
    resident: bool = False,
):
    coarse_refs = rest[:U]
    if resident:
        (gy_ref, gx_ref, dinfo_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref,
         cur, prev, acc, sca) = rest[U:]
        win = sems = None
    else:
        (gy_ref, gx_ref, dinfo_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref,
         win, sems, cur, prev, acc, sca) = rest[U:]
    k = pl.program_id(0)
    K = pl.num_programs(0)
    row_align = 16 if planes_ref.dtype == jnp.bfloat16 else 8

    def dma(step, sem_slot, p):
        ys = pl.multiple_of(ys_ref[p, step], row_align)
        xsc = pl.multiple_of(xsc_ref[p, step], 128)
        return pltpu.make_async_copy(
            planes_ref.at[p, pl.ds(ys, win_r), pl.ds(xsc, win_c * C)],
            win.at[sem_slot, p],
            sems.at[sem_slot, p],
        )

    if not resident:
        @pl.when(k == 0)
        def _():
            for u in range(U):
                @pl.when(isf_ref[u] == 1)
                def _(u=u):
                    for p in range(3):
                        dma(u, fslot_ref[u], p).start()

        nk = jnp.minimum(k + 1, K - 1)
        for u in range(U):
            n = nk * U + u

            @pl.when((k + 1 < K) & (isf_ref[n] == 1))
            def _(n=n):
                for p in range(3):
                    dma(n, fslot_ref[n], p).start()

    for u in range(U):
        gg = k * U + u
        s_idx = jax.lax.rem(gg, Sm)

        @pl.when(isf_ref[gg] == 1)
        def _(gg=gg, u=u):
            accf = jnp.zeros((P, C), jnp.float32)
            slot = None if resident else fslot_ref[gg]
            for p in range(3):
                ys_f = ys_ref[p, gg].astype(jnp.float32)
                xs_f = (xsc_ref[p, gg] // C).astype(jnp.float32)
                if resident:
                    ys_i = pl.multiple_of(ys_ref[p, gg], row_align)
                    xsc_i = pl.multiple_of(xsc_ref[p, gg], 128)
                    blk = planes_ref[p, pl.ds(ys_i, win_r), pl.ds(xsc_i, win_c * C)]
                else:
                    dma(gg, slot, p).wait()
                    blk = win[slot, p]
                accf = accf + _tent_contract(
                    blk, gy_ref[u, p, :], gx_ref[u, p, :], ys_f, xs_f,
                    P=P, win_r=win_r, win_c=win_c, C=C, H=H, W=W, exact=False,
                )
            x = accf * (1.0 / 3.0)
            h = jax.lax.dot_general(
                x, w1_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + b1_ref[0, :][None, :]
            h = jax.nn.softplus(h)
            o = jax.lax.dot_general(
                h, w2_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + b2_ref[0, :][None, :]
            sigma = o[:, 0:1]
            rgb = jax.nn.sigmoid(o[:, 1:]) * (1 + 2 * 0.001) - 0.001
            cur[...] = jnp.concatenate([sigma, rgb], axis=-1)

        @pl.when(isf_ref[gg] == 0)
        def _(u=u):
            cur[...] = coarse_refs[u][0, :, :].astype(jnp.float32)

        @pl.when(s_idx == 0)
        def _():
            acc[...] = jnp.zeros((P, C), jnp.float32)
            lane = jax.lax.broadcasted_iota(jnp.int32, (P, 8), 1)
            sca[...] = jnp.where(lane == 0, 1.0, 0.0)  # transmittance = 1
            prev[...] = cur[...]

        @pl.when(s_idx > 0)
        def _(u=u):
            d = dinfo_ref[jax.lax.rem(k, 8), u * 8 : (u + 1) * 8]
            delta = d[0]
            d_mid = d[1]
            pv = prev[...]
            cu = cur[...]
            dens_mid = jax.nn.softplus((pv[:, 0:1] + cu[:, 0:1]) * 0.5 - 1.0)
            alpha = 1.0 - jnp.exp(-dens_mid * delta)
            t_run = sca[:, 0:1]
            w = alpha * t_run
            sca[:, 0:1] = t_run * (1.0 - alpha + 1e-10)
            acc[...] = acc[...] + w * (pv[:, 1:] + cu[:, 1:]) * 0.5
            sca[:, 1:2] = sca[:, 1:2] + w * d_mid
            sca[:, 2:3] = sca[:, 2:3] + w
            prev[...] = cu

        @pl.when(s_idx == Sm - 1)
        def _(u=u):
            d = dinfo_ref[jax.lax.rem(k, 8), u * 8 : (u + 1) * 8]
            wsum = sca[:, 2:3]
            depth = sca[:, 1:2] / wsum
            depth = jnp.where(jnp.isnan(depth), jnp.inf, depth)
            depth = jnp.clip(depth, d[2], d[3])
            rgb = acc[...] * 2.0 - 1.0
            out_ref[0, :, :] = jnp.concatenate([rgb, depth, wsum], axis=-1)


@functools.partial(
    jax.jit, static_argnames=("win_r", "win_c", "C", "H", "W", "O", "Sm", "U", "interpret",
                              "resident")
)
def _merged_call(planes3, ys, xsc, isf, fslot, csrc, coarse, gy, gx, dinfo,
                 w1, b1, w2, b2,
                 win_r: int, win_c: int, C: int, H: int, W: int, O: int, Sm: int,
                 U: int = 2, interpret: bool = False, resident: bool = False):
    _, G, P = gy.shape
    gy = jnp.transpose(gy, (1, 0, 2))  # [G, 3, P]
    gx = jnp.transpose(gx, (1, 0, 2))
    HID = w1.shape[1]
    K = G // U
    dinfo2 = dinfo.reshape(K, U * 8)
    H_, WC = planes3.shape[1], planes3.shape[2]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(K,),
        in_specs=[
            # resident: whole plane set as one constant VMEM block
            pl.BlockSpec((3, H_, WC), lambda k, *s: (0, 0, 0))
            if resident
            else pl.BlockSpec(memory_space=pl.ANY),  # planes in HBM
        ]
        + [
            pl.BlockSpec(
                (1, P, O),
                (lambda u: (lambda k, ys, xsc, isf, fslot, csrc: (csrc[k * U + u], 0, 0)))(u),
            )
            for u in range(U)
        ]
        + [
            pl.BlockSpec((U, 3, P), lambda k, *s: (k, 0, 0)),
            pl.BlockSpec((U, 3, P), lambda k, *s: (k, 0, 0)),
            pl.BlockSpec((8, U * 8), lambda k, *s: (k // 8, 0)),
            pl.BlockSpec((C, HID), lambda k, *s: (0, 0)),
            pl.BlockSpec((1, HID), lambda k, *s: (0, 0)),
            pl.BlockSpec((HID, O), lambda k, *s: (0, 0)),
            pl.BlockSpec((1, O), lambda k, *s: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, P, C + 2), lambda k, *s: (k * U // Sm, 0, 0)),
        scratch_shapes=(
            []
            if resident
            else [
                pltpu.VMEM((2 * U, 3, win_r, win_c * C), planes3.dtype),
                pltpu.SemaphoreType.DMA((2 * U, 3)),
            ]
        )
        + [
            pltpu.VMEM((P, O), jnp.float32),
            pltpu.VMEM((P, O), jnp.float32),
            pltpu.VMEM((P, C), jnp.float32),
            pltpu.VMEM((P, 8), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _kernel_march, win_r=win_r, win_c=win_c, P=P, C=C, H=H, W=W, Sm=Sm, U=U,
        resident=resident,
    )
    T = G // Sm
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, P, C + 2), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(ys, xsc, isf, fslot, csrc, planes3, *([coarse] * U), gy, gx, dinfo2,
      w1.astype(jnp.float32), b1.reshape(1, -1).astype(jnp.float32),
      w2.astype(jnp.float32), b2.reshape(1, -1).astype(jnp.float32))


def fused_merged_march_pallas(
    planes: jnp.ndarray,  # [3, H, W, C]
    proj_m: jnp.ndarray,  # [3, T, Sm, P, 2] plane-space xy of every merged slot
    is_fine: jnp.ndarray,  # [T, Sm] int32
    src: jnp.ndarray,  # [T, Sm] int32 index within the slot's source list
    d_m: jnp.ndarray,  # [T, Sm] merged depths (tile-shared)
    coarse_out: jnp.ndarray,  # [T*S, P, O] Phase-A raw output
    decoder_params,
    res: int,
    S: int,  # number of coarse strata (Phase-A rows per tile)
    tile: int = 16,
    window: int = 32,
    payload_dtype=jnp.bfloat16,
    interpret: bool = False,
    resident: bool = False,
):
    """Run the merged coarse∪fine pass with the in-kernel march.

    Returns (rgb [R, C-? ...], depth [R, 1], weight_sum [R, 1]) in ray-major
    order. Point/tile ordering matches `fused_render_pallas` so `coarse_out`
    rows line up.
    """
    N, H, W, C = planes.shape
    T, Sm = is_fine.shape
    th, tw = _tile_shape(tile)
    wy, wx = _window_shape(window)
    tsy, tsx = res // th, res // tw
    P = th * tw
    G = T * Sm
    O = 1 + C

    gx = (proj_m[..., 0].astype(jnp.float32) + 1.0) * (W * 0.5) - 0.5  # [3, T, Sm, P]
    gy = (proj_m[..., 1].astype(jnp.float32) + 1.0) * (H * 0.5) - 0.5

    row_align = 8 if payload_dtype == jnp.float32 else 16
    xalign = max(1, 128 // C)
    win_r = min(-(-(wy + row_align) // row_align) * row_align, H)
    win_c = min(-(-(wx + xalign) // xalign) * xalign, W)
    xs = jnp.clip(jnp.floor(jnp.min(gx, axis=-1)).astype(jnp.int32) - 1, 0, max(W - win_c, 0))
    ys = jnp.clip(jnp.floor(jnp.min(gy, axis=-1)).astype(jnp.int32) - 1, 0, max(H - win_r, 0))
    ys = (ys // row_align) * row_align
    xs = (xs // xalign) * xalign

    U = 2  # merged slots per grid step (static; halves per-step overhead)
    isf = is_fine.reshape(G).astype(jnp.int32)
    fine_ord = jnp.cumsum(isf) - 1
    fslot = jnp.where(isf == 1, fine_ord % (2 * U), 0).astype(jnp.int32)
    # Phase-A row per slot; forward-fill fine slots with the previous coarse
    # row so the pipelined block index does not thrash between fetches
    tile_base = (
        jax.lax.broadcasted_iota(jnp.int32, (T, Sm), 0) * S
    )
    csrc_raw = jnp.where(is_fine == 0, tile_base + src, -1).reshape(T, Sm)
    csrc = jax.lax.associative_scan(jnp.maximum, csrc_raw, axis=1)
    csrc = jnp.where(csrc < 0, tile_base, csrc).reshape(G).astype(jnp.int32)

    # march scalars
    d_flat = d_m.reshape(G)
    d_prev = jnp.roll(d_flat, 1)
    delta = d_flat - d_prev
    d_mid = (d_flat + d_prev) * 0.5
    dmin = jnp.min(d_m)
    dmax = jnp.max(d_m)
    dinfo = jnp.stack(
        [delta, d_mid,
         jnp.full((G,), dmin), jnp.full((G,), dmax)], axis=-1
    )
    dinfo = jnp.concatenate([dinfo, jnp.zeros((G, 4), jnp.float32)], axis=-1)

    w1, b1, w2, b2 = decoder_params
    HID = w1.shape[1]
    # G merged slots, each: 3 planes × (expander + tent + fold) + decoder MLP
    # (the march itself is VPU elementwise — negligible MXU work)
    ledger_add(
        G * (
            3 * (2 * P * win_c * (win_c * C)
                 + 2 * P * win_r * (win_c * C)
                 + 2 * P * 128 * C)
            + 2 * P * (C * HID + HID * O)
        )
    )
    out = _merged_call(
        planes.astype(payload_dtype).reshape(N, H, W * C),
        ys.reshape(N, G), (xs * C).reshape(N, G), isf, fslot, csrc,
        coarse_out, gy.reshape(N, G, P), gx.reshape(N, G, P), dinfo,
        w1, b1, w2, b2,
        win_r=win_r, win_c=win_c, C=C, H=H, W=W, O=O, Sm=Sm, U=U,
        interpret=interpret, resident=resident,
    )  # [T, P, C+2]
    out = out.reshape(tsy, tsx, th, tw, C + 2)
    out = jnp.transpose(out, (0, 2, 1, 3, 4)).reshape(res * res, C + 2)
    return out[:, :C], out[:, C : C + 1], out[:, C + 1 :]
