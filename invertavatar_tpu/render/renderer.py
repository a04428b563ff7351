"""Two-pass importance volume renderer over tri-planes.

Counterpart of reference `ImportanceRenderer_bsMotion`
(volumetric_rendering/renderer.py:295-469): dynamic near/far from the camera
distance (‖ray_o‖ ± (0.45, 0.6)), 48 stratified + 48 importance samples,
MipNeRF ray marching, deterministic importance sampling in evaluation mode.

TPU notes:
  * `sample_from_planes` = 3 batched bilinear gathers (renderer.py:85-97); the
    plane-projection matmul is folded into a static coordinate shuffle since
    the three plane bases are axis permutations.
  * searchsorted is a vectorized rank count (sum of comparisons) — S is tiny
    (45 bins × 48 samples), the VPU eats the full comparison matrix; no
    data-dependent control flow anywhere, so the whole renderer jits into one
    fused XLA program.
  * the coarse+fine merge keeps the reference's general sort (argsort+gather);
    a two-sorted-list Pallas merge is a later perf candidate (SURVEY §7).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.grid_sample import grid_sample
from ..ops.plane_sample import (
    grid_sample_patch,
    pad_planes_for_patch,
    sample_planes_coarse_windowed,
)
from .math_utils import get_ray_limits_box
from .ray_marcher import mip_ray_march

# generate_planes (renderer.py:30-48) returns the INVERSES of the three plane
# bases; projection takes the first two components of coords @ inv(P).
_PLANE_BASES = np.array(
    [
        [[1, 0, 0], [0, 1, 0], [0, 0, 1]],
        [[1, 0, 0], [0, 0, 1], [0, 1, 0]],
        [[0, 0, 1], [1, 0, 0], [0, 1, 0]],
    ],
    dtype=np.float64,
)
PLANE_AXES_INV = np.linalg.inv(_PLANE_BASES).astype(np.float32)  # [3, 3, 3]

# Legacy Next3D plane set (reference renderer_next3d.py:30-44): the third
# plane swaps x/z ("三平面的顺序调换" — next3d_triplane.py header), so its
# projection reads (z, y) instead of the shipped (z, x).
_NEXT3D_PLANE_BASES = np.array(
    [
        [[1, 0, 0], [0, 1, 0], [0, 0, 1]],
        [[1, 0, 0], [0, 0, 1], [0, 1, 0]],
        [[0, 0, 1], [0, 1, 0], [1, 0, 0]],
    ],
    dtype=np.float64,
)
NEXT3D_PLANE_AXES_INV = np.linalg.inv(_NEXT3D_PLANE_BASES).astype(np.float32)


def project_onto_planes(coordinates: jnp.ndarray, axes_inv=None) -> jnp.ndarray:
    """[B, M, 3] -> [B, 3, M, 2] plane-space xy (reference renderer.py:49-63)."""
    inv = jnp.asarray(PLANE_AXES_INV if axes_inv is None else axes_inv)
    proj = jnp.einsum("bmi,pij->bpmj", coordinates, inv)
    return proj[..., :2]


def sample_from_planes(
    plane_features: jnp.ndarray,  # [B, 3, H, W, C]
    coordinates: jnp.ndarray,  # [B, M, 3]
    box_warp: float,
    axes_inv=None,
) -> jnp.ndarray:
    """Bilinear tri-plane lookup -> [B, 3, M, C] (reference renderer.py:85-97)."""
    B, n_planes, H, W, C = plane_features.shape
    M = coordinates.shape[1]
    coordinates = (2.0 / box_warp) * coordinates.astype(jnp.float32)
    proj = project_onto_planes(coordinates, axes_inv)  # [B, 3, M, 2]
    planes = plane_features.reshape(B * n_planes, H, W, C)
    out = grid_sample(planes, proj.reshape(B * n_planes, M, 2))
    return out.reshape(B, n_planes, M, C)


def _linspace01(n: int) -> jnp.ndarray:
    return jnp.linspace(0.0, 1.0, n, dtype=jnp.float32)


def _searchsorted_right(cdf: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Batched searchsorted(cdf, u, right=True): counts cdf[j] <= u."""
    return jnp.sum(
        (cdf[..., None, :] <= u[..., :, None]).astype(jnp.int32), axis=-1
    )


def sample_pdf(
    bins: jnp.ndarray,  # [R, S+1]
    weights: jnp.ndarray,  # [R, S]
    n_importance: int,
    u: jnp.ndarray,  # [R, n_importance] uniform draws (or det linspace)
    eps: float = 1e-5,
) -> jnp.ndarray:
    """Inverse-CDF sampling (reference renderer.py:434-469).

    TPU formulation: the reference's searchsorted + 4× gather becomes one
    comparison matrix and two one-hot MXU contractions — `take_along_axis`
    on [R·n] indices is slice-latency bound (~45 ms/pass at the flagship
    geometry), the einsum version is <2 ms.
    """
    S = weights.shape[-1]
    weights = weights + eps
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], axis=-1)  # [R, S+1]

    # e[r, n, j] = 1 iff cdf[r, j] <= u[r, n]; inds = Σ_j e (searchsorted right)
    e = (cdf[..., None, :] <= u[..., :, None]).astype(jnp.float32)  # [R, n, S+1]
    inds = jnp.sum(e, axis=-1)
    below = jnp.maximum(inds - 1.0, 0.0)
    above = jnp.minimum(inds, float(S))

    # one-hot rows of `below`/`above` against the bin index, then gather both
    # (cdf, bins) with a single contraction each
    iot = jax.lax.broadcasted_iota(jnp.float32, (1, 1, S + 1), 2)
    oh_b = (below[..., None] == iot).astype(jnp.float32)  # [R, n, S+1]
    oh_a = (above[..., None] == iot).astype(jnp.float32)
    # bins may carry extra tail entries (z_mid is one longer than the smoothed
    # weights); indices never exceed S, so align both to S+1 columns
    vals = jnp.stack([cdf, bins[:, : S + 1]], axis=-1)  # [R, S+1, 2]
    lo = jnp.einsum("rns,rsd->rnd", oh_b, vals)
    hi = jnp.einsum("rns,rsd->rnd", oh_a, vals)
    cdf_lo, bins_lo = lo[..., 0], lo[..., 1]
    cdf_hi, bins_hi = hi[..., 0], hi[..., 1]

    denom = cdf_hi - cdf_lo
    denom = jnp.where(denom < eps, 1.0, denom)
    return bins_lo + (u - cdf_lo) / denom * (bins_hi - bins_lo)


class ImportanceRenderer:
    """Stateless functional renderer; `decoder` is a closure over its params.

    `plane_mode='next3d'` selects the legacy Next3D plane-axes set
    (renderer_next3d.py:30-44); the default is the shipped v20 set.
    """

    def __init__(self, plane_mode: str = "v20"):
        assert plane_mode in ("v20", "next3d")
        self.axes_inv = None if plane_mode == "v20" else NEXT3D_PLANE_AXES_INV

    def __call__(
        self,
        planes: jnp.ndarray,  # [B, 3, H, W, C]
        decoder: Callable[[jnp.ndarray], Dict[str, jnp.ndarray]],
        ray_origins: jnp.ndarray,  # [B, R, 3]
        ray_directions: jnp.ndarray,  # [B, R, 3]
        options: Dict,
        evaluation: bool = False,
        rng: Optional[jax.Array] = None,
        decoder_params: Optional[Tuple[jnp.ndarray, ...]] = None,
    ):
        rs, re = options.get("ray_start", None), options.get("ray_end", None)
        if isinstance(rs, (int, float)) and isinstance(re, (int, float)):
            # fixed near/far from the config (renderer_next3d.py:111-115)
            ray_start, ray_end = float(rs), float(re)
        elif rs == "auto" and re == "auto":
            # per-ray box intersection (renderer_next3d.py:103-109 +
            # math_utils.get_ray_limits_box); invalid rays take the valid min
            ray_start, ray_end = get_ray_limits_box(
                ray_origins, ray_directions, options["box_warp"]
            )  # [B, R, 1]
            valid = ray_end > ray_start
            vmin = jnp.min(jnp.where(valid, ray_start, jnp.inf))
            vmax = jnp.max(jnp.where(valid, ray_start, -jnp.inf))
            ray_start = jnp.where(valid, ray_start, vmin)[..., None]  # [B, R, 1, 1]
            ray_end = jnp.where(valid, ray_end, vmax)[..., None]
        else:
            # dynamic near/far from mean camera distance — the shipped
            # ImportanceRenderer_bsMotion behavior (renderer.py:311-313)
            dist = jnp.mean(jnp.linalg.norm(ray_origins, axis=-1))
            ray_start, ray_end = dist - 0.45, dist + 0.6

        B, R, _ = ray_origins.shape
        S = options["depth_resolution"]
        if rng is None:
            rng = jax.random.PRNGKey(0)
        rng_strat, rng_imp, rng_noise = jax.random.split(rng, 3)

        # stratified coarse depths (renderer.py:386-415; non-disparity branch)
        base = _linspace01(S).reshape(1, 1, S, 1) * (ray_end - ray_start) + ray_start
        delta = (ray_end - ray_start) / (S - 1)
        if options.get("det_stratified", False):
            # deterministic mid-stratum offsets: stable frames for video eval
            # and exact comparability (extension over the reference, which
            # jitters even in evaluation mode — renderer.py:400-415)
            offsets = jnp.full((B, R, S, 1), 0.5, jnp.float32)
        else:
            offsets = jax.random.uniform(rng_strat, (B, R, S, 1))
        depths_coarse = base + offsets * delta

        # fast sampling paths (ops/plane_sample.py): padded patch-gather for
        # arbitrary points; windowed tent-matmul for the structured coarse pass
        Bp, n_planes, Hp_, Wp_, Cp_ = planes.shape
        planes_flat = planes.reshape(Bp * n_planes, Hp_, Wp_, Cp_)
        fast = options.get("fast_sampling", True)
        # bf16 payload for the patch gather halves the per-point HBM segments;
        # enabled with the bf16 fast path (same error class as the bf16 coarse
        # kernel), opt out with options['bf16_gather']=False
        # options['pallas_interpret'] routes the Pallas kernels through the TPU
        # interpret mode (CPU emulation of the grid walk + DMAs) — regression
        # coverage for the shipped fast path without hardware (VERDICT r2 #2)
        _interp = bool(options.get("pallas_interpret", False))
        _bf16_gather = (
            evaluation  # eval-only numerics, like the kernels it accompanies
            and options.get("pallas_coarse", False)
            and not options.get("pallas_exact", False)
            and options.get("bf16_gather", True)
            and (jax.devices()[0].platform == "tpu" or _interp)
        )
        if fast:
            src = planes_flat.astype(jnp.bfloat16) if _bf16_gather else planes_flat
            planes_padded = pad_planes_for_patch(src)
        else:
            planes_padded = None
        res = int(round(R ** 0.5))
        tile = max(8, res // 8)
        # geometry-derived footprint bound (coarse_window_for: ray divergence
        # over a tile + stratum depth drift + alignment slack); 32 at the
        # flagship camera — error-identical to 48, ~15% faster steps
        from ..ops.plane_sample import coarse_window_for

        window = int(options.get("coarse_window", coarse_window_for(res, tile)))
        # The windowed tent-matmul path is exact but loses to the patch gather
        # under XLA (per-s lax.map + regrouping transposes dominate); it maps
        # naturally onto a Pallas kernel (block DMA + MXU contraction) and is
        # kept behind options['windowed_coarse'] for that follow-up.
        # The forward-only Pallas kernels define no VJP: differentiating them
        # raises NotImplementedError (docs/gan_tpu_run.json r4 run 1, flagship
        # kwargs inside a train step). They are EVAL paths — gate them on
        # `evaluation` so training renders fall back to the differentiable
        # formulations unless the caller opts into `pallas_grad`.
        _pallas_on = (
            evaluation
            and options.get("pallas_coarse", False)
            and (jax.devices()[0].platform == "tpu" or _interp)
        )
        # grad-carrying structured sampling: Pallas forward + linear-transpose
        # backward (ops/plane_sample.sample_planes_windowed_cvjp). Training
        # callers set this via train/fast_render.FAST_GRAD_PALLAS; coordinates
        # must be parameter-free (the grid cotangent is zero by contract).
        _grad_pallas = options.get("pallas_grad", False) and (
            jax.devices()[0].platform == "tpu" or _interp
        )
        windowed_ok = (
            fast
            and (options.get("windowed_coarse", False) or _pallas_on or _grad_pallas)
            and res * res == R
            and res % tile == 0
            and tile >= 8
            and window <= min(Hp_, Wp_)
        )

        def sample_feats(coords_flat):  # [B, M, 3] -> [B, 3, M, C]
            if not fast:
                return sample_from_planes(planes, coords_flat, options["box_warp"], self.axes_inv)
            scaled = (2.0 / options["box_warp"]) * coords_flat.astype(jnp.float32)
            proj = project_onto_planes(scaled, self.axes_inv).reshape(Bp * n_planes, -1, 2)
            out = grid_sample_patch(planes_padded, proj, Cp_)
            return out.reshape(Bp, n_planes, -1, Cp_)

        def sample_feats_coarse(coords):  # [B, R, S, 3] -> [B, 3, R*S, C]
            scaled = (2.0 / options["box_warp"]) * coords.astype(jnp.float32)
            S_ = coords.shape[2]
            proj = project_onto_planes(scaled.reshape(Bp, -1, 3), self.axes_inv)  # [B, 3, R*S, 2]
            proj = proj.reshape(Bp * n_planes, R, S_, 2)
            if _grad_pallas:
                from ..ops.plane_sample import sample_planes_windowed_cvjp

                out = sample_planes_windowed_cvjp(
                    planes_flat, proj, res, tile, window, True, _interp
                )
            elif _pallas_on:
                # Pallas windowed kernel: ~2x the patch gather on the
                # structured coarse pass; bf16 payload (~1e-2 abs feature
                # error) unless options['pallas_exact'] requests fp32/HIGHEST
                from ..ops.pallas_plane_sample import sample_planes_windowed_pallas

                exact = options.get("pallas_exact", False)
                out = sample_planes_windowed_pallas(
                    planes_flat, proj, res=res, tile=tile, window=window,
                    payload_dtype=jnp.float32 if exact else jnp.bfloat16,
                    exact=exact, interpret=_interp,
                )
            else:
                out = sample_planes_coarse_windowed(
                    planes_flat, proj, res=res, tile=tile, window=window
                )
            return out.reshape(Bp, n_planes, R * S_, Cp_)

        # fully-fused fast path: tri-plane sampling + OSG decoder MLP in one
        # Pallas kernel (bf16 payload; rides the pallas_coarse gate)
        _fused_on = (
            _pallas_on
            and not options.get("pallas_exact", False)
            and decoder_params is not None
            and options.get("fused_render", True)
        )

        def run_fused(coords):  # [B, R, n, 3] -> colors [B,R,n,32], sigma [B,R,n,1]
            from ..ops.pallas_fused_render import fused_render_pallas

            n = coords.shape[2]
            scaled = (2.0 / options["box_warp"]) * coords.astype(jnp.float32)
            proj = project_onto_planes(scaled.reshape(Bp, -1, 3), self.axes_inv)
            proj = proj.reshape(Bp, n_planes, R, n, 2)
            outs = [
                fused_render_pallas(
                    planes[b], proj[b], decoder_params, res=res, tile=tile,
                    window=window, interpret=_interp,
                )
                for b in range(Bp)
            ]
            colors = jnp.stack([o[0] for o in outs])
            densities = jnp.stack([o[1] for o in outs])
            return colors, densities

        def run(depths, structured=False):
            n = depths.shape[2]
            coords = ray_origins[:, :, None, :] + depths * ray_directions[:, :, None, :]
            if options.get("flip_z", False):
                # legacy EG3D renderer variant (renderer.py:181-182)
                coords = coords * jnp.asarray([1.0, 1.0, -1.0])
            if structured and windowed_ok and _fused_on:
                colors, densities = run_fused(coords)
            else:
                if structured and windowed_ok:
                    feats = sample_feats_coarse(coords)
                else:
                    feats = sample_feats(coords.reshape(B, R * n, 3))
                out = decoder(feats)
                colors = out["rgb"].reshape(B, R, n, -1)
                densities = out["sigma"].reshape(B, R, n, 1)
            if options.get("density_noise", 0) > 0 and not evaluation:
                densities = (
                    densities
                    + jax.random.normal(rng_noise, densities.shape) * options["density_noise"]
                )
            return colors, densities

        n_imp = options["depth_resolution_importance"]

        # Merged-pass fast path: Phase A (coarse kernel, raw layout) → pooled
        # CDF → ONE merged coarse∪fine kernel pass with the MipNeRF march
        # composited in VMEM (ops/pallas_fused_render._kernel_march). Removes
        # the per-ray merge, the fine-color HBM round-trip, and the final XLA
        # march. Requires tile-shared depths: pooled + det mid-stratum
        # offsets + scalar near/far.
        scalar_bounds = not (hasattr(ray_start, "ndim") and ray_start.ndim > 0)
        if (
            _fused_on
            and windowed_ok
            and evaluation
            and n_imp > 0
            and options.get("pooled_importance", False)
            and options.get("march_in_kernel", True)
            and options.get("det_stratified", False)
            and scalar_bounds
            and not options.get("flip_z", False)
        ):
            # rectangular kernel tiles (e.g. (64, 4)): tall-thin pixel tiles
            # shrink the plane-window LANE extent — the dominant per-step
            # kernel cost (ops/pallas_fused_render._tile_shape). Pooled-CDF
            # regions follow the tile shape; fidelity gated like `pooled`.
            tile_m, window_m = tile, window
            ts_opt = options.get("tile_shape", None)
            if ts_opt is not None:
                from ..ops.plane_sample import coarse_window_rect

                th_, tw_ = int(ts_opt[0]), int(ts_opt[1])
                if res % th_ == 0 and res % tw_ == 0:
                    tile_m = (th_, tw_)
                    window_m = coarse_window_rect(res, th_, tw_)
            return self._march_fused_path(
                planes, decoder_params, ray_origins, ray_directions,
                depths_coarse, options, res, tile_m, window_m, n_imp, rng_imp,
            )

        colors_coarse, densities_coarse = run(depths_coarse, structured=True)

        if n_imp > 0:
            _, _, weights = mip_ray_march(
                colors_coarse, densities_coarse, depths_coarse,
                white_back=options.get("white_back", False),
            )
            pooled = options.get("pooled_importance", False) and windowed_ok
            if pooled:
                # TPU-first deviation (fidelity-validated, flagship.py): pool
                # the importance weights over each ray tile so all rays in a
                # tile share fine depths — the fine pass then has the same
                # bounded per-block footprint as the coarse pass and rides the
                # windowed kernel instead of the latency-bound gather. Since
                # depths are shared, the CDF inversion and the coarse/fine
                # merge only need ONE row per tile (T rows, not R).
                t_side_ = res // tile
                T_ = t_side_ * t_side_
                w = weights.reshape(B, t_side_, tile, t_side_, tile, *weights.shape[2:])
                w_tile = jnp.mean(w, axis=(2, 4))  # [B, ts, ts, S-1, 1]
                # coarse depths are identical across rays in a tile (scalar
                # near/far + det/mid-stratum offsets) — take one representative
                d_tile = depths_coarse.reshape(B, t_side_, tile, t_side_, tile, S, 1)[
                    :, :, 0, :, 0
                ]
                # deterministic mid-bin u so the depths (hence footprints) are
                # shared across the tile — pooled mode is an inference option
                fine_tile = self._sample_importance(
                    d_tile.reshape(B, T_, S, 1),
                    w_tile.reshape(B, T_, *w_tile.shape[3:]),
                    n_imp, det=True, rng=rng_imp,
                )  # [B, T, n_imp, 1]
                depths_fine = jnp.broadcast_to(
                    fine_tile.reshape(B, t_side_, 1, t_side_, 1, n_imp, 1),
                    (B, t_side_, tile, t_side_, tile, n_imp, 1),
                ).reshape(B, R, n_imp, 1)
            else:
                depths_fine = self._sample_importance(
                    depths_coarse, weights, n_imp, det=evaluation, rng=rng_imp
                )
            colors_fine, densities_fine = run(depths_fine, structured=pooled)

            # (three tile-shared merge variants measured slower than the
            # per-ray rank merge under XLA: per-tile permutation matmuls,
            # broadcast take_along_axis (per-element gathers), and a
            # tile-batched rank merge (regrouping transposes dominate) —
            # docs/PERF_NOTES.md round 2)
            all_depths, all_colors, all_densities = self._unify_samples(
                depths_coarse, colors_coarse, densities_coarse,
                depths_fine, colors_fine, densities_fine,
            )
            rgb, depth, weights = mip_ray_march(
                all_colors, all_densities, all_depths,
                white_back=options.get("white_back", False),
            )
        else:
            rgb, depth, weights = mip_ray_march(
                colors_coarse, densities_coarse, depths_coarse,
                white_back=options.get("white_back", False),
            )
        return rgb, depth, jnp.sum(weights, axis=2)

    def _march_fused_path(self, planes, decoder_params, ray_origins, ray_directions,
                          depths_coarse, options, res, tile, window, n_imp, rng_imp):
        """Two-kernel render with the march in VMEM (see __call__ gate).

        Phase A = `fused_render_pallas(return_raw=True)`; the importance CDF
        is computed from its raw densities (weights depend on σ and depths
        only — mip_ray_march's color inputs never affect them); Phase B walks
        the per-tile merged depth order in `fused_merged_march_pallas`."""
        from ..ops.pallas_fused_render import (
            fused_merged_march_pallas,
            fused_render_pallas,
        )

        from ..ops.pallas_fused_render import _tile_shape

        B, n_planes = planes.shape[:2]
        R = res * res
        S = depths_coarse.shape[2]
        th, tw = _tile_shape(tile)
        tsy, tsx = res // th, res // tw
        T = tsy * tsx
        box = 2.0 / options["box_warp"]
        d_vec = depths_coarse[0, 0, :, 0]  # [S] — depths are globally shared here

        def group_rays(x):  # [B, R, 3] -> [B, T, P, 3] (tile-major, matches kernel)
            x = x.reshape(B, tsy, th, tsx, tw, 3)
            return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(B, T, th * tw, 3)

        ro_t = group_rays(ray_origins)
        rd_t = group_rays(ray_directions)
        deltas = d_vec[1:] - d_vec[:-1]

        # resident-planes mode: the whole bf16 plane set rides in VMEM and the
        # kernels slice windows from it directly — no per-step window DMAs.
        # Bitwise-identical math (same payload dtype, same tent contraction);
        # gated on fit (~12.6 MB at the flagship 3×256²×32 geometry vs the
        # v5e 16 MB VMEM, minus march scratch).
        C_pl = planes.shape[-1]
        planes_mb = 3 * planes.shape[-3] * planes.shape[-2] * C_pl * 2 / 1e6
        resident = bool(options.get("resident_planes", False)) and planes_mb <= 13.0

        rgbs, deps, wsums = [], [], []
        for b in range(B):
            coords_c = (
                ray_origins[b : b + 1, :, None, :]
                + depths_coarse[b : b + 1] * ray_directions[b : b + 1, :, None, :]
            )
            proj_c = project_onto_planes(box * coords_c.reshape(1, -1, 3), self.axes_inv)
            proj_c = proj_c.reshape(n_planes, R, S, 2)
            raw = fused_render_pallas(
                planes[b], proj_c, decoder_params, res=res, tile=tile,
                window=window, return_raw=True,
                interpret=bool(options.get("pallas_interpret", False)),
                resident=resident,
            )  # [T*S, P, O]
            sigma = jnp.transpose(raw[:, :, 0].reshape(T, S, -1), (0, 2, 1))  # [T, P, S]
            # per-ray march weights from densities alone (ray_marcher.py:30-43)
            dm = jax.nn.softplus((sigma[..., :-1] + sigma[..., 1:]) * 0.5 - 1.0)
            alpha = 1.0 - jnp.exp(-dm * deltas)
            trans = jnp.cumprod(
                jnp.concatenate([jnp.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], -1),
                axis=-1,
            )[..., :-1]
            w_tile = jnp.mean(alpha * trans, axis=1)  # [T, S-1]
            fine_tile = self._sample_importance(
                jnp.broadcast_to(d_vec.reshape(1, 1, S, 1), (1, T, S, 1)),
                w_tile.reshape(1, T, S - 1, 1), n_imp, det=True, rng=rng_imp,
            ).reshape(T, n_imp)
            # stable merge — coarse first on ties, matching _unify_samples
            d_cat = jnp.concatenate(
                [jnp.broadcast_to(d_vec[None], (T, S)), fine_tile], axis=1
            )
            order = jnp.argsort(d_cat, axis=1, stable=True)
            d_m = jnp.take_along_axis(d_cat, order, axis=1)  # [T, Sm]
            is_fine = (order >= S).astype(jnp.int32)
            src = jnp.where(order >= S, order - S, order).astype(jnp.int32)
            coords_m = (
                ro_t[b][:, None, :, :]
                + d_m[:, :, None, None] * rd_t[b][:, None, :, :]
            )  # [T, Sm, P, 3]
            proj_m = project_onto_planes(box * coords_m.reshape(1, -1, 3), self.axes_inv)
            proj_m = proj_m.reshape(n_planes, T, S + n_imp, -1, 2)
            rgb, dep, ws = fused_merged_march_pallas(
                planes[b], proj_m, is_fine, src, d_m, raw, decoder_params,
                res=res, S=S, tile=tile, window=window,
                interpret=bool(options.get("pallas_interpret", False)),
                resident=resident,
            )
            rgbs.append(rgb)
            deps.append(dep)
            wsums.append(ws)
        return jnp.stack(rgbs), jnp.stack(deps), jnp.stack(wsums)

    def run_model(self, planes, decoder, coordinates, options):
        """Density/color at arbitrary coords (reference renderer.py:354-363)."""
        if options.get("flip_z", False):
            coordinates = coordinates * jnp.asarray([1.0, 1.0, -1.0])
        feats = sample_from_planes(planes, coordinates, options["box_warp"], self.axes_inv)
        return decoder(feats)

    @staticmethod
    def _sample_importance(z_vals, weights, n_importance, det, rng):
        """reference renderer.py:416-432: smooth weights (max-blur), then inverse CDF."""
        B, R, S, _ = z_vals.shape
        z_vals = z_vals.reshape(B * R, S)
        w = weights.reshape(B * R, -1)  # [BR, S-1]

        # max_pool1d(k=2, s=1, p=1) then avg_pool1d(k=2, s=1)
        w_pad = jnp.pad(w, ((0, 0), (1, 1)), constant_values=-jnp.inf)
        w_max = jnp.maximum(w_pad[:, :-1], w_pad[:, 1:])  # [BR, S]
        w_smooth = (w_max[:, :-1] + w_max[:, 1:]) * 0.5  # [BR, S-1]
        w_smooth = w_smooth + 0.01

        z_mid = 0.5 * (z_vals[:, :-1] + z_vals[:, 1:])  # [BR, S-1]
        if det:
            u = jnp.broadcast_to(_linspace01(n_importance), (B * R, n_importance))
        else:
            # stratified-u (one draw per CDF stratum) instead of the reference's
            # iid uniforms: same marginal coverage, and the resulting samples
            # are sorted by construction, enabling the sort-free merge below.
            u = (
                jax.lax.broadcasted_iota(jnp.float32, (B * R, n_importance), 1)
                + jax.random.uniform(rng, (B * R, n_importance))
            ) / n_importance
        samples = sample_pdf(z_mid, w_smooth[:, 1:-1], n_importance, u)
        samples = jax.lax.stop_gradient(samples)
        return samples.reshape(B, R, n_importance, 1)

    @staticmethod
    def _unify_samples(d1, c1, s1, d2, c2, s2):
        """Merge two per-ray sample lists sorted by depth.

        The reference sorts the 96-element union per ray (renderer.py:372-382);
        a general sort costs ~800 ms/frame on TPU. Both lists are sorted by
        construction (stratified depths monotone since jitter ≤ stratum width;
        importance samples are an inverse-CDF of monotone u), so this is a
        rank-based two-list merge: each element's output slot is its index plus
        a cross-list rank count, and the scatter is expressed as two one-hot
        contractions that XLA fuses onto the MXU — no sort anywhere.
        """
        Sa = d1.shape[-2]
        Sb = d2.shape[-2]
        S = Sa + Sb
        a = d1[..., 0]  # [B, R, Sa]
        b = d2[..., 0]
        # output slot of a_i: i + #{j : b_j < a_i}; of b_j: j + #{i : a_i <= b_j}
        rank_a = jax.lax.broadcasted_iota(jnp.int32, a.shape, a.ndim - 1) + jnp.sum(
            (b[..., None, :] < a[..., :, None]), axis=-1, dtype=jnp.int32
        )
        rank_b = jax.lax.broadcasted_iota(jnp.int32, b.shape, b.ndim - 1) + jnp.sum(
            (a[..., None, :] <= b[..., :, None]), axis=-1, dtype=jnp.int32
        )

        vals_a = jnp.concatenate([d1, c1, s1], axis=-1)  # [B, R, Sa, D]
        vals_b = jnp.concatenate([d2, c2, s2], axis=-1)
        slots = jax.lax.broadcasted_iota(jnp.int32, rank_a.shape[:-1] + (S,), rank_a.ndim - 1)
        onehot_a = (rank_a[..., None, :] == slots[..., :, None]).astype(vals_a.dtype)  # [B,R,S,Sa]
        onehot_b = (rank_b[..., None, :] == slots[..., :, None]).astype(vals_b.dtype)
        merged = jnp.einsum("brsi,brid->brsd", onehot_a, vals_a) + jnp.einsum(
            "brsi,brid->brsd", onehot_b, vals_b
        )
        D = 1 + c1.shape[-1]
        return merged[..., 0:1], merged[..., 1:D], merged[..., D:]
