"""Next3D++ tri-plane avatar generator (TPU-native).

Behavioral counterpart of the shipped reference generator
`training_avatar_texture/triplane_v20.py:28-438` (TriPlaneGenerator + OSGDecoder):

  * three StyleGAN2 backbones sharing one mapping — `texture_backbone` (256²,
    32ch neural texture), `face_backbone` (256², 32ch refinement, conditioned
    on the warped texture pyramid), `backbone` (256², 96ch → 3×32 static planes)
  * `rasterize` warps the texture pyramid into image space through the
    FaceVerse `uvcoords_image` and alpha-blends with center-cropped static
    feats (:317-339, bbox [57,185,64,192] in 256-space)
  * blended frontal plane → two-pass importance volume rendering at 128² →
    super-resolution to 512² (:89-150)

All tensors NHWC; planes are [B, 3, H, W, C]. The cv2 flood-fill host
round-trip is replaced by the on-device `render.mouth.fill_mouth`.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.grid_sample import grid_sample
from ..ops.resize import resize_bilinear
from ..render.mouth import fill_mouth
from ..render.ray_sampler import sample_rays
from ..render.renderer import ImportanceRenderer
from .layers import FullyConnectedLayer
from .synthesis import Generator

BBOX_256 = (57, 185, 64, 192)  # face crop of the frontal plane (triplane_v20.py:114)


class OSGDecoder(nn.Module):
    """Tri-plane feature decoder (reference triplane_v20.py:415-438)."""

    n_features: int = 32
    hidden_dim: int = 64
    decoder_lr_mul: float = 1.0
    decoder_output_dim: int = 32

    @nn.compact
    def __call__(self, sampled_features, return_params: bool = False):
        fc0 = FullyConnectedLayer(
            self.n_features, self.hidden_dim, lr_multiplier=self.decoder_lr_mul, name="fc0"
        )
        fc1 = FullyConnectedLayer(
            self.hidden_dim, 1 + self.decoder_output_dim, lr_multiplier=self.decoder_lr_mul, name="fc1"
        )
        if return_params:
            # effective (w1, b1, w2, b2) for the fused Pallas render kernel
            w1, b1 = fc0(None, return_params=True)
            w2, b2 = fc1(None, return_params=True)
            return w1, b1, w2, b2
        # [B, 3, M, C] -> mean over planes -> MLP
        x = jnp.mean(sampled_features.astype(jnp.float32), axis=1)
        B, M, C = x.shape
        x = x.reshape(B * M, C)
        x = fc0(x)
        x = jax.nn.softplus(x)
        x = fc1(x)
        x = x.reshape(B, M, -1)
        rgb = jax.nn.sigmoid(x[..., 1:]) * (1 + 2 * 0.001) - 0.001  # MipNeRF sigmoid clamp
        sigma = x[..., 0:1]
        return {"rgb": rgb, "sigma": sigma}


def _to_planes(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, 3*C] -> [B, 3, H, W, C] (channel-major grouping like torch view)."""
    B, H, W, C3 = x.shape
    x = x.reshape(B, H, W, 3, C3 // 3)
    return jnp.transpose(x, (0, 3, 1, 2, 4))


class TriPlaneGenerator(nn.Module):
    z_dim: int
    c_dim: int
    w_dim: int
    img_resolution: int
    img_channels: int
    sr_num_fp16_res: int = 0
    rendering_kwargs: Any = None  # dict with the reference's key names (SURVEY §2)
    neural_rendering_resolution: int = 128
    channel_base: int = 32768
    channel_max: int = 512
    num_fp16_res: int = 0
    conv_clamp: Optional[float] = 256.0
    map_num_layers: int = 2

    def setup(self):
        rk = self.rendering_kwargs or {}
        common = dict(
            z_dim=self.z_dim,
            c_dim=self.c_dim,
            w_dim=self.w_dim,
            img_resolution=256,
            channel_base=self.channel_base,
            channel_max=self.channel_max,
            num_fp16_res=self.num_fp16_res,
            conv_clamp=self.conv_clamp,
            map_num_layers=self.map_num_layers,
        )
        self.texture_backbone = Generator(img_channels=32, **common)
        self.face_backbone = Generator(img_channels=32, **common)
        self.backbone = Generator(
            img_channels=32 * 3, mapping_ws=self.texture_backbone.synthesis.num_ws, **common
        )
        sr_name = rk.get(
            "superresolution_module",
            "training_avatar_texture.superresolution.SuperresolutionHybrid8XDC",
        ).rsplit(".", 1)[-1]
        from . import superresolution as sr_mod

        self.superresolution = getattr(sr_mod, sr_name)(
            channels=32,
            img_resolution=self.img_resolution,
            sr_num_fp16_res=self.sr_num_fp16_res,
            sr_antialias=rk.get("sr_antialias", True),
        )
        self.decoder = OSGDecoder(
            32,
            decoder_lr_mul=rk.get("decoder_lr_mul", 1.0),
            decoder_output_dim=32,
        )
        self.renderer = ImportanceRenderer()

    # ------------------------------------------------------------------ mapping
    def mapping(self, z, c, truncation_psi=1.0, truncation_cutoff=None, update_emas=False):
        """triplane_v20.py:64-70: zero/scale the pose conditioning label."""
        rk = self.rendering_kwargs or {}
        if rk.get("c_gen_conditioning_zero", True):
            c = jnp.zeros_like(c)
        c = c[:, : self.c_dim]
        return self.backbone.mapping(
            z,
            c * rk.get("c_scale", 0.0),
            truncation_psi=truncation_psi,
            truncation_cutoff=truncation_cutoff,
            update_emas=update_emas,
        )

    # ---------------------------------------------------------------- rasterize
    def precompute_raster_static(self, static_feats: List[jnp.ndarray], bbox_256=BBOX_256):
        """Frame-independent half of `rasterize`: the per-level bbox crop +
        antialias resize of the static features. A compiled avatar's
        (ws, texture_feats, static_feats) are fixed across the animation loop
        (SURVEY §3.3), so callers on the hot path compute this once and pass
        it to `synthesis_withTexture(raster_static_cache=...)`. `static_feats`
        here is the raw backbone list (plane-0 selection happens inside)."""
        feats = self._static_feats_for_raster(static_feats)
        out = []
        for static in feats:
            res = static.shape[1]  # level taps share the texture pyramid's res
            bbox = [round(i * res / 256) for i in bbox_256]
            crop = static[:, bbox[0] : bbox[1], bbox[2] : bbox[3], :]
            out.append(resize_bilinear(crop.astype(jnp.float32), (res, res), antialias=True))
        return out

    def _fast_uv_enabled(self) -> bool:
        return bool((self.rendering_kwargs or {}).get("fast_uv_warp", False)) and (
            jax.devices()[0].platform == "tpu"
        )

    def _texture_group_sources(self, texture_feats: List[jnp.ndarray], grid_res: int):
        """{resolution: gather source} for the grouped-by-resolution UV warps.

        Each group's channel-concat is built at a COMMON dtype (explicit cast —
        jnp.concatenate's silent promotion would otherwise gather a stray bf16
        tap at fp32 width, doubling its HBM traffic) and, on the fast-uv path,
        full-res fp32 sources are pre-cast to bf16 exactly as `rasterize`'s
        warp branch would. The pyramid is fixed per compiled avatar, so hot
        loops hoist this via `precompute_texture_concat`."""
        fast_uv = self._fast_uv_enabled()
        by_res: dict = {}
        for idx, texture in enumerate(texture_feats):
            by_res.setdefault(texture.shape[1], []).append(idx)
        sources = {}
        for res, idxs in by_res.items():
            group = [texture_feats[i] for i in idxs]
            if len(group) == 1:
                cat = group[0]
            else:
                common = jnp.result_type(*group)
                cat = jnp.concatenate([g.astype(common) for g in group], axis=-1)
            if not (fast_uv and res < grid_res):
                # full-res warp branch: fp32 taps gather as bf16 under fast-uv
                # (half the traffic; same error class as the bf16 backbone taps)
                if fast_uv and cat.dtype == jnp.float32:
                    cat = cat.astype(jnp.bfloat16)
            # the key carries the grid_res the dtype decision above was made
            # for (ADVICE r4): using a cache built for one uvcoords resolution
            # with another would silently mis-cast groups — the keyed lookup
            # in `rasterize` turns that into a loud error instead
            sources[(res, grid_res)] = cat
        return sources

    def precompute_texture_concat(self, texture_feats: List[jnp.ndarray], grid_res: int = 256):
        """Frame-independent half of the UV warp: the per-resolution
        channel-concat gather sources (ADVICE r3 — rebuilt per frame
        otherwise). Pass to `synthesis_withTexture(texture_concat_cache=...)`
        alongside `raster_static_cache`. `grid_res` must be the uvcoords
        resolution the cache will be used with (256 for every shipped config)."""
        return self._texture_group_sources(texture_feats, grid_res)

    def rasterize(
        self,
        texture_feats: List[jnp.ndarray],
        uvcoords_image: jnp.ndarray,  # [B, 256, 256, 3]
        static_feats: List[jnp.ndarray],
        bbox_256=BBOX_256,
        static_small: Optional[List[jnp.ndarray]] = None,
        texture_concat_cache: Optional[dict] = None,
    ):
        """UV-warp texture pyramid + blend with cropped static feats (:317-339)."""
        uvcoords_image = uvcoords_image.astype(jnp.float32)
        grid = uvcoords_image[..., :2]
        alpha = uvcoords_image[..., 2:3]
        full_alpha, mouth_masks = fill_mouth(alpha)
        # upper-mouth mask: zero out rows above 87 (256-space)
        upper = mouth_masks.at[:, :87].set(0.0)
        upper_alpha = jnp.clip(alpha + upper, 0.0, 1.0)

        # TPU fast path (rendering_kwargs['fast_uv_warp']): for sub-256 levels,
        # warp at the TARGET resolution through the alpha-weighted downsampled
        # grid instead of warping 256² points of a C≤512 texture and resizing
        # down — the reference order (triplane_v20.py:331) is exact but costs
        # ~64× the gather traffic on the 512-ch taps. The downsampled grid is
        # the alpha-weighted cell-mean of the valid UVs, so interior cells are
        # near-exact; fidelity gated by scripts/fidelity_flagship.py.
        fast_uv = self._fast_uv_enabled()

        # Group levels by resolution and warp each group's channel-concat in
        # ONE grid_sample (bilinear lookup is channel-independent, so this is
        # exact): the v20 pyramid has two 32² taps (32+512ch) and two 256²
        # taps (128+32ch) — merging turns the narrow 32-ch gathers (64 B rows,
        # slice-latency bound) into wide-row gathers and halves the op count.
        # The concat sources are avatar-fixed; hot loops pass them precomputed.
        by_res: dict = {}
        for idx, texture in enumerate(texture_feats):
            by_res.setdefault(texture.shape[1], []).append(idx)
        sources = (
            texture_concat_cache
            if texture_concat_cache is not None
            else self._texture_group_sources(texture_feats, grid.shape[1])
        )

        warped_by_idx = {}
        alpha_by_res = {}
        upper_by_res = {}
        for res, idxs in by_res.items():
            key = (res, grid.shape[1])
            if key not in sources:
                built_for = sorted({k[1] for k in sources})
                raise ValueError(
                    f"texture_concat_cache was built for grid_res={built_for} "
                    f"but is used with uvcoords resolution {grid.shape[1]} — "
                    "the fast-uv dtype decision is grid_res-dependent; rebuild "
                    "the cache with precompute_texture_concat(tex, grid_res="
                    f"{grid.shape[1]})"
                )
            cat = sources[key]
            assert cat.shape[-1] == sum(texture_feats[i].shape[-1] for i in idxs), (
                "texture_concat_cache does not match the texture pyramid"
            )
            alpha_ = alpha if res == grid.shape[1] else resize_bilinear(
                alpha, (res, res), antialias=True
            )
            if fast_uv and res < grid.shape[1]:
                g_s = resize_bilinear(grid * alpha, (res, res), antialias=True) / jnp.maximum(
                    alpha_, 1e-4
                )
                warped = grid_sample(cat, g_s)  # [B, res, res, ΣC] fp32
            else:
                # row gather wins here: the wide-C texture taps (up to 512ch)
                # give large per-row slices (patch variant measured slower);
                # the bf16 fast-uv cast already happened in the source build.
                warped = grid_sample(cat, grid)  # [B, 256, 256, ΣC] fp32 blend
                if res != grid.shape[1]:
                    warped = resize_bilinear(warped, (res, res), antialias=True)
            off = 0
            for i in idxs:
                c = texture_feats[i].shape[-1]
                warped_by_idx[i] = warped[..., off : off + c]
                off += c
            alpha_by_res[res] = alpha_
            upper_by_res[res] = (
                upper_alpha if res == grid.shape[1] else resize_bilinear(
                    upper_alpha, (res, res), antialias=True
                )
            )

        rendering_images = []
        for idx, texture in enumerate(texture_feats):
            res = texture.shape[1]
            bbox = [round(i * res / 256) for i in bbox_256]
            rendering_feat = warped_by_idx[idx]
            alpha_ = alpha_by_res[res]
            if static_small is not None:
                static_feat = static_small[idx]
            else:
                static_crop = static_feats[idx][:, bbox[0] : bbox[1], bbox[2] : bbox[3], :]
                static_feat = resize_bilinear(
                    static_crop.astype(jnp.float32), (res, res), antialias=True
                )
            rendering_images.append(
                jnp.concatenate(
                    [
                        rendering_feat * alpha_ + static_feat * (1 - alpha_),
                        upper_by_res[res],
                    ],
                    axis=-1,
                )
            )
        return rendering_images, full_alpha, mouth_masks

    # ----------------------------------------------------------- plane blending
    def _blend_planes(self, rendering_stitch, full_alpha, static_plane, bbox_256=BBOX_256):
        """Paste the 128²-resized face render/alpha into the frontal plane and
        alpha-blend against the static tri-plane (:119-128). Only plane 0 differs."""
        B, H, W, C = rendering_stitch.shape  # 256² 32ch
        y0, x0 = bbox_256[0], bbox_256[2]
        face_h, face_w = bbox_256[1] - bbox_256[0], bbox_256[3] - bbox_256[2]

        stitch_small = resize_bilinear(rendering_stitch, (face_h, face_w), antialias=True)
        alpha_small = resize_bilinear(full_alpha, (face_h, face_w), antialias=True)
        stitch_full = jnp.zeros((B, H, W, C), jnp.float32)
        alpha_full = jnp.zeros((B, H, W, 1), jnp.float32)
        stitch_full = jax.lax.dynamic_update_slice(stitch_full, stitch_small, (0, y0, x0, 0))
        alpha_full = jax.lax.dynamic_update_slice(alpha_full, alpha_small, (0, y0, x0, 0))

        # plane 0 blended, planes 1/2 keep the static features (alpha = 0 there)
        zeros_s = jnp.zeros_like(stitch_full)
        stitch3 = jnp.stack([stitch_full, zeros_s, zeros_s], axis=1)  # [B, 3, H, W, C]
        zeros_a = jnp.zeros_like(alpha_full)
        alpha3 = jnp.stack([alpha_full, zeros_a, zeros_a], axis=1)
        return stitch3 * alpha3 + static_plane.astype(jnp.float32) * (1 - alpha3)

    def _static_feats_for_raster(self, static_feats):
        """Take plane 0 of the 96-ch taps at both ends of the feature list (:109-112)."""
        out = list(static_feats)
        out[0] = _to_planes(out[0])[:, 0]
        out[-1] = _to_planes(out[-1])[:, 0]
        return out

    def _render_core(
        self, ws, c, rendering_stitch, full_alpha, static_plane, evaluation, noise_mode, rng,
        rendering_overrides: Optional[Dict] = None,
    ):
        rk = dict(self.rendering_kwargs or {})
        # the shipped ImportanceRenderer_bsMotion ignores the config's numeric
        # ray_start/ray_end and always uses the ‖ray_o‖-based bounds
        # (renderer.py:311-313); strip them so the shared renderer does too
        rk.pop("ray_start", None)
        rk.pop("ray_end", None)
        if rendering_overrides:
            # per-call sampling/kernel routing overrides (e.g. the inversion
            # training loops' no-grad renders take the structured fast paths
            # regardless of the training config — train/fast_render.py)
            rk.update(rendering_overrides)
        cam = c[:, -25:]
        cam2world = cam[:, :16].reshape(-1, 4, 4)
        intrinsics = cam[:, 16:25].reshape(-1, 3, 3)
        res = self.neural_rendering_resolution
        ray_o, ray_d = sample_rays(cam2world, intrinsics, res)

        blended_planes = self._blend_planes(rendering_stitch, full_alpha, static_plane)

        # staged rematerialization (rk['remat_stages'] / rendering_overrides):
        # the literal-formulation training render's backward holds the volume
        # pass's gather residuals AND the SR/backbone residuals at once — the
        # sum ResourceExhausts a 16 GB v5e at nrr=128 (docs/train_tpu_run.json
        # r4). With each stage rematted, the forward stores only stage
        # boundaries and the backward peak is the LARGEST stage, not the sum.
        remat_stages = bool(rk.get("remat_stages", False))

        decoder_params = self.decoder(None, return_params=True)

        def _volume(m, planes_, ray_o_, ray_d_, rng_, dec_params):
            dec = lambda feats: m.decoder(feats)
            return m.renderer(
                planes_, dec, ray_o_, ray_d_, rk, evaluation=evaluation, rng=rng_,
                decoder_params=dec_params,
            )

        if remat_stages:
            _volume = nn.remat(_volume)
        feature_samples, depth_samples, _ = _volume(
            self, blended_planes, ray_o, ray_d, rng, decoder_params
        )
        B = ws.shape[0]
        feature_image = feature_samples.reshape(B, res, res, feature_samples.shape[-1])
        depth_image = depth_samples.reshape(B, res, res, 1)
        rgb_image = feature_image[..., :3]

        def _sr(m, rgb_, feat_, ws_):
            return m.superresolution(
                rgb_, feat_, ws_, noise_mode=rk.get("superresolution_noise_mode", "none")
            )

        if remat_stages:
            _sr = nn.remat(_sr)
        sr_image = _sr(self, rgb_image, feature_image, ws)
        return {
            "image": sr_image,
            "image_raw": rgb_image,
            "image_depth": depth_image,
            "feature_image": feature_image,
            "triplane": blended_planes,
        }

    def _rng(self):
        return self.make_rng("ray") if self.has_rng("ray") else jax.random.PRNGKey(0)

    # ---------------------------------------------------------------- synthesis
    def synthesis(
        self,
        ws,
        c,
        mesh_condition: Dict[str, jnp.ndarray],
        evaluation: bool = False,
        noise_mode: str = "random",
        return_featmap: bool = False,
        rendering_overrides: Optional[Dict] = None,
    ):
        """Full forward (triplane_v20.py:89-150)."""
        texture_feats = self.texture_backbone.synthesis(ws, return_list=True, noise_mode=noise_mode)
        static_feats = self.backbone.synthesis(ws, return_list=True, noise_mode=noise_mode)
        static_plane = _to_planes(static_feats[-1])

        rendering_images, full_alpha, _ = self.rasterize(
            texture_feats,
            mesh_condition["uvcoords_image"],
            self._static_feats_for_raster(static_feats),
        )
        rendering_stitch = self.face_backbone.synthesis(
            ws, cond_list=rendering_images, noise_mode=noise_mode
        )
        out = self._render_core(
            ws, c, rendering_stitch, full_alpha, static_plane, evaluation, noise_mode, self._rng(),
            rendering_overrides=rendering_overrides,
        )
        if return_featmap:
            out["texture"] = texture_feats
        else:
            out = {k: out[k] for k in ("image", "image_raw", "image_depth")}
        return out

    def synthesis_withTexture(
        self,
        ws,
        texture_feats: List[jnp.ndarray],
        c,
        mesh_condition: Dict[str, jnp.ndarray],
        static_feats: Optional[List[jnp.ndarray]] = None,
        evaluation: bool = False,
        noise_mode: str = "random",
        raster_static_cache: Optional[List[jnp.ndarray]] = None,
        texture_concat_cache: Optional[dict] = None,
        rendering_overrides: Optional[Dict] = None,
    ):
        """Same pipeline with precomputed texture/static features — the
        inversion/animation entry point (triplane_v20.py:152-244).

        `raster_static_cache` (from `precompute_raster_static`) skips the
        frame-independent static crop+resize inside `rasterize`, and
        `texture_concat_cache` (from `precompute_texture_concat`) the
        per-resolution concat of the texture pyramid — the animation loop's
        avatar features are fixed, so callers hoist both."""
        if static_feats is None:
            static_feats = self.backbone.synthesis(ws, return_list=True, noise_mode=noise_mode)
        static_plane = _to_planes(static_feats[-1])

        remat_stages = bool(
            (rendering_overrides or {}).get(
                "remat_stages", (self.rendering_kwargs or {}).get("remat_stages", False)
            )
        )

        def _raster_face(m, texture_feats_, uvc_, static_feats_, cache_, tex_cat_, ws_):
            rendering_images, full_alpha_, _ = m.rasterize(
                texture_feats_, uvc_, m._static_feats_for_raster(static_feats_),
                static_small=cache_, texture_concat_cache=tex_cat_,
            )
            stitch = m.face_backbone.synthesis(
                ws_, cond_list=rendering_images, noise_mode=noise_mode
            )
            return stitch, full_alpha_

        if remat_stages:
            _raster_face = nn.remat(_raster_face)
        rendering_stitch, full_alpha = _raster_face(
            self, texture_feats, mesh_condition["uvcoords_image"], static_feats,
            raster_static_cache, texture_concat_cache, ws,
        )
        return self._render_core(
            ws, c, rendering_stitch, full_alpha, static_plane, evaluation, noise_mode, self._rng(),
            rendering_overrides=rendering_overrides,
        )

    def synthesis_withCondition(
        self,
        ws,
        c,
        mesh_condition: Dict[str, jnp.ndarray],
        texture_feats_conditions=None,
        static_feats_conditions=None,
        evaluation: bool = False,
        noise_mode: str = "random",
        only_image: bool = False,
        return_feats: bool = False,
    ):
        """Recompute backbones with CS-SFT offsets injected (triplane_v20.py:246-315)."""
        texture_feats = self.texture_backbone.synthesis(
            ws, return_list=True, feat_conditions=texture_feats_conditions, noise_mode=noise_mode
        )
        static_feats = self.backbone.synthesis(
            ws, return_list=True, feat_conditions=static_feats_conditions, noise_mode=noise_mode
        )
        static_plane = _to_planes(static_feats[-1])
        rendering_images, full_alpha, _ = self.rasterize(
            texture_feats,
            mesh_condition["uvcoords_image"],
            self._static_feats_for_raster(static_feats),
        )
        rendering_stitch = self.face_backbone.synthesis(
            ws, cond_list=rendering_images, noise_mode=noise_mode
        )
        out = self._render_core(
            ws, c, rendering_stitch, full_alpha, static_plane, evaluation, noise_mode, self._rng()
        )
        if only_image:
            return {"image": out["image"]}
        if return_feats:
            out["static"] = static_feats
            out["texture"] = texture_feats
        return out

    # ------------------------------------------------------------ density probes
    def sample_mixed(self, coordinates, ws, mesh_condition, noise_mode: str = "random"):
        """Density/color at arbitrary 3D coords from ws (triplane_v20.py:373-402);
        used for shape extraction and the density TV regularizer."""
        rk = self.rendering_kwargs or {}
        texture_feats = self.texture_backbone.synthesis(ws, return_list=True, noise_mode=noise_mode)
        static_feats = self.backbone.synthesis(ws, return_list=True, noise_mode=noise_mode)
        static_plane = _to_planes(static_feats[-1])
        rendering_images, full_alpha, _ = self.rasterize(
            texture_feats,
            mesh_condition["uvcoords_image"],
            self._static_feats_for_raster(static_feats),
        )
        rendering_stitch = self.face_backbone.synthesis(
            ws, cond_list=rendering_images, noise_mode=noise_mode
        )
        blended_planes = self._blend_planes(rendering_stitch, full_alpha, static_plane)
        decoder = lambda feats: self.decoder(feats)
        return self.renderer.run_model(blended_planes, decoder, coordinates, rk)

    def sample(self, coordinates, z, c, mesh_condition, truncation_psi=1.0,
               truncation_cutoff=None, noise_mode: str = "random"):
        """triplane_v20.py:341-371 — like sample_mixed but from z."""
        ws = self.mapping(z, c, truncation_psi=truncation_psi, truncation_cutoff=truncation_cutoff)
        return self.sample_mixed(coordinates, ws, mesh_condition, noise_mode=noise_mode)

    def __call__(self, z, c, mesh_condition, truncation_psi=1.0, truncation_cutoff=None,
                 evaluation: bool = False, noise_mode: str = "random", update_emas: bool = False):
        ws = self.mapping(
            z, c, truncation_psi=truncation_psi, truncation_cutoff=truncation_cutoff,
            update_emas=update_emas,
        )
        return self.synthesis(ws, c, mesh_condition, evaluation=evaluation, noise_mode=noise_mode)
