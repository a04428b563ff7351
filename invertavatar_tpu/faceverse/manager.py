"""Online driving-signal generation (reference `Faceverse_manager`,
data_preprocess/FaceVerse/renderer.py:11-84).

Per frame: FaceVerse coefficients → blendshape mesh (with eye rotations and
expression clamps) → FLAME-space transform → orthographic rasterization →
`uvcoords_image` [256, 256, 3] (expanded UV coordinates + binarized face mask).

TPU-native: the pytorch3d rasterizer is replaced by `render.rasterizer`
(tile-binned z-buffer raster in XLA); the crop `[128, 114, 256, 256]` of the
512² frame is folded into the raster window so only the cropped region is ever
rasterized. The whole per-frame path jits into one program.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..render.rasterizer import face_vertices, interpolate_attributes, rasterize
from .model import FaceVerseAssets, FaceVerseModel, load_faceverse_assets


class FaceverseManager:
    """Stateful wrapper holding assets + the avatar's identity coefficients."""

    # crop [left, top, w, h] of the 512² ortho frame (renderer.py:40)
    CROP = (128, 114, 256, 256)
    RENDER_RES = 512
    ORTH_SCALE = 5.0
    ORTH_SHIFT = np.array([0.0, 0.005, 0.0], np.float32)

    def __init__(
        self,
        assets: FaceVerseAssets,
        fv2fl: np.ndarray,  # [4, 4] FaceVerse→FLAME-space transform (fv2fl_30.npy)
        face_mask: np.ndarray,  # [V] vertex face-region mask (v31_face_mask_new.npy)
        base_coeff: Optional[np.ndarray] = None,
        faces_per_tile: int = 1024,
        raster_kwargs: Optional[dict] = None,  # extra rasterize() knobs
        # (tile/chunk/exact_cover) for the variant study in
        # docs/raster_r4.json + docs/raster_visibility.json
    ):
        self.model = FaceVerseModel(assets)
        self.fv2fl = np.asarray(fv2fl, np.float32)
        self.faces_per_tile = faces_per_tile
        self.raster_kwargs = dict(raster_kwargs or {})

        # expand the face area in UV space (renderer.py:23-25)
        uv = np.array(assets.uv_per_ver, np.float32)
        vert_idx = (
            (uv[:, 1] > 0.273) & (uv[:, 1] < 0.727) & (uv[:, 0] > 0.195) & (uv[:, 0] < 0.805)
        )
        uv[vert_idx] = (uv[vert_idx] - 0.5) * 1.4 + 0.5

        mask = np.asarray(face_mask, np.float32).copy()
        mask[assets.ver_inds[0] : assets.ver_inds[2]] = 1  # eyes always in-mask

        # per-vertex attrs (u*2-1, v*2-1, mask) gathered per face
        vert_attrs = np.concatenate([uv * 2 - 1, mask[:, None]], axis=-1)
        self.face_attrs = jnp.asarray(vert_attrs[assets.tri])  # [F, 3, 3]
        self.tri = jnp.asarray(assets.tri)

        self.id_coeff = None
        self.base_avatar_exp_coeff = None
        self._id_cache = None
        if base_coeff is not None:
            base_coeff = jnp.asarray(base_coeff)[None]
            self.id_coeff, self.base_avatar_exp_coeff = self.model.split_coeffs(base_coeff)[:2]
            self._refresh_id_cache()

        self._render = self._build_render_fn()

    @classmethod
    def from_files(cls, model_path: str, asset_dir: str, base_coeff=None,
                   exp_base_path: Optional[str] = None):
        assets = load_faceverse_assets(model_path, exp_base_path=exp_base_path)
        return cls(
            assets,
            fv2fl=np.load(os.path.join(asset_dir, "fv2fl_30.npy")),
            face_mask=np.load(os.path.join(asset_dir, "v31_face_mask_new.npy")),
            base_coeff=base_coeff,
        )

    def set_identity(self, coeff: np.ndarray):
        """Reference eval_seq.py:192: faceverser.id_coeff = split(source_coeff)."""
        c = jnp.asarray(coeff)
        if c.ndim == 1:
            c = c[None]
        self.id_coeff = self.model.split_coeffs(c)[0]
        self._refresh_id_cache()

    def _refresh_id_cache(self):
        """Identity-fixed blendshape terms, computed ONCE per identity: the
        id-basis shape and both eye centers. Without this the per-frame
        driving program runs the [V*3, n_id] identity einsum three times
        (get_vs + both eye-center helpers) for a vector that never changes
        during a driving sequence (docs/online_anatomy.json
        driven_blendshapes)."""
        a = self.model.assets
        import jax.numpy as _jnp

        id_shape = (
            _jnp.einsum("ij,aj->ai", _jnp.asarray(a.id_base), self.id_coeff)
            + _jnp.asarray(a.meanshape)
        )
        self._id_cache = (
            id_shape,
            self.model.get_l_eye_center(self.id_coeff),
            self.model.get_r_eye_center(self.id_coeff),
        )

    def _build_render_fn(self):
        model = self.model
        fv2fl = jnp.asarray(self.fv2fl)
        orth_shift = jnp.asarray(self.ORTH_SHIFT)
        left, top, w, h = self.CROP
        R = self.RENDER_RES
        # fold the crop into the raster window: pixel_x = (x+1)/2*R
        window = (
            2 * left / R - 1.0,
            2 * (left + w) / R - 1.0,
            2 * top / R - 1.0,
            2 * (top + h) / R - 1.0,
        )
        tri = self.tri
        face_attrs = self.face_attrs
        fpt = self.faces_per_tile
        extra_raster = dict(self.raster_kwargs)

        @jax.jit
        def render(id_shape, l_eye_mean, r_eye_mean, exp_coeff, eye_coeff):
            l_eye_mat = model.compute_eye_rotation_matrix(eye_coeff[:, :2])
            r_eye_mat = model.compute_eye_rotation_matrix(eye_coeff[:, 2:])

            vs = model.get_vs(None, exp_coeff, l_eye_mat, r_eye_mat,
                              l_eye_mean, r_eye_mean, id_shape=id_shape)
            vert = jnp.matmul(vs[0], fv2fl[:3, :3].T) + fv2fl[:3, 3:].T

            transformed = (vert + orth_shift) * self.ORTH_SCALE  # tform = identity
            # batch_orth_proj with cam (1,0,0) is identity on xy; z flipped
            transformed = transformed.at[:, 2].multiply(-1.0)

            out = rasterize(
                transformed, tri, height=h, width=w, window=window,
                faces_per_tile=fpt, cull_backfaces=False,
                # one-sort anchor binning: the per-tile batched sort was 4.3 of
                # the raster's 7 ms at this F=59k config (docs/raster_profile
                # .json); bitwise-equal by tests/test_rasterizer.py
                binning="anchor",
                **extra_raster,
            )
            rendering = interpolate_attributes(out, face_attrs)  # [h, w, 4] = (u, v, mask, vis)
            render_mask = rendering[..., 3:4] * rendering[..., 2:3]
            rendering = rendering * render_mask
            uvcoords = rendering[..., :3]
            # binarize the mask channel (renderer.py:82-83)
            uvcoords = uvcoords.at[..., 2].set((uvcoords[..., 2] >= 0.5).astype(jnp.float32))
            return uvcoords[None]  # [1, 256, 256, 3]

        return render

    def make_driven_rendering(self, drive_coeff, base_drive_coeff=None):
        """Per-frame driving signal (renderer.py:45-84) -> uvcoords_image [1,256,256,3]."""
        drive_coeff = jnp.asarray(drive_coeff)
        if drive_coeff.ndim == 1:
            drive_coeff = drive_coeff[None]
        _, exp_coeff, _, _, _, _, eye_coeff, _ = self.model.split_coeffs(drive_coeff)
        # clamp two jaw-adjacent blendshapes (renderer.py:48-49)
        exp_coeff = exp_coeff.at[:, -4].set(jnp.clip(exp_coeff[:, -4], -0.75, 0.6))
        exp_coeff = exp_coeff.at[:, -2].set(jnp.clip(exp_coeff[:, -2], -0.75, 0.75))
        if base_drive_coeff is not None:
            base_exp = self.model.split_coeffs(jnp.asarray(base_drive_coeff)[None])[1]
            exp_coeff = (exp_coeff - base_exp) + self.base_avatar_exp_coeff
        assert self.id_coeff is not None, "identity coefficients not set"
        id_shape, l_eye_mean, r_eye_mean = self._id_cache
        return self._render(id_shape, l_eye_mean, r_eye_mean, exp_coeff, eye_coeff)
