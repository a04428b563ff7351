"""FaceVerse v3 3DMM — coefficient pipeline as pure JAX linear algebra.

Behavioral counterpart of `data_preprocess/FaceVerse/FaceVerseModel_v3.py:26-416`:
identity/expression blendshape evaluation with per-eye rotations, coefficient
split/merge, Euler rotations. Everything here is a handful of matmuls and
static slices — trivially jittable, no state.

Assets: the published `faceverse_v3_1.npy` dict (not redistributed here) is
loaded via `load_faceverse_assets`; tests use synthetic dicts of the same
schema.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class FaceVerseAssets(NamedTuple):
    meanshape: np.ndarray  # [1, 3V] (axis-flipped, scaled — see load)
    id_base: np.ndarray  # [3V, id_dims]
    exp_base: np.ndarray  # [3V, exp_dims]
    uv_per_ver: np.ndarray  # [V, 2]
    tri: np.ndarray  # [F, 3] int32
    ver_inds: Tuple[int, int, int]  # (l_eye_start, l_eye_end/r_eye_start, r_eye_end)
    id_dims: int
    exp_dims: int
    tex_dims: int
    # fitting-side texture model (FaceVerseModel_v3.py:46,266-269); None when
    # the published dict is loaded without them (geometry-only use)
    tex_base: Optional[np.ndarray] = None  # [3V, tex_dims]
    meantex: Optional[np.ndarray] = None  # [1, 3V]


def load_faceverse_assets(
    model_path: str, exp_base_path: Optional[str] = None
) -> FaceVerseAssets:
    """Load + preprocess the published model dict (FaceVerseModel_v3.py:41-57):
    meanshape/idBase/expBase get y,z negated, ×0.1, meanshape y += 1."""
    model_dict = np.load(model_path, allow_pickle=True).item()

    meanshape = model_dict["meanshape"].reshape(-1, 3).astype(np.float32)
    meanshape[:, [1, 2]] *= -1
    meanshape = meanshape * 0.1
    meanshape[:, 1] += 1
    meanshape = meanshape.reshape(1, -1)

    id_base = model_dict["idBase"].reshape(-1, 3, 150).astype(np.float32)
    id_base[:, [1, 2]] *= -1
    id_base = (id_base * 0.1).reshape(-1, 150)

    n3v = id_base.shape[0]  # 3 * num_vertices
    if exp_base_path is not None:  # expr_52 variant (metamodel/v3/exBase_52.npy)
        exp_base = np.load(exp_base_path).astype(np.float32)
    else:
        exp_base = np.asarray(model_dict["exBase"], dtype=np.float32)
    exp_dims = exp_base.size // n3v
    exp_base = exp_base.reshape(-1, 3, exp_dims)
    exp_base[:, [1, 2]] *= -1
    exp_base = (exp_base * 0.1).reshape(-1, exp_dims)

    return FaceVerseAssets(
        meanshape=meanshape,
        id_base=id_base,
        exp_base=exp_base,
        uv_per_ver=model_dict["uv_per_ver"].astype(np.float32),
        tri=model_dict["tri"].astype(np.int32),
        ver_inds=tuple(int(i) for i in model_dict["ver_inds"]),
        id_dims=id_base.shape[1],
        exp_dims=exp_dims,
        tex_dims=int(model_dict["texBase"].shape[1]) if "texBase" in model_dict else 251,
        tex_base=(
            np.asarray(model_dict["texBase"], np.float32) if "texBase" in model_dict else None
        ),
        meantex=(
            np.asarray(model_dict["meantex"], np.float32).reshape(1, -1)
            if "meantex" in model_dict
            else None
        ),
    )


@dataclasses.dataclass(frozen=True)
class FaceVerseModel:
    """Stateless coefficient pipeline over loaded assets."""

    assets: FaceVerseAssets

    @property
    def id_dims(self):
        return self.assets.id_dims

    @property
    def exp_dims(self):
        return self.assets.exp_dims

    @property
    def all_dims(self):
        return self.assets.id_dims + self.assets.exp_dims + self.assets.tex_dims

    def split_coeffs(self, coeffs: jnp.ndarray):
        """FaceVerseModel_v3.py:139-153 — (id, exp, tex, angles, gamma, trans, eye, scale)."""
        idd, expd, alld = self.id_dims, self.exp_dims, self.all_dims
        id_coeff = coeffs[:, :idd]
        exp_coeff = coeffs[:, idd : idd + expd]
        tex_coeff = coeffs[:, idd + expd : alld]
        angles = coeffs[:, alld : alld + 3]
        gamma = coeffs[:, alld + 3 : alld + 30]
        translation = coeffs[:, alld + 30 : alld + 33]
        if coeffs.shape[1] == alld + 36:
            eye_coeff = coeffs[:, alld + 33 :]
            scale = jnp.ones_like(coeffs[:, -1:])
        else:
            eye_coeff = coeffs[:, alld + 33 : -1]
            scale = coeffs[:, -1:]
        return id_coeff, exp_coeff, tex_coeff, angles, gamma, translation, eye_coeff, scale

    def merge_coeffs(self, id_coeff, exp_coeff, tex_coeff, angles, gamma, translation, eye, scale):
        return jnp.concatenate(
            [id_coeff, exp_coeff, tex_coeff, angles, gamma, translation, eye, scale], axis=1
        )

    def get_vs(self, id_coeff, exp_coeff, l_eye_mat=None, r_eye_mat=None,
               l_eye_mean=None, r_eye_mean=None, id_shape=None) -> jnp.ndarray:
        """Blendshape eval + eye rotations (FaceVerseModel_v3.py:237-245).

        `id_shape` ([B, V*3] = id_base@id + meanshape) skips the identity
        einsum — in a driving loop the identity is fixed, and without the
        cache the [V*3, n_id] basis read re-runs every frame (it also re-runs
        inside both eye-center helpers; FaceverseManager.set_identity caches
        all three)."""
        a = self.assets
        if id_shape is None:
            id_shape = (
                jnp.einsum("ij,aj->ai", jnp.asarray(a.id_base), id_coeff)
                + jnp.asarray(a.meanshape)
            )
        shape = id_shape + jnp.einsum("ij,aj->ai", jnp.asarray(a.exp_base), exp_coeff)
        B = exp_coeff.shape[0]
        vs = shape.reshape(B, -1, 3)
        if l_eye_mat is not None:
            i0, i1, i2 = a.ver_inds
            l = jnp.matmul(vs[:, i0:i1] - l_eye_mean, l_eye_mat) + l_eye_mean
            r = jnp.matmul(vs[:, i1:i2] - r_eye_mean, r_eye_mat) + r_eye_mean
            vs = jnp.concatenate([vs[:, :i0], l, r, vs[:, i2:]], axis=1)
        return vs

    def get_color(self, tex_coeff) -> jnp.ndarray:
        """Per-vertex albedo from the texture basis (FaceVerseModel_v3.py:266-269)."""
        a = self.assets
        assert a.tex_base is not None, "model dict loaded without texBase/meantex"
        tex = jnp.einsum("ij,aj->ai", jnp.asarray(a.tex_base), tex_coeff) + jnp.asarray(a.meantex)
        return tex.reshape(tex_coeff.shape[0], -1, 3)

    @staticmethod
    def add_illumination(face_texture, norm, gamma) -> jnp.ndarray:
        """2nd-order SH illumination of per-vertex albedo
        (FaceVerseModel_v3.py:359-391): gamma [B, 27] = 3x9 SH coeffs with a
        +0.8 ambient offset on band 0; standard SH basis over vertex normals."""
        B, V = face_texture.shape[:2]
        gamma = gamma.reshape(B, 3, 9)
        gamma = gamma.at[:, :, 0].add(0.8)
        gamma = jnp.transpose(gamma, (0, 2, 1))  # [B, 9, 3]

        a0 = np.pi
        a1 = 2 * np.pi / np.sqrt(3.0)
        a2 = 2 * np.pi / np.sqrt(8.0)
        c0 = 1 / np.sqrt(4 * np.pi)
        c1 = np.sqrt(3.0) / np.sqrt(4 * np.pi)
        c2 = 3 * np.sqrt(5.0) / np.sqrt(12 * np.pi)
        d0 = 0.5 / np.sqrt(3.0)

        nx, ny, nz = norm[..., 0], norm[..., 1], norm[..., 2]  # [B, V]
        H = jnp.stack(
            [
                a0 * c0 * jnp.ones_like(nx),
                -a1 * c1 * ny,
                a1 * c1 * nz,
                -a1 * c1 * nx,
                a2 * c2 * nx * ny,
                -a2 * c2 * ny * nz,
                a2 * c2 * d0 * (3 * nz**2 - 1),
                -a2 * c2 * nx * nz,
                a2 * c2 * 0.5 * (nx**2 - ny**2),
            ],
            axis=-1,
        )  # [B, V, 9]
        lighting = jnp.matmul(H, gamma)  # [B, V, 3]
        return face_texture * lighting

    def _eye_shape(self, id_coeff):
        a = self.assets
        shape = jnp.einsum("ij,aj->ai", jnp.asarray(a.id_base), id_coeff) + jnp.asarray(a.meanshape)
        return shape.reshape(id_coeff.shape[0], -1, 3)

    def get_l_eye_center(self, id_coeff):
        """FaceVerseModel_v3.py:254-258 (z += 0.005 then mean)."""
        i0, i1, _ = self.assets.ver_inds
        eye = self._eye_shape(id_coeff)[:, i0:i1]
        eye = eye.at[:, :, 2].add(0.005)
        return jnp.mean(eye, axis=1, keepdims=True)

    def get_r_eye_center(self, id_coeff):
        _, i1, i2 = self.assets.ver_inds
        eye = self._eye_shape(id_coeff)[:, i1:i2]
        eye = eye.at[:, :, 2].add(0.005)
        return jnp.mean(eye, axis=1, keepdims=True)

    @staticmethod
    def compute_eye_rotation_matrix(eye: jnp.ndarray) -> jnp.ndarray:
        """FaceVerseModel_v3.py:303-327: (rotY @ rotX).T per batch."""
        sinx, cosx = jnp.sin(eye[:, 0]), jnp.cos(eye[:, 0])
        siny, cosy = jnp.sin(eye[:, 1]), jnp.cos(eye[:, 1])
        zeros = jnp.zeros_like(sinx)
        ones = jnp.ones_like(sinx)
        rot_x = jnp.stack(
            [ones, zeros, zeros, zeros, cosx, -sinx, zeros, sinx, cosx], axis=-1
        ).reshape(-1, 3, 3)
        rot_y = jnp.stack(
            [cosy, zeros, siny, zeros, ones, zeros, -siny, zeros, cosy], axis=-1
        ).reshape(-1, 3, 3)
        return jnp.transpose(jnp.matmul(rot_y, rot_x), (0, 2, 1))

    @staticmethod
    def compute_rotation_matrix(angles: jnp.ndarray) -> jnp.ndarray:
        """FaceVerseModel_v3.py:329-357: (rotZ @ rotY @ rotX).T."""
        sinx, cosx = jnp.sin(angles[:, 0]), jnp.cos(angles[:, 0])
        siny, cosy = jnp.sin(angles[:, 1]), jnp.cos(angles[:, 1])
        sinz, cosz = jnp.sin(angles[:, 2]), jnp.cos(angles[:, 2])
        zeros = jnp.zeros_like(sinx)
        ones = jnp.ones_like(sinx)
        rot_x = jnp.stack(
            [ones, zeros, zeros, zeros, cosx, -sinx, zeros, sinx, cosx], axis=-1
        ).reshape(-1, 3, 3)
        rot_y = jnp.stack(
            [cosy, zeros, siny, zeros, ones, zeros, -siny, zeros, cosy], axis=-1
        ).reshape(-1, 3, 3)
        rot_z = jnp.stack(
            [cosz, -sinz, zeros, sinz, cosz, zeros, zeros, zeros, ones], axis=-1
        ).reshape(-1, 3, 3)
        return jnp.transpose(jnp.matmul(jnp.matmul(rot_z, rot_y), rot_x), (0, 2, 1))


def rigid_transform(vs: jnp.ndarray, rot: jnp.ndarray, trans: jnp.ndarray,
                    scale: jnp.ndarray) -> jnp.ndarray:
    """World transform (FaceVerseModel_v3.py:393-396): (vs·scale) @ rot + trans."""
    return jnp.matmul(vs * scale, rot) + trans.reshape(-1, 1, 3)


def compute_norm(vs: jnp.ndarray, tri: jnp.ndarray, point_buf: jnp.ndarray) -> jnp.ndarray:
    """Per-vertex normals (FaceVerseModel_v3.py:271-284): sum of adjacent
    (unnormalized) face normals gathered via point_buf [V, K] (a padded
    per-vertex face-adjacency list), then unit-normalized."""
    v1 = vs[:, tri[:, 0]]
    v2 = vs[:, tri[:, 1]]
    v3 = vs[:, tri[:, 2]]
    face_norm = jnp.cross(v1 - v2, v2 - v3)  # [B, F, 3]
    v_norm = jnp.sum(face_norm[:, point_buf], axis=2)  # [B, V, K, 3] -> [B, V, 3]
    return v_norm / (jnp.linalg.norm(v_norm, axis=2, keepdims=True) + 1e-9)


def project_vs(vs: jnp.ndarray, K: jnp.ndarray, cam_dist: float = 5.0) -> jnp.ndarray:
    """Perspective projection to pixel coords (ModelRenderer.project_vs,
    FaceVerseModel_v3.py:500-508): world xz flip, camera at (0,0,cam_dist),
    pinhole K, perspective divide."""
    reverse_xz = jnp.asarray([[-1.0, 0, 0], [0, 1.0, 0], [0, 0, -1.0]])
    cam = jnp.asarray([0.0, 0.0, cam_dist])
    p = jnp.matmul(vs, reverse_xz) + cam
    aug = jnp.matmul(p, jnp.asarray(K).T)
    return aug[..., :2] / aug[..., 2:3]


def batch_orth_proj(X: jnp.ndarray, camera: jnp.ndarray) -> jnp.ndarray:
    """Orthographic projection (reference renderer.py:636-646): scale/translate xy."""
    camera = camera.reshape(-1, 1, 3)
    x_trans = jnp.concatenate([X[:, :, :2] + camera[:, :, 1:], X[:, :, 2:]], axis=2)
    return camera[:, :, 0:1] * x_trans


def angle2matrix(angles_deg: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix from degrees (reference renderer.py:650-678)."""
    angles = angles_deg * (np.pi / 180.0)
    s, c = jnp.sin(angles), jnp.cos(angles)
    cx, cy, cz = c[:, 0], c[:, 1], c[:, 2]
    sx, sy, sz = s[:, 0], s[:, 1], s[:, 2]
    R = jnp.stack(
        [
            cz * cy, cz * sy * sx - sz * cx, cz * sy * cx + sz * sx,
            sz * cy, sz * sy * sx + cz * cx, sz * sy * cx - cz * sx,
            -sy, cy * sx, cy * cx,
        ],
        axis=0,
    )
    return R.reshape(-1, 3, 3)
