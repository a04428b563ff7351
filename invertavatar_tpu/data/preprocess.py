"""Offline preprocessing glue (reference data_preprocess/ chain, SURVEY §2.2 L9).

The reference pipeline: frame extraction → MTCNN 5-point landmarks →
smoothed FFHQ-style crop/align (`align_in_the_wild.py`) → FaceVerse fitting
(external havatar tool) → dataset assembly (`make_dataset_pipe.py`) emitting
the preprocessed-dataset contract consumed by `data/dataset.py`.

Landmark detection and 3DMM fitting remain external (vendored CUDA tools in
the reference; SURVEY §2.1 marks them out of the TPU runtime's scope). This
module provides the host-side math around them:

  * `align_quad` / `align_image` — the standard 5-point FFHQ alignment
    (eye/mouth axes → source quad, bilinear quad-to-square warp)
  * `smooth_landmark_sequence` — per-video Gaussian-filtered landmark tracks
    so crops don't jitter (align_in_the_wild.py:264 idiom)
  * `render_uvcoords_for_video` — regenerates `orthRender256x256_face_eye`
    npys on-device from fitted FaceVerse coefficients via `FaceverseManager`
  * `write_dataset_json` — assembles `dataset_realcam.json` / `dataset.json`
"""

from __future__ import annotations

import json
import os
from typing import Dict, Iterable, List, Optional, Sequence

import numpy as np
import PIL.Image
from scipy.ndimage import gaussian_filter1d


def align_quad(lm5p: np.ndarray) -> np.ndarray:
    """5-point landmarks [(lefteye, righteye, nose, leftmouth, rightmouth)] ->
    source quad [4, 2] (FFHQ alignment geometry)."""
    eye_left, eye_right = lm5p[0], lm5p[1]
    mouth_left, mouth_right = lm5p[3], lm5p[4]
    eye_avg = (eye_left + eye_right) * 0.5
    eye_to_eye = eye_right - eye_left
    mouth_avg = (mouth_left + mouth_right) * 0.5
    eye_to_mouth = mouth_avg - eye_avg

    x = eye_to_eye - np.flipud(eye_to_mouth) * [-1, 1]
    x /= np.hypot(*x)
    x *= max(np.hypot(*eye_to_eye) * 2.0, np.hypot(*eye_to_mouth) * 1.8)
    y = np.flipud(x) * [-1, 1]
    c = eye_avg + eye_to_mouth * 0.1
    return np.stack([c - x - y, c - x + y, c + x + y, c + x - y])


def align_image(
    img: PIL.Image.Image,
    lm5p: np.ndarray,
    output_size: int = 512,
    transform_size: int = 2048,
) -> PIL.Image.Image:
    """Quad-to-square warp of the aligned face region."""
    quad = align_quad(np.asarray(lm5p, np.float64))
    img = img.transform(
        (transform_size, transform_size), PIL.Image.QUAD, (quad + 0.5).flatten(), PIL.Image.BILINEAR
    )
    if output_size < transform_size:
        img = img.resize((output_size, output_size), PIL.Image.LANCZOS)
    return img


def smooth_landmark_sequence(lms: np.ndarray, sigma: float = 3.0) -> np.ndarray:
    """Temporal Gaussian smoothing of per-frame landmarks [T, K, 2]."""
    if sigma <= 0:
        return lms
    return gaussian_filter1d(np.asarray(lms, np.float64), sigma=sigma, axis=0)


def align_video_frames(
    frames: Sequence[PIL.Image.Image],
    lm5p_seq: np.ndarray,  # [T, 5, 2]
    output_size: int = 512,
    smooth_sigma: float = 3.0,
) -> List[PIL.Image.Image]:
    lm5p_seq = smooth_landmark_sequence(lm5p_seq, smooth_sigma)
    return [align_image(f, lm, output_size) for f, lm in zip(frames, lm5p_seq)]


def write_dataset_json(
    out_dir: str,
    labels: Dict[str, Sequence[float]],  # fname -> 25-dim camera (16 c2w + 9 K)
    extra_labels: Optional[Dict[str, Sequence[float]]] = None,
) -> None:
    """Emit dataset_realcam.json (+ dataset.json) per the contract."""
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "dataset_realcam.json"), "w") as f:
        json.dump({"labels": {k: list(map(float, v)) for k, v in labels.items()}}, f)
    with open(os.path.join(out_dir, "dataset.json"), "w") as f:
        src = extra_labels if extra_labels is not None else labels
        json.dump({"labels": {k: list(map(float, v)) for k, v in src.items()}}, f)


def render_uvcoords_for_video(
    manager,  # faceverse.FaceverseManager with identity set
    coeff_paths: Iterable[str],
    out_dir: str,
) -> None:
    """Regenerate orthRender256x256_face_eye/*.npy from fitted coefficients
    (offline counterpart of the reference's preprocessing raster step)."""
    os.makedirs(out_dir, exist_ok=True)
    for path in coeff_paths:
        coeff = np.load(path).astype(np.float32)
        uvc = np.asarray(manager.make_driven_rendering(coeff))[0]
        stem = os.path.splitext(os.path.basename(path))[0]
        np.save(os.path.join(out_dir, stem + ".npy"), uvc.astype(np.float16))


# --------------------------------------------------------------- uvRender step
# Counterpart of reference data_preprocess/preprocess_faceverse.py:330-412
# (save_uv_): per-frame UV-space projected-position maps (`uv_pverts` fp16 npy)
# and UV-unwrapped ground-truth textures (`*_uvgttex.png` uint8), the inputs of
# `uvnet.get_unet_uvinput` (uvnet.py:117-121) and the eval CLIs' load_uv path.


def expand_uv_islands(vert_uvcoords: np.ndarray) -> tuple:
    """Enlarge the face region of the UV atlas (preprocess_faceverse.py:347-349:
    the [0.195..0.805]x[0.273..0.727] block scales x1.4 about the center).
    Returns (expanded uv [V,2], vert_idx bool mask of expanded verts)."""
    uv = np.array(vert_uvcoords[:, :2], np.float32)
    vert_idx = (
        (uv[:, 1] > 0.273) & (uv[:, 1] < 0.727) & (uv[:, 0] > 0.195) & (uv[:, 0] < 0.805)
    )
    uv[vert_idx] = (uv[vert_idx] - 0.5) * 1.4 + 0.5
    return uv, vert_idx


def build_uv_raster(
    vert_uvcoords: np.ndarray,  # [V, 2] in [0, 1] (model_dict['uv_per_ver'])
    faces: np.ndarray,  # [F, 3]
    vert_mask: np.ndarray,  # [V] face-region mask (v31_face_mask_new + eye verts)
    res: int = 256,
    faces_per_tile: int = 2048,
):
    """One-time UV-space rasterization (preprocess_faceverse.py:346-360).

    The mesh is flattened into the UV atlas: vertex position = uv*2-1 with
    z = 1 - mask so masked (face) triangles win island overlaps. Pixel
    orientation follows the dataset contract: uv value (u, v) lands at pixel
    ((u+1)/2*res, (v+1)/2*res) — exactly where `grid_sample(tex, uv)` reads,
    keeping uv_pverts/uvgttex self-consistent with `uvcoords_image`.
    Returns (RasterOut, masked vert_mask)."""
    import jax.numpy as jnp

    from ..render.rasterizer import rasterize

    uv, vert_idx = expand_uv_islands(vert_uvcoords)
    mask = np.array(vert_mask, np.float32).reshape(-1)
    mask = mask * vert_idx  # vert_mask zeroed outside the expanded block (:358)
    verts = np.concatenate([uv * 2.0 - 1.0, (1.0 - mask)[:, None]], axis=-1)
    out = rasterize(
        jnp.asarray(verts), jnp.asarray(np.asarray(faces, np.int32)),
        height=res, width=res, window=(-1.0, 1.0, -1.0, 1.0),
        faces_per_tile=faces_per_tile, cull_backfaces=False,
    )
    return out, mask


def uv_pverts_map(
    model,  # faceverse.FaceVerseModel
    coeff: np.ndarray,  # [1, all_dims] fitted FaceVerse coefficients
    uv_raster,  # RasterOut from build_uv_raster
    faces: np.ndarray,
    vert_mask: np.ndarray,  # the masked vert_mask returned by build_uv_raster
    point_buf: np.ndarray,  # [V, K] per-vertex face adjacency (padded)
    K: np.ndarray,  # [3, 3] pinhole intrinsics (focal_ratio * img_res)
    uv_face_eye_mask: Optional[np.ndarray] = None,  # [res, res] static png mask
    cam_dist: float = 5.0,
    img_res: int = 512,
) -> np.ndarray:
    """Per-frame UV projected-position map (preprocess_faceverse.py:394-406).

    Per vertex: world transform -> perspective projection to [-1,1] -> visible
    = mask * (view-space normal z > 0.1); interpolated over the UV raster,
    multiplied by coverage; mask channel optionally ANDed with the static
    face/eye png. Returns [res, res, 3] float32 (callers save fp16 npy)."""
    import jax.numpy as jnp

    from ..faceverse.model import compute_norm, project_vs, rigid_transform
    from ..render.rasterizer import face_vertices, interpolate_attributes

    coeff = jnp.asarray(np.asarray(coeff, np.float32).reshape(1, -1))
    id_c, exp_c, _tex, angles, _gamma, trans, eye, scale = model.split_coeffs(coeff)
    l_eye_mat = model.compute_eye_rotation_matrix(eye[:, :2])
    r_eye_mat = model.compute_eye_rotation_matrix(eye[:, 2:])
    vs = model.get_vs(id_c, exp_c, l_eye_mat, r_eye_mat,
                      model.get_l_eye_center(id_c), model.get_r_eye_center(id_c))
    rot = model.compute_rotation_matrix(angles)
    vs_t = rigid_transform(vs, rot, trans, jnp.abs(scale))
    vs_norm = compute_norm(vs_t, jnp.asarray(np.asarray(faces, np.int32)),
                           jnp.asarray(np.asarray(point_buf, np.int64)))
    vs_proj = project_vs(vs_t, K, cam_dist=cam_dist) / img_res * 2.0 - 1.0  # [1, V, 2]

    visible = jnp.asarray(vert_mask).reshape(1, -1, 1) * (vs_norm[..., 2:] > 0.1)
    vert_attr = jnp.concatenate([vs_proj, visible.astype(jnp.float32)], axis=-1)[0]  # [V, 3]
    rendered = interpolate_attributes(
        uv_raster, face_vertices(vert_attr, jnp.asarray(np.asarray(faces, np.int32)))
    )  # [res, res, 4]; last = coverage
    uv_pverts = rendered[..., :3] * rendered[..., 3:]
    if uv_face_eye_mask is not None:
        uv_pverts = uv_pverts.at[..., 2].multiply(jnp.asarray(uv_face_eye_mask))
    return np.asarray(uv_pverts, np.float32)


def uv_gttex_image(image: np.ndarray, uv_pverts: np.ndarray) -> np.ndarray:
    """UV-unwrapped ground-truth texture (preprocess_faceverse.py:408-411):
    grid_sample the frame at uv_pverts xy, white background outside the mask.
    image: [H, W, 3] float in [0, 1]; returns uint8 [res, res, 3]."""
    import jax.numpy as jnp

    from ..ops.grid_sample import grid_sample

    uv_gt = grid_sample(
        jnp.asarray(image, jnp.float32)[None], jnp.asarray(uv_pverts[None, ..., :2])
    )[0]
    mask = jnp.asarray(uv_pverts[..., 2:])
    tex = uv_gt * mask + (1.0 - mask)
    return np.asarray(jnp.clip(tex * 255.0, 0, 255), np.uint8)


def render_uv_for_video(
    model,  # faceverse.FaceVerseModel
    model_dict: Dict,  # needs 'uv_per_ver', 'tri', 'point_buf'
    vert_mask: np.ndarray,
    coeff_paths: Iterable[str],
    image_paths: Iterable[str],  # matching 512x512 frames
    out_dir: str,
    focal_ratio: float = 4.2647,
    img_res: int = 512,
    uv_face_eye_mask: Optional[np.ndarray] = None,
) -> None:
    """Emit the uvRender256x256 dataset directory: `<stem>.npy` (fp16
    uv_pverts) + `<stem>_uvgttex.png` per frame (preprocess_faceverse.py
    :335-411 byte layout)."""
    os.makedirs(out_dir, exist_ok=True)
    K = np.eye(3, dtype=np.float32)
    K[0, 0] = K[1, 1] = focal_ratio * img_res
    K[0, 2] = K[1, 2] = img_res // 2
    faces = np.asarray(model_dict["tri"], np.int32)
    uv_raster, mask = build_uv_raster(
        np.asarray(model_dict["uv_per_ver"], np.float32), faces, vert_mask
    )
    for coeff_path, img_path in zip(coeff_paths, image_paths):
        coeff = np.load(coeff_path).astype(np.float32)
        pverts = uv_pverts_map(
            model, coeff, uv_raster, faces, mask,
            np.asarray(model_dict["point_buf"]), K,
            uv_face_eye_mask=uv_face_eye_mask, img_res=img_res,
        )
        stem = os.path.splitext(os.path.basename(coeff_path))[0]
        np.save(os.path.join(out_dir, stem + ".npy"), pverts.astype(np.float16))
        img = np.asarray(PIL.Image.open(img_path), np.float32) / 255.0
        PIL.Image.fromarray(uv_gttex_image(img, pverts)).save(
            os.path.join(out_dir, stem + "_uvgttex.png")
        )
