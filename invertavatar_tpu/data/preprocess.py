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
