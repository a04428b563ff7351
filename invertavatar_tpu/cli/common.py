"""Shared CLI helpers: drive-data loading, video writing, image grids."""

from __future__ import annotations

import json
import os
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np
import PIL.Image


def load_drive_sequence(
    drive_root: str,
    max_frames: Optional[int] = None,
) -> List[Dict[str, np.ndarray]]:
    """Frames of a preprocessed drive video (reenact_avatar_next3d.py:183-191).

    Expects `images512x512/dataset_realcam.json` labels + per-frame
    `orthRender256x256_face_eye/*.npy` uvcoords (+ optional `coeffs/*.npy`).
    """
    img_dir = os.path.join(drive_root, "images512x512")
    mesh_dir = os.path.join(drive_root, "orthRender256x256_face_eye")
    coeff_dir = os.path.join(drive_root, "coeffs")
    with open(os.path.join(img_dir, "dataset_realcam.json")) as f:
        labels = dict(json.load(f)["labels"])
    fnames = sorted(labels.keys())
    if max_frames:
        fnames = fnames[:max_frames]
    frames = []
    for fname in fnames:
        stem = os.path.splitext(fname)[0]
        item: Dict[str, np.ndarray] = {
            "c": np.asarray(labels[fname], np.float32)[None],
            "name": stem,
        }
        uv_path = os.path.join(mesh_dir, stem + ".npy")
        if os.path.exists(uv_path):
            uvc = np.load(uv_path).astype(np.float32)[..., :3]
            uvc[..., -1] = (uvc[..., -1] >= 0.5).astype(np.float32)
            item["uvcoords_image"] = uvc[None]
        cpath = os.path.join(coeff_dir, stem + ".npy")
        if os.path.exists(cpath):
            item["coeff"] = np.load(cpath).astype(np.float32)
        img_path = os.path.join(img_dir, fname)
        if os.path.exists(img_path):
            item["image_path"] = img_path
        frames.append(item)
    return frames


def to_uint8(img: np.ndarray) -> np.ndarray:
    """[-1, 1] float NHWC -> uint8 HWC (first batch element)."""
    arr = np.clip((np.asarray(img[0]) + 1) * 127.5, 0, 255).astype(np.uint8)
    return arr


def layout_grid(images: List[np.ndarray], grid_wh: Tuple[int, int]) -> np.ndarray:
    """Tile [H, W, 3] uint8 images into a (gw × gh) grid (dnnlib-style)."""
    gw, gh = grid_wh
    H, W, C = images[0].shape
    grid = np.zeros((gh * H, gw * W, C), np.uint8)
    for i, img in enumerate(images[: gw * gh]):
        r, col = divmod(i, gw)
        grid[r * H : (r + 1) * H, col * W : (col + 1) * W] = img
    return grid


class VideoWriter:
    """mp4 writer: cv2 (mp4v, always present) with imageio/x264 fallback."""

    def __init__(self, path: str, fps: int = 25):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self._path = path
        self._fps = fps
        self._w = None

    def _open(self, frame: np.ndarray):
        h, w = frame.shape[:2]
        try:
            import cv2

            self._w = cv2.VideoWriter(
                self._path, cv2.VideoWriter_fourcc(*"mp4v"), self._fps, (w, h)
            )
            assert self._w.isOpened()
            self._backend = "cv2"
        except Exception:
            import imageio

            self._w = imageio.get_writer(self._path, fps=self._fps)
            self._backend = "imageio"

    def append(self, frame: np.ndarray):
        if self._w is None:
            self._open(frame)
        if self._backend == "cv2":
            self._w.write(frame[..., ::-1])  # RGB -> BGR
        else:
            self._w.append_data(frame)

    def close(self):
        if self._w is None:
            return
        if self._backend == "cv2":
            self._w.release()
        else:
            self._w.close()


def load_image(path: str, resolution: int = 512) -> np.ndarray:
    img = PIL.Image.open(path).convert("RGB")
    if img.size != (resolution, resolution):
        img = img.resize((resolution, resolution))
    return (np.asarray(img).astype(np.float32) / 127.5 - 1.0)[None]
