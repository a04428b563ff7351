"""Dataset readers for the preprocessed-dataset contract (SURVEY.md §2.2 L9).

On-disk layout (byte-compatible with the reference so the demo data drives both
frameworks — dataset_new.py:197-340, dataset_video.py:218-413):

    images512x512/<vid>/<frame>.png        RGB frames
    images512x512/dataset_realcam.json     {'labels': {fname: 25-dim c}} (16 c2w + 9 K)
    images512x512/dataset.json             {'labels': {fname: label}}
    orthRender256x256_face_eye/<f>.npy     uvcoords_image [256, 256, 3+] fp16
    uvRender256x256/<f>.npy                uv_pverts [256, 256, 3]
    uvRender256x256/<f>_uvgttex.png        UV-space gt texture
    coeffs/<f>.npy                         FaceVerse coefficient vector

All outputs are NHWC float32; images scaled to [-1, 1] at the consumer
(`normalize_image`). Host-side numpy + PIL; `prefetch_batches` overlaps IO
with device compute via a background thread (the reference uses 16 torch
DataLoader workers — here IO is lighter since uv/vert tensors are mmap'd npy).
"""

from __future__ import annotations

import json
import os
import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np
import PIL.Image


def normalize_image(img_u8: np.ndarray) -> np.ndarray:
    return img_u8.astype(np.float32) / 127.5 - 1.0


class AvatarDataset:
    """Frame-level dataset (reference ImageFolderDataset, dataset_new.py:197)."""

    def __init__(
        self,
        path: str,
        mesh_path: Optional[str] = None,
        resolution: int = 512,
        load_uv: bool = False,
        coeffs_path: Optional[str] = None,
        uv_face_mask_path: Optional[str] = None,
        label_file: str = "dataset.json",
        max_size: Optional[int] = None,
        xflip: bool = False,
    ):
        self.path = path
        self.mesh_path = mesh_path if mesh_path is not None else os.path.join(
            os.path.dirname(path.rstrip("/")), "orthRender256x256_face_eye"
        )
        self.uv_path = path.replace("images512x512", "uvRender256x256")
        self.coeffs_path = coeffs_path
        self.resolution = resolution
        self.load_uv = load_uv

        with open(os.path.join(path, "dataset_realcam.json")) as f:
            cam_labels = dict(json.load(f)["labels"])
        self.fnames: List[str] = list(cam_labels.keys())
        self.cams = np.asarray([cam_labels[f] for f in self.fnames], np.float32)

        label_path = os.path.join(path, label_file)
        if os.path.exists(label_path):
            with open(label_path) as f:
                labels = dict(json.load(f)["labels"])
            self.labels = np.asarray([labels[f] for f in self.fnames], np.float32)
        else:
            self.labels = np.zeros((len(self.fnames), 0), np.float32)

        self.uv_face_mask = None
        if uv_face_mask_path and os.path.exists(uv_face_mask_path):
            m = np.array(PIL.Image.open(uv_face_mask_path).convert("L"), np.float32) / 255.0
            self.uv_face_mask = m

        self._indices = np.arange(len(self.fnames))
        if max_size is not None and len(self._indices) > max_size:
            self._indices = self._indices[:max_size]
        self.xflip = xflip

    def __len__(self):
        return len(self._indices)

    @property
    def label_dim(self) -> int:
        return self.labels.shape[1] + self.cams.shape[1]

    def _image(self, fname: str, path: Optional[str] = None) -> np.ndarray:
        with open(os.path.join(path or self.path, fname), "rb") as f:
            img = PIL.Image.open(f)
            if img.size != (self.resolution, self.resolution):
                img = img.resize((self.resolution, self.resolution))
            arr = np.array(img)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        return arr  # HWC uint8

    def get_label(self, idx: int) -> np.ndarray:
        raw = self._indices[idx]
        return np.concatenate([self.labels[raw], self.cams[raw]], axis=-1)

    def get_vert(self, idx: int) -> Dict[str, np.ndarray]:
        """uvcoords_image (+ coeff) for the frame (dataset_new.py:328-338)."""
        raw = self._indices[idx]
        npy = os.path.splitext(self.fnames[raw])[0] + ".npy"
        uvc = np.load(os.path.join(self.mesh_path, npy)).astype(np.float32)[..., :3]
        uvc[..., -1] = (uvc[..., -1] >= 0.5).astype(np.float32)
        out = {"uvcoords_image": uvc}
        if self.coeffs_path is not None:
            out["coeff"] = np.load(os.path.join(self.coeffs_path, npy)).astype(np.float32)
        return out

    def get_uv(self, idx: int) -> np.ndarray:
        """[256, 256, 6] = (uv_gttex ‖ uv_pverts), mask multiplied (dataset_new.py:318-322)."""
        raw = self._indices[idx]
        stem = os.path.splitext(self.fnames[raw])[0]
        uv_pverts = np.load(os.path.join(self.uv_path, stem + ".npy")).astype(np.float32)
        if self.uv_face_mask is not None:
            uv_pverts[..., -1] *= self.uv_face_mask
        with open(os.path.join(self.uv_path, stem + "_uvgttex.png"), "rb") as f:
            uv_gttex = normalize_image(np.array(PIL.Image.open(f)))
        return np.concatenate([uv_gttex, uv_pverts], axis=-1)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        raw = self._indices[idx]
        img = self._image(self.fnames[raw])
        out = {
            "image": img,  # uint8 HWC
            "c": self.get_label(idx),
            **self.get_vert(idx),
        }
        if self.load_uv:
            out["uv"] = self.get_uv(idx)
        return out


class VideoDataset(AvatarDataset):
    """Per-video frame sampling for the few-shot stage (dataset_video.py:218-413)."""

    def __init__(self, *args, frm_per_vid: int = 4, **kwargs):
        super().__init__(*args, load_uv=True, **kwargs)
        self.frm_per_vid = frm_per_vid
        videos: Dict[str, List[int]] = {}
        for raw_idx, fname in enumerate(self.fnames):
            vid = fname.split("/")[0]
            videos.setdefault(vid, []).append(raw_idx)
        self.videos = [sorted(v, key=lambda i: self.fnames[i]) for v in videos.values()]

    @property
    def num_videos(self):
        return len(self.videos)

    def sample_clip(self, vidx: int, rng: np.random.RandomState, T: Optional[int] = None):
        """T random frames of one video (dataset_video.py:356-373)."""
        T = T or self.frm_per_vid
        v_info = self.videos[vidx]
        fidxs = rng.uniform(0.0, len(v_info), size=T).astype(np.int32)
        raw_idxs = [v_info[i] for i in fidxs]
        frames = np.stack([normalize_image(self._image(self.fnames[r])) for r in raw_idxs])
        cs = np.stack([np.concatenate([self.labels[r], self.cams[r]]) for r in raw_idxs])
        uvcs, uvs = [], []
        for r in raw_idxs:
            idx = int(np.where(self._indices == r)[0][0]) if len(self._indices) != len(self.fnames) else r
            uvcs.append(self.get_vert(idx)["uvcoords_image"])
            uvs.append(self.get_uv(idx))
        return {
            "image": frames,
            "c": cs.astype(np.float32),
            "uvcoords_image": np.stack(uvcs),
            "uv": np.stack(uvs),
        }


class InfiniteSampler:
    """Seeded infinite shuffled index stream with rank sharding and window
    shuffle (reference torch_utils/misc.py:113-147)."""

    def __init__(self, dataset_size: int, rank: int = 0, num_replicas: int = 1,
                 shuffle: bool = True, seed: int = 0, window_size: float = 0.5):
        assert dataset_size > 0
        self.size = dataset_size
        self.rank = rank
        self.num_replicas = num_replicas
        self.shuffle = shuffle
        self.seed = seed
        self.window_size = window_size

    def __iter__(self) -> Iterator[int]:
        order = np.arange(self.size)
        rnd = None
        window = 0
        if self.shuffle:
            rnd = np.random.RandomState(self.seed)
            rnd.shuffle(order)
            window = int(np.rint(order.size * self.window_size))
        idx = 0
        while True:
            i = idx % order.size
            if idx % self.num_replicas == self.rank:
                yield int(order[i])
            if window >= 2:
                j = (i - rnd.randint(window)) % order.size
                order[i], order[j] = order[j], order[i]
            idx += 1


def prefetch_batches(dataset, sampler: InfiniteSampler, batch_size: int,
                     prefetch: int = 2, collate=None):
    """Background-thread batch producer (the reference's DataLoader role)."""
    q: "queue.Queue" = queue.Queue(maxsize=prefetch)
    it = iter(sampler)

    def default_collate(items):
        out = {}
        for k in items[0]:
            out[k] = np.stack([item[k] for item in items])
        return out

    collate = collate or default_collate

    def worker():
        while True:
            items = [dataset[next(it)] for _ in range(batch_size)]
            q.put(collate(items))

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        yield q.get()
