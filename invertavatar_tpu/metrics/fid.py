"""Frechet Inception Distance + feature-stat plumbing.

Counterpart of reference `metrics/frechet_inception_distance.py` +
`metrics/metric_utils.py:61-217`: dataset feature stats are cached per
(dataset, detector); generator-side sampling draws (label, vert) pairs from
the dataset exactly like the reference's vert-conditioned sampler
(metric_utils.py:61-88) so `fid50k_full` matches the training-eval protocol.

The detector is pluggable: `detector_fn(uint8_images_nhwc) -> [N, D]`
features. For exact parity with the published numbers, pass a wrapper around
the reference's Inception network (the torchscript detector run host-side via
torch-CPU, `make_torch_inception_detector`); a converted JAX detector can be
substituted for full on-TPU evaluation.
"""

from __future__ import annotations

import hashlib
import os
import pickle
from typing import Callable, Dict, Iterator, Optional

import numpy as np
import scipy.linalg


class FeatureStats:
    """Running mean/cov accumulator (reference metric_utils.FeatureStats)."""

    def __init__(self, max_items: Optional[int] = None):
        self.max_items = max_items
        self.num_items = 0
        self.raw_mean = None
        self.raw_cov = None

    def append(self, feats: np.ndarray):
        feats = np.asarray(feats, np.float64)
        if self.max_items is not None:
            remaining = self.max_items - self.num_items
            if remaining <= 0:
                return
            feats = feats[:remaining]
        if self.raw_mean is None:
            d = feats.shape[1]
            self.raw_mean = np.zeros(d)
            self.raw_cov = np.zeros((d, d))
        self.raw_mean += feats.sum(axis=0)
        self.raw_cov += feats.T @ feats
        self.num_items += feats.shape[0]

    @property
    def is_full(self) -> bool:
        return self.max_items is not None and self.num_items >= self.max_items

    def get_mean_cov(self):
        mean = self.raw_mean / self.num_items
        cov = self.raw_cov / self.num_items - np.outer(mean, mean)
        return mean, cov

    def save(self, path):
        with open(path, "wb") as f:
            pickle.dump(self.__dict__, f)

    @classmethod
    def load(cls, path):
        obj = cls()
        with open(path, "rb") as f:
            obj.__dict__.update(pickle.load(f))
        return obj


def frechet_distance(mu1, sigma1, mu2, sigma2) -> float:
    """FID from two Gaussians (reference frechet_inception_distance.py:35-41)."""
    m = np.square(mu1 - mu2).sum()
    s, _ = scipy.linalg.sqrtm(np.dot(sigma1, sigma2), disp=False)
    return float(np.real(m + np.trace(sigma1 + sigma2 - s * 2)))


def to_uint8(images: np.ndarray) -> np.ndarray:
    """[-1, 1] float NHWC -> uint8."""
    return np.clip((np.asarray(images) + 1) * 127.5, 0, 255).astype(np.uint8)


def dataset_feature_stats(
    dataset,
    detector_fn: Callable[[np.ndarray], np.ndarray],
    max_items: Optional[int] = None,
    batch_size: int = 16,
    cache_dir: Optional[str] = None,
    cache_tag: str = "",
) -> FeatureStats:
    """Feature stats over real images, cached per dataset+detector
    (metric_utils.py:217 caching idiom)."""
    n = len(dataset) if max_items is None else min(len(dataset), max_items)
    cache_path = None
    if cache_dir:
        key = hashlib.md5(f"{getattr(dataset, 'path', '')}-{n}-{cache_tag}".encode()).hexdigest()
        cache_path = os.path.join(cache_dir, f"fid-real-stats-{key}.pkl")
        if os.path.exists(cache_path):
            return FeatureStats.load(cache_path)
    stats = FeatureStats(max_items=n)
    for start in range(0, n, batch_size):
        imgs = np.stack([dataset[i]["image"] for i in range(start, min(start + batch_size, n))])
        if imgs.dtype != np.uint8:
            imgs = to_uint8(imgs)
        stats.append(detector_fn(imgs))
    if cache_path:
        os.makedirs(cache_dir, exist_ok=True)
        stats.save(cache_path)
    return stats


def generator_feature_stats(
    sample_fn: Callable[[int, np.random.RandomState], np.ndarray],
    detector_fn: Callable[[np.ndarray], np.ndarray],
    num_items: int,
    batch_size: int = 8,
    seed: int = 0,
) -> FeatureStats:
    """Feature stats over generated images. `sample_fn(batch, rng)` must draw
    (z, label, vert) internally like the reference's vert-conditioned sampler
    (metric_utils.py:61-88) and return [-1,1] NHWC images."""
    stats = FeatureStats(max_items=num_items)
    rng = np.random.RandomState(seed)
    while not stats.is_full:
        imgs = sample_fn(batch_size, rng)
        stats.append(detector_fn(to_uint8(imgs)))
    return stats


def compute_fid(real_stats: FeatureStats, gen_stats: FeatureStats) -> float:
    mu_r, sig_r = real_stats.get_mean_cov()
    mu_g, sig_g = gen_stats.get_mean_cov()
    return frechet_distance(mu_g, sig_g, mu_r, sig_r)


def compute_kid(real_feats: np.ndarray, gen_feats: np.ndarray,
                num_subsets: int = 100, max_subset_size: int = 1000, seed: int = 0) -> float:
    """Kernel Inception Distance (reference kernel_inception_distance.py)."""
    rng = np.random.RandomState(seed)
    n = real_feats.shape[1]
    m = min(min(real_feats.shape[0], gen_feats.shape[0]), max_subset_size)
    t = 0.0
    for _ in range(num_subsets):
        x = gen_feats[rng.choice(gen_feats.shape[0], m, replace=False)]
        y = real_feats[rng.choice(real_feats.shape[0], m, replace=False)]
        a = (x @ x.T / n + 1) ** 3 + (y @ y.T / n + 1) ** 3
        b = (x @ y.T / n + 1) ** 3
        t += (a.sum() - np.trace(a)) / (m - 1) - b.sum() * 2 / m
    return float(t / num_subsets / m)


def make_torch_inception_detector(detector_path: str, batch_cpu: bool = True):
    """Exact-parity detector: the reference's torchscript Inception network
    (inception-2015-12-05.pt, metric_utils.py get_feature_detector) run via
    torch on host CPU. Returns features [N, 2048]."""
    import torch

    model = torch.jit.load(detector_path).eval()

    def detect(images_u8: np.ndarray) -> np.ndarray:
        x = torch.tensor(np.transpose(images_u8, (0, 3, 1, 2)))
        with torch.no_grad():
            feats = model(x, return_features=True)
        return feats.numpy()

    return detect


def make_vert_conditioned_sample_fn(G, variables, z_dim: int = 512, dataset=None):
    """Generator sampler for metric eval (reference metric_utils.py:61-88):
    draw z ~ N(0,1) and (label, vert) pairs from random dataset items, render
    with the (EMA) generator, return [-1,1] NHWC numpy images.

    `dataset[i]` must provide 'c' [25] and 'v' {'uvcoords_image': [256,256,3]}
    (the training dataset layout, data/dataset.py)."""
    import jax
    import jax.numpy as jnp

    fwd = jax.jit(
        lambda v, z, c, uvc, key: G.apply(
            v, z, c, {"uvcoords_image": uvc}, noise_mode="const", evaluation=True,
            # the reference samples metrics with the generator's default noise
            # (training_loop.py:494 -> metric_utils run_generator); the SR
            # noise mode comes from rendering_kwargs and may be 'random'
            rngs={"noise": key, "ray": jax.random.fold_in(key, 1)},
        )["image"]
    )

    def sample_fn(batch: int, rng: np.random.RandomState) -> np.ndarray:
        z = rng.randn(batch, z_dim).astype(np.float32)
        idx = rng.randint(len(dataset), size=batch)
        cs, uvs = [], []
        for i in idx:
            item = dataset[int(i)]
            cs.append(np.asarray(item["c"], np.float32))
            uvs.append(np.asarray(item["v"]["uvcoords_image"], np.float32))
        out = fwd(
            variables, jnp.asarray(z), jnp.asarray(np.stack(cs)),
            jnp.asarray(np.stack(uvs)),
            jax.random.PRNGKey(int(rng.randint(0, 2**31 - 1))),
        )
        return np.asarray(out, np.float32)

    return sample_fn
