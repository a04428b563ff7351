"""IS / precision-recall / PPL metric math (reference metrics/inception_score.py,
precision_recall.py, perceptual_path_length.py). The detector/generator hooks
are pluggable callables like `metrics.fid`; these functions are pure math on
features/probabilities so they run identically on host numpy."""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np


def compute_is(gen_probs: np.ndarray, num_splits: int = 10) -> Tuple[float, float]:
    """Inception score over class probabilities (inception_score.py:20-38)."""
    num_gen = len(gen_probs)
    scores = []
    for i in range(num_splits):
        part = gen_probs[i * num_gen // num_splits : (i + 1) * num_gen // num_splits]
        kl = part * (np.log(part) - np.log(np.mean(part, axis=0, keepdims=True)))
        kl = np.mean(np.sum(kl, axis=1))
        scores.append(np.exp(kl))
    return float(np.mean(scores)), float(np.std(scores))


def _cdist(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    a2 = np.sum(np.square(a), axis=1, keepdims=True)
    b2 = np.sum(np.square(b), axis=1, keepdims=True)
    d2 = a2 - 2 * (a @ b.T) + b2.T
    return np.sqrt(np.clip(d2, 0, None))


def compute_pr(
    real_features: np.ndarray,
    gen_features: np.ndarray,
    nhood_size: int = 3,
    row_batch_size: int = 10000,
    col_batch_size: int = 10000,
) -> dict:
    """Improved precision/recall (precision_recall.py:38-76): a probe counts
    as covered if it lies within the manifold's k-NN radius of any sample."""
    results = {}
    for name, manifold, probes in [
        ("precision", real_features, gen_features),
        ("recall", gen_features, real_features),
    ]:
        kth = []
        for i in range(0, len(manifold), row_batch_size):
            batch = manifold[i : i + row_batch_size]
            dist = np.concatenate(
                [_cdist(batch, manifold[j : j + col_batch_size])
                 for j in range(0, len(manifold), col_batch_size)],
                axis=1,
            )
            # kth smallest including self-distance 0 -> index nhood_size
            kth.append(np.partition(dist, nhood_size, axis=1)[:, nhood_size])
        kth = np.concatenate(kth)
        pred = []
        for i in range(0, len(probes), row_batch_size):
            batch = probes[i : i + row_batch_size]
            dist = np.concatenate(
                [_cdist(batch, manifold[j : j + col_batch_size])
                 for j in range(0, len(manifold), col_batch_size)],
                axis=1,
            )
            pred.append(np.any(dist <= kth[None, :], axis=1))
        results[name] = float(np.mean(np.concatenate(pred).astype(np.float64)))
    return results


def slerp(a: np.ndarray, b: np.ndarray, t) -> np.ndarray:
    """Spherical interpolation (perceptual_path_length.py:24-34)."""
    a = a / np.linalg.norm(a, axis=-1, keepdims=True)
    b = b / np.linalg.norm(b, axis=-1, keepdims=True)
    d = np.sum(a * b, axis=-1, keepdims=True)
    p = t * np.arccos(np.clip(d, -1.0, 1.0))
    c = b - d * a
    c = c / np.linalg.norm(c, axis=-1, keepdims=True)
    out = a * np.cos(p) + c * np.sin(p)
    return out / np.linalg.norm(out, axis=-1, keepdims=True)


def compute_ppl(
    mapping_fn: Callable,  # (z [B, zdim], c) -> w [B, num_ws, wdim]
    synth_fn: Callable,  # (w, c) -> images [B, H, W, 3] in [-1, 1]
    lpips_fn: Callable,  # (a, b) -> per-batch mean LPIPS distance
    z_dim: int,
    c_sampler: Callable,  # (n, rng) -> labels
    num_samples: int = 2000,
    epsilon: float = 1e-4,
    space: str = "w",
    sampling: str = "end",
    batch_size: int = 8,
    seed: int = 0,
) -> float:
    """PPL (perceptual_path_length.py:37-131): squared LPIPS distance between
    eps-separated interpolation points, scaled by 1/eps², filtered to the
    [lo, hi] percentile band like the reference (1%–99% trimmed mean)."""
    rng = np.random.RandomState(seed)
    dists = []
    for _ in range(0, num_samples, batch_size):
        c = np.asarray(c_sampler(batch_size, rng))
        t = rng.rand(batch_size, 1) * (1.0 if sampling == "full" else 0.0)
        z0 = rng.randn(batch_size, z_dim).astype(np.float32)
        z1 = rng.randn(batch_size, z_dim).astype(np.float32)
        if space == "w":
            w0 = np.asarray(mapping_fn(z0, c))
            w1 = np.asarray(mapping_fn(z1, c))
            wt0 = w0 + (w1 - w0) * t[:, :, None]
            wt1 = w0 + (w1 - w0) * (t + epsilon)[:, :, None]
        else:
            zt0 = slerp(z0, z1, t)
            zt1 = slerp(z0, z1, t + epsilon)
            wt0 = np.asarray(mapping_fn(zt0, c))
            wt1 = np.asarray(mapping_fn(zt1, c))
        img0 = synth_fn(wt0, c)
        img1 = synth_fn(wt1, c)
        d = np.asarray(lpips_fn(img0, img1)).reshape(-1)
        dists.append(d / (epsilon**2))
    dists = np.concatenate([np.atleast_1d(d) for d in dists])
    lo = np.percentile(dists, 1, method="lower")
    hi = np.percentile(dists, 99, method="higher")
    return float(np.extract(np.logical_and(dists >= lo, dists <= hi), dists).mean())
