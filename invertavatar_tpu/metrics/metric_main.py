"""Metric registry + dispatcher (reference metrics/metric_main.py:29-82)."""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Dict

_metric_fns: Dict[str, Callable] = {}


def register_metric(fn: Callable) -> Callable:
    assert fn.__name__ not in _metric_fns
    _metric_fns[fn.__name__] = fn
    return fn


def list_metrics():
    return sorted(_metric_fns)


def calc_metric(metric: str, run_dir: str | None = None, **kwargs) -> Dict:
    assert metric in _metric_fns, f"unknown metric {metric}; have {list_metrics()}"
    t0 = time.time()
    results = _metric_fns[metric](**kwargs)
    entry = {
        "results": results,
        "metric": metric,
        "total_time": time.time() - t0,
        "timestamp": time.time(),
    }
    if run_dir is not None:
        os.makedirs(run_dir, exist_ok=True)
        with open(os.path.join(run_dir, f"metric-{metric}.jsonl"), "a") as f:
            f.write(json.dumps(entry) + "\n")
    return entry


@register_metric
def fid50k_full(dataset=None, sample_fn=None, detector_fn=None, max_real=None,
                num_gen=50000, cache_dir=None):
    """FID between full real set and 50k vert-conditioned samples
    (reference frechet_inception_distance.py:18 + training_loop.py:494-503)."""
    from .fid import compute_fid, dataset_feature_stats, generator_feature_stats

    real = dataset_feature_stats(dataset, detector_fn, max_items=max_real, cache_dir=cache_dir)
    gen = generator_feature_stats(sample_fn, detector_fn, num_items=num_gen)
    return {"fid50k_full": compute_fid(real, gen)}


@register_metric
def fid2k(dataset=None, sample_fn=None, detector_fn=None, cache_dir=None):
    """Small-sample FID for quick eval ticks."""
    from .fid import compute_fid, dataset_feature_stats, generator_feature_stats

    real = dataset_feature_stats(dataset, detector_fn, max_items=2000, cache_dir=cache_dir)
    gen = generator_feature_stats(sample_fn, detector_fn, num_items=2000)
    return {"fid2k": compute_fid(real, gen)}


@register_metric
def fid64(dataset=None, sample_fn=None, detector_fn=None, cache_dir=None):
    """Tiny-sample FID for smoke tests / fast sanity ticks (64 real, 64 gen)."""
    from .fid import compute_fid, dataset_feature_stats, generator_feature_stats

    real = dataset_feature_stats(dataset, detector_fn, max_items=64, cache_dir=cache_dir)
    gen = generator_feature_stats(sample_fn, detector_fn, num_items=64)
    return {"fid64": compute_fid(real, gen)}


@register_metric
def kid50k_full(dataset=None, sample_fn=None, detector_fn=None, max_real=1000000,
                num_gen=50000):
    from .fid import compute_kid, to_uint8
    import numpy as np

    n_real = min(len(dataset), max_real)
    real_feats = np.concatenate(
        [detector_fn(np.stack([dataset[i]["image"] for i in range(s, min(s + 16, n_real))]))
         for s in range(0, n_real, 16)]
    )
    rng = np.random.RandomState(0)
    gen_feats = []
    got = 0
    while got < num_gen:
        imgs = sample_fn(8, rng)
        gen_feats.append(detector_fn(to_uint8(imgs)))
        got += imgs.shape[0]
    gen_feats = np.concatenate(gen_feats)[:num_gen]
    return {"kid50k_full": compute_kid(real_feats, gen_feats)}


@register_metric
def is50k(sample_fn=None, prob_detector_fn=None, num_gen=50000, num_splits=10):
    """Inception score (reference metric_main.py:161-165 + inception_score.py);
    `prob_detector_fn(uint8_images) -> class probabilities [N, 1008]`."""
    import numpy as np

    from .extra import compute_is
    from .fid import to_uint8

    rng = np.random.RandomState(0)
    probs = []
    got = 0
    while got < num_gen:
        imgs = sample_fn(8, rng)
        probs.append(prob_detector_fn(to_uint8(imgs)))
        got += imgs.shape[0]
    mean, std = compute_is(np.concatenate(probs)[:num_gen], num_splits)
    return {"is50k_mean": mean, "is50k_std": std}


@register_metric
def pr50k3_full(dataset=None, sample_fn=None, detector_fn=None, max_real=200000,
                num_gen=50000, nhood_size=3):
    """Improved precision/recall (metric_main.py:105-109 + precision_recall.py)."""
    import numpy as np

    from .extra import compute_pr
    from .fid import to_uint8

    n_real = min(len(dataset), max_real)
    real = np.concatenate(
        [detector_fn(np.stack([dataset[i]["image"] for i in range(s, min(s + 16, n_real))]))
         for s in range(0, n_real, 16)]
    )
    rng = np.random.RandomState(0)
    gen, got = [], 0
    while got < num_gen:
        imgs = sample_fn(8, rng)
        gen.append(detector_fn(to_uint8(imgs)))
        got += imgs.shape[0]
    res = compute_pr(real, np.concatenate(gen)[:num_gen], nhood_size=nhood_size)
    return {"pr50k3_full_precision": res["precision"], "pr50k3_full_recall": res["recall"]}


@register_metric
def ppl2_wend(mapping_fn=None, synth_fn=None, lpips_fn=None, z_dim=512,
              c_sampler=None, num_samples=50000, batch_size=8):
    """PPL, w-space endpoints (metric_main.py:112-115 + perceptual_path_length.py)."""
    from .extra import compute_ppl

    val = compute_ppl(mapping_fn, synth_fn, lpips_fn, z_dim, c_sampler,
                      num_samples=num_samples, epsilon=1e-4, space="w",
                      sampling="end", batch_size=batch_size)
    return {"ppl2_wend": val}


def _eq(num_samples=50000, **flags):
    def metric(synthesis_fn=None, mapping_fn=None, z_dim=512, c_sampler=None,
               img_resolution=512, num_samples=num_samples, batch_size=4):
        from .equivariance import compute_equivariance_metrics

        return compute_equivariance_metrics(
            synthesis_fn, mapping_fn, z_dim, c_sampler, img_resolution,
            num_samples=num_samples, batch_size=batch_size, **flags,
        )
    return metric


@register_metric
def eqt50k_int(**kw):
    """EQ-T integer-translation PSNR (reference metric_main.py:117-120)."""
    return {"eqt50k_int": _eq(compute_eqt_int=True)(**kw)}


@register_metric
def eqt50k_frac(**kw):
    """EQ-T fractional-translation PSNR (metric_main.py:122-126)."""
    return {"eqt50k_frac": _eq(compute_eqt_frac=True)(**kw)}


@register_metric
def eqr50k(**kw):
    """EQ-R rotation PSNR (metric_main.py:128-132)."""
    return {"eqr50k": _eq(compute_eqr=True)(**kw)}
