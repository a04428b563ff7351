"""Metric math: FID/KID on synthetic Gaussians with a linear detector."""

import numpy as np

from invertavatar_tpu.metrics import calc_metric, list_metrics
from invertavatar_tpu.metrics.fid import (
    FeatureStats,
    compute_fid,
    compute_kid,
    frechet_distance,
)


def test_frechet_distance_known_values():
    d = 4
    mu = np.zeros(d)
    sig = np.eye(d)
    assert abs(frechet_distance(mu, sig, mu, sig)) < 1e-8
    # shifted mean only: FID = ||dmu||²
    mu2 = mu + 2.0
    assert abs(frechet_distance(mu, sig, mu2, sig) - d * 4.0) < 1e-6


def test_feature_stats_accumulation():
    rng = np.random.RandomState(0)
    feats = rng.randn(1000, 8) * 2 + 1
    st = FeatureStats()
    for i in range(0, 1000, 100):
        st.append(feats[i : i + 100])
    mean, cov = st.get_mean_cov()
    np.testing.assert_allclose(mean, feats.mean(0), atol=1e-9)
    np.testing.assert_allclose(cov, np.cov(feats.T, bias=True), atol=1e-9)


def test_fid_via_registry():
    rng = np.random.RandomState(1)

    class DS:
        path = "synthetic"

        def __len__(self):
            return 64

        def __getitem__(self, i):
            r = np.random.RandomState(i)
            return {"image": r.randint(0, 255, (8, 8, 3), np.uint8)}

    W = rng.randn(192, 16).astype(np.float64) * 0.1

    def detector(imgs_u8):
        return imgs_u8.reshape(imgs_u8.shape[0], -1).astype(np.float64) @ W

    def sample_fn(batch, r):
        # "generator" that reproduces the dataset distribution
        return np.stack([
            (np.random.RandomState(1000 + r.randint(64)).randint(0, 255, (8, 8, 3)) / 127.5 - 1)
            for _ in range(batch)
        ])

    out = calc_metric("fid2k", dataset=DS(), sample_fn=sample_fn, detector_fn=detector)
    fid_same = out["results"]["fid2k"]

    def sample_shifted(batch, r):
        return np.clip(sample_fn(batch, r) + 0.5, -1, 1)  # brightness-shifted generator

    out2 = calc_metric("fid2k", dataset=DS(), sample_fn=sample_shifted, detector_fn=detector)
    # same distribution scores far below a shifted one (absolute scale depends
    # on the detector/sample count, so compare relatively)
    assert fid_same < out2["results"]["fid2k"] * 0.5

    assert "fid50k_full" in list_metrics()


def test_kid_same_distribution_near_zero():
    rng = np.random.RandomState(2)
    feats = rng.randn(500, 16)
    kid = compute_kid(feats[:250], feats[250:], num_subsets=10, max_subset_size=200)
    assert abs(kid) < 0.05
