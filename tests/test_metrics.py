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


def test_inception_score_math():
    from invertavatar_tpu.metrics.extra import compute_is

    rng = np.random.RandomState(0)
    # confident, diverse predictions -> high IS; uniform -> IS == 1
    onehot = np.eye(10)[rng.randint(0, 10, 500)] * 0.99 + 0.001
    mean_hi, _ = compute_is(onehot, num_splits=5)
    uniform = np.full((500, 10), 0.1)
    mean_lo, _ = compute_is(uniform, num_splits=5)
    assert mean_hi > 5.0 and abs(mean_lo - 1.0) < 1e-6


def test_precision_recall_math():
    from invertavatar_tpu.metrics.extra import compute_pr

    rng = np.random.RandomState(1)
    real = rng.randn(200, 8)
    res_same = compute_pr(real, real + rng.randn(200, 8) * 0.01, nhood_size=3)
    res_far = compute_pr(real, real + 100.0, nhood_size=3)
    assert res_same["precision"] > 0.95 and res_same["recall"] > 0.95
    assert res_far["precision"] < 0.05 and res_far["recall"] < 0.05


def test_ppl_linear_generator():
    from invertavatar_tpu.metrics.extra import compute_ppl

    W = np.random.RandomState(2).randn(16, 48).astype(np.float32)

    def mapping(z, c):
        return np.tile((z @ np.eye(16, 16, dtype=np.float32))[:, None], (1, 3, 1))

    def synth(w, c):
        return (w[:, 0] @ W).reshape(-1, 4, 4, 3)

    def lpips(a, b):
        return np.mean(np.square(a - b), axis=(1, 2, 3))

    val = compute_ppl(mapping, synth, lpips, z_dim=16,
                      c_sampler=lambda n, r: np.zeros((n, 1)),
                      num_samples=64, batch_size=8)
    # linear generator: d = ||(w1-w0) @ W||²·eps²/eps² -> finite, positive
    assert np.isfinite(val) and val > 0


def test_equivariance_ops_parity():
    """Translation/rotation operators vs the reference metrics/equivariance.py."""
    import os
    import sys

    REF = "/root/reference"
    if not os.path.isdir(REF):
        import pytest

        pytest.skip("reference not mounted")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import torch
    from metrics import equivariance as ref_eq

    from invertavatar_tpu.metrics import equivariance as my_eq

    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    x = rng.rand(2, 3, 32, 32).astype(np.float32)
    xj = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))

    for tx, ty in [(0.07, -0.11), (0.0, 0.25)]:
        ref_z, ref_m = ref_eq.apply_integer_translation(torch.tensor(x), tx, ty)
        z, m = my_eq.apply_integer_translation(xj, tx, ty)
        np.testing.assert_allclose(np.transpose(np.asarray(z), (0, 3, 1, 2)), ref_z.numpy(), atol=1e-6)
        np.testing.assert_allclose(np.transpose(np.asarray(m), (0, 3, 1, 2)), ref_m.numpy(), atol=1e-6)

        ref_z, ref_m = ref_eq.apply_fractional_translation(torch.tensor(x), tx, ty)
        z, m = my_eq.apply_fractional_translation(xj, tx, ty)
        np.testing.assert_allclose(np.transpose(np.asarray(z), (0, 3, 1, 2)), ref_z.numpy(), atol=1e-4)
        np.testing.assert_allclose(np.transpose(np.asarray(m), (0, 3, 1, 2)), ref_m.numpy(), atol=1e-6)

    angle = 0.3
    ref_z, ref_m = ref_eq.apply_fractional_rotation(torch.tensor(x), angle)
    z, m = my_eq.apply_fractional_rotation(xj, angle)
    np.testing.assert_allclose(np.transpose(np.asarray(z), (0, 3, 1, 2)), ref_z.numpy(), atol=1e-3)
    np.testing.assert_allclose(np.transpose(np.asarray(m), (0, 3, 1, 2)), ref_m.numpy(), atol=1e-6)

    ref_z, ref_m = ref_eq.apply_fractional_pseudo_rotation(torch.tensor(x), angle)
    z, m = my_eq.apply_fractional_pseudo_rotation(xj, angle)
    np.testing.assert_allclose(np.transpose(np.asarray(z), (0, 3, 1, 2)), ref_z.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.transpose(np.asarray(m), (0, 3, 1, 2)), ref_m.numpy(), atol=1e-6)


def test_voxel_sampling_and_cross_section():
    import jax.numpy as jnp

    from invertavatar_tpu.utils.shapes import create_samples, sample_density_grid
    from invertavatar_tpu.utils.vis import sample_cross_section

    samples, origin, vs = create_samples(8, cube_length=2.0)
    assert samples.shape == (1, 512, 3)
    # z varies fastest
    assert abs(samples[0, 1, 2] - samples[0, 0, 2] - vs) < 1e-6
    assert abs(samples[0, 1, 0] - samples[0, 0, 0]) < 1e-6

    def fake_sample_mixed(coords, ws, v):
        # radial density: sphere of radius 0.1
        r = jnp.linalg.norm(coords, axis=-1, keepdims=True)
        return {"sigma": (r < 0.1).astype(jnp.float32)}

    vol = sample_density_grid(fake_sample_mixed, None, None, voxel_resolution=16,
                              cube_length=0.3, max_batch=1000)
    assert vol.shape == (16, 16, 16)
    assert vol[8, 8, 8] == 1.0 and vol[0, 0, 0] == 0.0

    cs = sample_cross_section(fake_sample_mixed, np.zeros((1, 14, 4)), None,
                              resolution=32, w=0.5)
    assert cs.shape == (1, 32, 32, 1)
    assert cs[0, 16, 16, 0] == 1.0 and cs[0, 0, 0, 0] == 0.0


def test_feature_stats_parity_vs_reference():
    """Cached-stats math parity vs the live reference FeatureStats
    (metrics/metric_utils.py:95-160): identical mean/cov under batched
    accumulation + mid-batch max_items truncation, identical FID formula
    (frechet_inception_distance.py:38-41)."""
    import sys

    import pytest

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    try:
        from metrics.metric_utils import FeatureStats as RefStats
    except Exception as e:  # torch/dnnlib import surface
        pytest.skip(f"reference import unavailable: {e}")

    rng = np.random.RandomState(7)
    batches = [rng.randn(n, 16).astype(np.float32) * 3 + 0.5 for n in (37, 64, 50, 80)]

    ours = FeatureStats(max_items=150)
    ref = RefStats(capture_mean_cov=True, max_items=150)
    for b in batches:
        ours.append(b)
        ref.append(b)
    assert ours.num_items == ref.num_items == 150
    m0, c0 = ours.get_mean_cov()
    m1, c1 = ref.get_mean_cov()
    np.testing.assert_allclose(m0, m1, atol=0, rtol=0)
    np.testing.assert_allclose(c0, c1, atol=0, rtol=0)

    # FID formula parity (frechet_inception_distance.py:38-41) on two
    # distinct accumulations
    gen = FeatureStats(max_items=150)
    for b in batches:
        gen.append(b[::-1] * 1.1 + 0.2)
    mg, cg = gen.get_mean_cov()
    import scipy.linalg

    m = np.square(mg - m1).sum()
    s, _ = scipy.linalg.sqrtm(np.dot(cg, c1), disp=False)
    ref_fid = float(np.real(m + np.trace(cg + c1 - s * 2)))
    assert abs(compute_fid(ours, gen) - ref_fid) < 1e-8


def test_dataset_stats_cache_roundtrip(tmp_path):
    """dataset_feature_stats caching (metric_utils.py:217 idiom): the second
    call must hit the cache file and never invoke the detector."""
    from invertavatar_tpu.metrics.fid import dataset_feature_stats

    rng = np.random.RandomState(3)
    images = [
        {"image": rng.rand(8, 8, 3).astype(np.float32) * 2 - 1} for _ in range(20)
    ]

    class DS(list):
        path = "fake-ds"

    ds = DS(images)
    calls = []

    def detector(u8):
        calls.append(u8.shape[0])
        return u8.reshape(u8.shape[0], -1).astype(np.float64) / 255.0

    s1 = dataset_feature_stats(ds, detector, max_items=12, batch_size=5,
                               cache_dir=str(tmp_path), cache_tag="t")
    assert sum(calls) == 12
    n_calls = len(calls)
    s2 = dataset_feature_stats(ds, detector, max_items=12, batch_size=5,
                               cache_dir=str(tmp_path), cache_tag="t")
    assert len(calls) == n_calls, "second call must be served from the cache"
    np.testing.assert_array_equal(s1.get_mean_cov()[0], s2.get_mean_cov()[0])
    np.testing.assert_array_equal(s1.get_mean_cov()[1], s2.get_mean_cov()[1])
    # a different tag (detector identity) must not collide
    s3 = dataset_feature_stats(ds, detector, max_items=12, batch_size=5,
                               cache_dir=str(tmp_path), cache_tag="other")
    assert len(calls) > n_calls
