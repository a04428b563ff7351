"""ADA pipeline parity vs the reference, using debug_percentile determinism."""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference repo not mounted")

if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

import torch  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from invertavatar_tpu.train.augment import AugmentConfig, AugmentPipe  # noqa: E402


def run_pair(cfg_kwargs, dp, res=32, atol=2e-3, border=0):
    from training.augment import AugmentPipe as RefPipe

    rng = np.random.RandomState(0)
    imgs = rng.rand(2, 3, res, res).astype(np.float32) * 2 - 1
    pipe_t = RefPipe(**cfg_kwargs)
    pipe_t.p.copy_(torch.tensor(1.0))
    with torch.no_grad():
        ref = pipe_t(torch.tensor(imgs), debug_percentile=dp).numpy()

    pipe_j = AugmentPipe(AugmentConfig(**cfg_kwargs))
    out = pipe_j(
        jnp.asarray(np.transpose(imgs, (0, 2, 3, 1))), jnp.float32(1.0),
        jax.random.PRNGKey(0), debug_percentile=dp,
    )
    out = np.transpose(np.asarray(out), (0, 3, 1, 2))
    if border:
        ref = ref[:, :, border:-border, border:-border]
        out = out[:, :, border:-border, border:-border]
    np.testing.assert_allclose(out, ref, atol=atol)


def test_color_transforms_parity():
    run_pair(dict(brightness=1, contrast=1, lumaflip=1, hue=1, saturation=1), dp=0.37)


def test_geometric_parity():
    # interior parity; reflect-padding content differs only at extreme borders
    run_pair(dict(scale=1, rotate=1, aniso=1, xfrac=1), dp=0.44, atol=5e-3, border=2)


def test_blit_parity():
    run_pair(dict(xflip=1, rotate90=1, xint=1), dp=0.8, atol=5e-3, border=2)


def test_filter_cutout_parity():
    # noise excluded: debug_percentile pins sigma but not the noise field itself
    run_pair(dict(imgfilter=1, cutout=1), dp=0.6, atol=5e-3)


def test_noise_statistics():
    import jax
    import numpy as np

    pipe = AugmentPipe(AugmentConfig(noise=1, noise_std=0.1))
    x = jnp.zeros((4, 32, 32, 3))
    out = pipe(x, jnp.float32(1.0), jax.random.PRNGKey(1), debug_percentile=0.9)
    std = float(jnp.std(out))
    expected = float(scipy_erfinv09()) * 0.1
    assert abs(std - expected) / expected < 0.15


def scipy_erfinv09():
    import scipy.special

    return scipy.special.erfinv(0.9)
