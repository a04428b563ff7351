"""Parity: super-resolution + dual discriminator vs the PyTorch reference."""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference repo not mounted")

if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

import torch  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from invertavatar_tpu.models.discriminator import DualDiscriminator  # noqa: E402
from invertavatar_tpu.models.superresolution import SuperresolutionHybrid8XDC  # noqa: E402
from invertavatar_tpu.utils.torch_import import (  # noqa: E402
    convert_state_dict,
    state_dict_from_torch_module,
)


def nchw(x):
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


def nhwc_j(x_t):
    return jnp.asarray(x_t.permute(0, 2, 3, 1).numpy())


def test_superresolution_8xdc_parity():
    torch.manual_seed(0)
    from training_avatar_texture.superresolution import SuperresolutionHybrid8XDC as RefSR

    ref = SuperresolutionHybrid8XDC  # noqa: F841 (naming parity)
    sr_t = RefSR(channels=32, img_resolution=512, sr_num_fp16_res=0, sr_antialias=True)
    sr_t.eval()

    rng = np.random.RandomState(0)
    x = rng.randn(1, 32, 128, 128).astype(np.float32)
    rgb = x[:, :3]
    ws = rng.randn(1, 14, 512).astype(np.float32)
    with torch.no_grad():
        out_ref = sr_t(torch.tensor(rgb), torch.tensor(x), torch.tensor(ws), noise_mode="const").numpy()

    sr_j = SuperresolutionHybrid8XDC(channels=32, img_resolution=512, sr_num_fp16_res=0, sr_antialias=True)
    variables = convert_state_dict(state_dict_from_torch_module(sr_t))
    out = sr_j.apply(
        variables,
        nhwc_j(torch.tensor(rgb)),
        nhwc_j(torch.tensor(x)),
        jnp.asarray(ws),
        noise_mode="const",
    )
    np.testing.assert_allclose(nchw(out), out_ref, atol=5e-3)


def test_dual_discriminator_parity():
    torch.manual_seed(1)
    from training_avatar_texture.dual_discriminator import DualDiscriminator as RefD

    d_t = RefD(c_dim=25, img_resolution=64, img_channels=6, channel_base=4096, channel_max=128, num_fp16_res=0)
    d_t.eval()

    rng = np.random.RandomState(1)
    image = rng.randn(4, 3, 64, 64).astype(np.float32)
    image_raw = rng.randn(4, 3, 32, 32).astype(np.float32)
    c = rng.randn(4, 25).astype(np.float32)
    with torch.no_grad():
        out_ref = d_t({"image": torch.tensor(image), "image_raw": torch.tensor(image_raw)}, torch.tensor(c)).numpy()

    d_j = DualDiscriminator(c_dim=25, img_resolution=64, img_channels=6, channel_base=4096, channel_max=128, num_fp16_res=0)
    variables = convert_state_dict(state_dict_from_torch_module(d_t))
    out = d_j.apply(
        variables,
        {"image": nhwc_j(torch.tensor(image)), "image_raw": nhwc_j(torch.tensor(image_raw))},
        jnp.asarray(c),
    )
    np.testing.assert_allclose(np.asarray(out), out_ref, atol=2e-3)


def test_single_and_dummy_discriminators_run():
    import jax
    from invertavatar_tpu.models.discriminator import (
        DummyDualDiscriminator,
        SingleDiscriminator,
        VideoDiscriminator,
    )

    rng = np.random.RandomState(5)
    img = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
    raw = jnp.asarray(rng.randn(2, 16, 16, 3).astype(np.float32))
    c = jnp.asarray(rng.randn(2, 25).astype(np.float32))

    d = SingleDiscriminator(c_dim=25, img_resolution=32, img_channels=3, channel_base=1024, channel_max=64, num_fp16_res=0)
    v = d.init(jax.random.PRNGKey(0), {"image": img}, c)
    out = d.apply(v, {"image": img}, c)
    assert out.shape == (2, 1)

    dd = DummyDualDiscriminator(c_dim=25, img_resolution=32, img_channels=6, channel_base=1024, channel_max=64, num_fp16_res=0)
    v = dd.init(jax.random.PRNGKey(0), {"image": img, "image_raw": raw}, c)
    out = dd.apply(v, {"image": img, "image_raw": raw}, c, raw_fade=0.5)
    assert out.shape == (2, 1)

    vd = VideoDiscriminator(c_dim=25, img_resolution=32, img_channels=3, channel_base=1024, channel_max=64, num_fp16_res=0)
    frames = jnp.asarray(rng.randn(4, 32, 32, 3).astype(np.float32))  # B=2, T=2
    Ts = jnp.asarray(rng.rand(2, 2).astype(np.float32))
    cc = jnp.asarray(rng.randn(2, 2, 25).astype(np.float32))
    v = vd.init(jax.random.PRNGKey(0), {"image": frames}, Ts, cc)
    out = vd.apply(v, {"image": frames}, Ts, cc)
    assert out.shape == (2, 1)
