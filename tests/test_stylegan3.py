"""StyleGAN3 generator: filter design parity + end-to-end smoke."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from invertavatar_tpu.models.stylegan3 import (
    SG3Generator,
    design_lowpass_filter,
    sg3_modulated_conv2d,
)

pytestmark = pytest.mark.smoke


def test_filter_design_matches_scipy_reference():
    import scipy.signal

    f = design_lowpass_filter(12, cutoff=2.0, width=2.5, fs=16.0)
    ref = scipy.signal.firwin(12, cutoff=2.0, width=2.5, fs=16.0)
    np.testing.assert_allclose(f, ref.astype(np.float32), atol=1e-7)
    assert design_lowpass_filter(1, 2.0, 2.5, 16.0) is None
    fr = design_lowpass_filter(12, 2.0, 2.5, 16.0, radial=True)
    assert fr.shape == (12, 12)
    assert abs(fr.sum() - 1.0) < 1e-5


def test_sg3_modconv_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    B, Cin, Cout, H, k = 2, 6, 5, 8, 3
    x = rng.randn(B, Cin, H, H).astype(np.float32)
    w = rng.randn(Cout, Cin, k, k).astype(np.float32)
    s = rng.rand(B, Cin).astype(np.float32) + 0.5
    gain = np.float32(0.7)

    # torch oracle per networks_stylegan3.py:27-66
    wt = torch.tensor(w)
    st = torch.tensor(s)
    wt = wt * wt.square().mean([1, 2, 3], keepdim=True).rsqrt()
    st = st * st.square().mean().rsqrt()
    wmod = wt.unsqueeze(0) * st.unsqueeze(1).unsqueeze(3).unsqueeze(4)
    d = (wmod.square().sum(dim=[2, 3, 4]) + 1e-8).rsqrt()
    wmod = wmod * d.unsqueeze(2).unsqueeze(3).unsqueeze(4)
    wmod = wmod * gain
    xt = torch.tensor(x).reshape(1, -1, H, H)
    out_ref = torch.nn.functional.conv2d(
        xt, wmod.reshape(-1, Cin, k, k), padding=k - 1, groups=B
    ).reshape(B, Cout, H + k - 1, H + k - 1)

    out = sg3_modulated_conv2d(
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
        jnp.asarray(s),
        input_gain=jnp.float32(gain),
        padding=k - 1,
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(out), (0, 3, 1, 2)), out_ref.numpy(), atol=1e-4
    )


def test_sg3_generator_smoke():
    G = SG3Generator(z_dim=16, c_dim=0, w_dim=32, img_resolution=32, img_channels=3,
                     num_layers=6, channel_base=1024, channel_max=32)
    rng = jax.random.PRNGKey(0)
    z = jax.random.normal(rng, (1, 16))
    variables = G.init({"params": rng, "buffers": jax.random.fold_in(rng, 1)}, z, None)
    img = G.apply(variables, z, None)
    assert img.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(img)).all()
