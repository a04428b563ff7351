"""Op-level parity tests.

Oracle strategy (SURVEY.md §4): the reference ships a pure-PyTorch `impl='ref'`
path for every CUDA op; here we use independent torch compositions of public
torch ops as golden oracles and check max-abs-error of the JAX ops.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as TF

import jax.numpy as jnp

from invertavatar_tpu.ops import (
    bias_act,
    conv2d_resample,
    downsample2d,
    filter2d,
    grid_sample,
    resize_bilinear,
    setup_filter,
    upfirdn2d,
    upsample2d,
)


def torch_upfirdn2d(x, f, up=1, down=1, padding=(0, 0, 0, 0), flip_filter=False, gain=1.0):
    """Independent torch oracle for upfirdn2d on NCHW tensors."""
    if f is None:
        f = torch.ones(1, 1, dtype=torch.float64)
    f = f.to(torch.float64)
    if f.ndim == 1:
        f = torch.outer(f, f)
    B, C, H, W = x.shape
    px0, px1, py0, py1 = padding
    # upsample by zero insertion
    up_x = torch.zeros(B, C, H * up, W * up, dtype=x.dtype)
    up_x[:, :, ::up, ::up] = x
    # pad / crop
    up_x = TF.pad(up_x, [max(px0, 0), max(px1, 0), max(py0, 0), max(py1, 0)])
    up_x = up_x[
        :,
        :,
        max(-py0, 0) : up_x.shape[2] - max(-py1, 0),
        max(-px0, 0) : up_x.shape[3] - max(-px1, 0),
    ]
    # convolve (flip unless flip_filter), i.e. correlate with flipped kernel
    k = f * gain
    if not flip_filter:
        k = torch.flip(k, [0, 1])
    k = k[None, None].repeat(C, 1, 1, 1)
    out = TF.conv2d(up_x, k, groups=C)
    return out[:, :, ::down, ::down]


def to_nhwc(x_t):
    return jnp.asarray(x_t.permute(0, 2, 3, 1).numpy())


def from_nhwc(x_j):
    return np.transpose(np.asarray(x_j), (0, 3, 1, 2))


@pytest.mark.parametrize("up,down,pad", [(1, 1, (1, 1, 1, 1)), (2, 1, (2, 1, 2, 1)), (1, 2, (1, 1, 1, 1)), (2, 2, (3, 2, 3, 2)), (1, 1, (-1, 2, 0, -1))])
@pytest.mark.parametrize("sep", [True, False])
def test_upfirdn2d_matches_torch(up, down, pad, sep):
    rng = np.random.RandomState(0)
    x = torch.tensor(rng.randn(2, 3, 13, 11), dtype=torch.float64)
    taps = torch.tensor([1.0, 3.0, 3.0, 1.0], dtype=torch.float64)
    taps = taps / taps.sum()
    ref = torch_upfirdn2d(x, taps, up=up, down=down, padding=pad, gain=1.5)

    f = setup_filter([1, 3, 3, 1], separable=sep)
    out = upfirdn2d(to_nhwc(x.float()), f, up=up, down=down, padding=pad, gain=1.5)
    np.testing.assert_allclose(from_nhwc(out), ref.numpy(), atol=1e-4)


def test_filter2d_upsample_downsample_shapes():
    f = setup_filter([1, 3, 3, 1])
    x = jnp.ones((1, 16, 16, 4))
    assert filter2d(x, f).shape == (1, 16, 16, 4)
    assert upsample2d(x, f).shape == (1, 32, 32, 4)
    assert downsample2d(x, f).shape == (1, 8, 8, 4)
    # DC preservation: constant input stays constant in the interior
    up = upsample2d(x, f)
    assert abs(float(up[0, 16, 16, 0]) - 1.0) < 1e-5


@pytest.mark.parametrize("act,gain,clamp", [("linear", None, None), ("lrelu", None, 256.0), ("lrelu", 1.0, None), ("softplus", None, None), ("sigmoid", None, None)])
def test_bias_act_matches_torch(act, gain, clamp):
    rng = np.random.RandomState(1)
    x = rng.randn(4, 8, 5, 5).astype(np.float32)  # NCHW for torch
    b = rng.randn(8).astype(np.float32)
    xt = torch.tensor(x)
    bt = torch.tensor(b)
    y = xt + bt.reshape(1, -1, 1, 1)
    if act == "lrelu":
        y = TF.leaky_relu(y, 0.2)
        y = y * (np.sqrt(2.0) if gain is None else gain)
    elif act == "softplus":
        y = TF.softplus(y)
    elif act == "sigmoid":
        y = torch.sigmoid(y)
    if clamp is not None:
        y = torch.clamp(y, -clamp, clamp)

    x_j = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    out = bias_act(x_j, jnp.asarray(b), act=act, gain=gain, clamp=clamp)
    np.testing.assert_allclose(from_nhwc(out), y.numpy(), atol=1e-5)


@pytest.mark.parametrize("up,down,k,groups", [(1, 1, 3, 1), (2, 1, 3, 1), (1, 2, 3, 1), (1, 1, 1, 1), (2, 1, 3, 2)])
@pytest.mark.parametrize("flip_weight", [True, False])
def test_conv2d_resample_matches_torch(up, down, k, groups, flip_weight):
    rng = np.random.RandomState(2)
    Cin, Cout, H = 4, 6, 8
    x = rng.randn(2, Cin, H, H).astype(np.float32)
    w = rng.randn(Cout, Cin // groups, k, k).astype(np.float32)
    f_np = np.array([1, 3, 3, 1], dtype=np.float64)
    f_np = f_np / f_np.sum()
    pad = k // 2

    # torch oracle: replicate the generic decomposition with torch primitives.
    xt = torch.tensor(x, dtype=torch.float64)
    wt = torch.tensor(w, dtype=torch.float64)
    ft = torch.tensor(f_np)
    fw = fh = 4 if (up > 1 or down > 1) else 1
    px0, px1, py0, py1 = pad, pad, pad, pad
    if up > 1:
        px0 += (fw + up - 1) // 2
        px1 += (fw - up) // 2
        py0 += (fh + up - 1) // 2
        py1 += (fh - up) // 2
    if down > 1:
        px0 += (fw - down + 1) // 2
        px1 += (fw - down) // 2
        py0 += (fh - down + 1) // 2
        py1 += (fh - down) // 2
    y = torch_upfirdn2d(xt, ft if up > 1 else None, up=up, padding=(px0, px1, py0, py1), gain=up**2)
    wt_ = wt if flip_weight else torch.flip(wt, [2, 3])
    y = TF.conv2d(y, wt_, groups=groups)
    if down > 1:
        y = torch_upfirdn2d(y, ft, down=down)

    f = setup_filter([1, 3, 3, 1]) if (up > 1 or down > 1) else None
    w_hwio = jnp.asarray(np.transpose(w, (2, 3, 1, 0)))  # OIHW -> HWIO
    out = conv2d_resample(to_nhwc(torch.tensor(x)), w_hwio, f=f, up=up, down=down, padding=pad, groups=groups, flip_weight=flip_weight)
    np.testing.assert_allclose(from_nhwc(out), y.numpy(), atol=1e-3)


def test_grid_sample_matches_torch():
    rng = np.random.RandomState(3)
    img = rng.randn(2, 5, 9, 7).astype(np.float32)  # NCHW
    grid = (rng.rand(2, 6, 4, 2).astype(np.float32) * 2.4) - 1.2  # includes OOB

    ref = TF.grid_sample(
        torch.tensor(img), torch.tensor(grid), mode="bilinear", padding_mode="zeros", align_corners=False
    )
    out = grid_sample(jnp.asarray(np.transpose(img, (0, 2, 3, 1))), jnp.asarray(grid))
    np.testing.assert_allclose(from_nhwc(out), ref.numpy(), atol=1e-5)


@pytest.mark.parametrize("size,antialias", [((4, 4), True), ((16, 16), False), ((13, 7), True)])
def test_resize_bilinear_matches_torch(size, antialias):
    rng = np.random.RandomState(4)
    img = rng.randn(2, 3, 8, 8).astype(np.float32)
    ref = TF.interpolate(torch.tensor(img), size=size, mode="bilinear", align_corners=False, antialias=antialias)
    out = resize_bilinear(jnp.asarray(np.transpose(img, (0, 2, 3, 1))), size, antialias=antialias)
    np.testing.assert_allclose(from_nhwc(out), ref.numpy(), atol=2e-2, rtol=1e-2)


def test_filtered_lrelu_matches_torch():
    from invertavatar_tpu.ops.filtered_lrelu import filtered_lrelu

    rng = np.random.RandomState(5)
    x = torch.tensor(rng.randn(2, 4, 9, 9), dtype=torch.float64)
    b = torch.tensor(rng.randn(4), dtype=torch.float64)
    taps = torch.tensor([1.0, 3.0, 3.0, 1.0], dtype=torch.float64)
    taps = taps / taps.sum()
    f2d = torch.outer(taps, taps)

    # torch oracle following filtered_lrelu.py:123-155 semantics
    up, down, pad, gain, slope, clamp = 2, 2, (2, 1, 2, 1), np.sqrt(2.0), 0.2, 10.0
    y = x + b.reshape(1, -1, 1, 1)
    y = torch_upfirdn2d(y, taps, up=up, padding=pad, gain=up**2)
    y = TF.leaky_relu(y, slope) * gain
    y = torch.clamp(y, -clamp, clamp)
    fw = 4
    p2 = ((fw - down + 1) // 2, (fw - down) // 2)
    y = torch_upfirdn2d(y, taps, down=down, padding=(0, 0, 0, 0))

    fj = setup_filter([1, 3, 3, 1])
    out = filtered_lrelu(
        to_nhwc(x.float()), fj, fj, jnp.asarray(np.asarray(b, np.float32)),
        up=up, down=down, padding=pad, gain=gain, slope=slope, clamp=clamp,
    )
    np.testing.assert_allclose(from_nhwc(out), y.numpy(), atol=1e-4)
