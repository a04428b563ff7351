"""Contextual (CX) and MoCo criteria: math parity vs the reference equations."""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from invertavatar_tpu.losses.contextual import (
    CXLoss,
    contextual_bilateral_loss,
    contextual_loss,
)
from invertavatar_tpu.losses.moco import Bottleneck, MocoLoss, ResNet50Trunk
from invertavatar_tpu.utils.torch_import import (
    convert_state_dict,
    state_dict_from_torch_module,
)


def nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


# ------------------------------------------------------- reference CX in torch


def _ref_cosine_distance(x, y):
    y_mu = y.mean(dim=(0, 2, 3), keepdim=True)
    xn = F.normalize(x - y_mu, p=2, dim=1)
    yn = F.normalize(y - y_mu, p=2, dim=1)
    N, C = x.shape[:2]
    sim = torch.bmm(xn.reshape(N, C, -1).transpose(1, 2), yn.reshape(N, C, -1))
    return 1 - sim


def _ref_contextual_loss(x, y, band_width=0.5):
    dist_raw = _ref_cosine_distance(x, y)
    dist_min, _ = torch.min(dist_raw, dim=2, keepdim=True)
    dist_tilde = torch.clamp(dist_raw / (dist_min + 1e-5), max=10.0, min=-10.0)
    w = torch.exp((1 - dist_tilde) / band_width)
    cx = w / torch.sum(w, dim=2, keepdim=True)
    cx = torch.mean(torch.max(cx, dim=1)[0], dim=1)
    return torch.mean(-torch.log(cx + 1e-5))


def test_contextual_loss_parity():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 8, 6, 6).astype(np.float32)
    y = rng.randn(2, 8, 6, 6).astype(np.float32)
    ref = float(_ref_contextual_loss(torch.tensor(x), torch.tensor(y)))
    out = float(contextual_loss(nhwc(x), nhwc(y)))
    assert abs(out - ref) < 1e-5


def test_contextual_bilateral_loss_runs():
    rng = np.random.RandomState(1)
    x = nhwc(rng.randn(1, 4, 8, 8).astype(np.float32))
    y = nhwc(rng.randn(1, 4, 8, 8).astype(np.float32))
    v = float(contextual_bilateral_loss(x, y))
    assert np.isfinite(v)
    # identical inputs give a smaller loss than random pairs
    assert float(contextual_bilateral_loss(x, x)) < v


def test_cxloss_vgg_slice_parity():
    """VGG19 features[:18] layout vs an equivalent torch stack, imported weights."""
    torch.manual_seed(0)

    layers = []
    cfg = [(3, 64), (64, 64), "M", (64, 128), (128, 128), "M",
           (128, 256), (256, 256), (256, 256), (256, 256)]
    for c in cfg:
        if c == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers.append(tnn.Conv2d(c[0], c[1], 3, padding=1))
            layers.append(tnn.ReLU(inplace=False))
    ref_features = tnn.Sequential(*layers[:18])

    class RefCX(tnn.Module):
        def __init__(self):
            super().__init__()
            self.vgg_model = tnn.Module()
            self.vgg_model.slice1 = ref_features

        def forward(self, x, y):
            return _ref_contextual_loss(self.vgg_model.slice1(x), self.vgg_model.slice1(y))

    ref_mod = RefCX().eval()
    rng = np.random.RandomState(2)
    x = rng.rand(1, 3, 64, 64).astype(np.float32)
    y = rng.rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref = float(ref_mod(torch.tensor(x), torch.tensor(y)))

    cx_j = CXLoss()
    variables = convert_state_dict(state_dict_from_torch_module(ref_mod))
    out = float(cx_j.apply(variables, nhwc(x), nhwc(y)))
    assert abs(out - ref) < 1e-4


# ----------------------------------------------------------------------- moco


class _TorchBottleneck(tnn.Module):
    def __init__(self, in_ch, planes, stride=1, downsample=False):
        super().__init__()
        self.conv1 = tnn.Conv2d(in_ch, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.downsample = (
            tnn.Sequential(
                tnn.Conv2d(in_ch, planes * 4, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(planes * 4),
            )
            if downsample
            else None
        )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return F.relu(out + idt)


def test_bottleneck_parity():
    torch.manual_seed(3)
    blk_t = _TorchBottleneck(16, 8, stride=2, downsample=True).eval()
    # fill running stats with non-trivial values
    with torch.no_grad():
        for m in blk_t.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.6, 1.4)
    rng = np.random.RandomState(3)
    x = rng.randn(2, 16, 16, 16).astype(np.float32)
    with torch.no_grad():
        ref = blk_t(torch.tensor(x)).numpy()

    blk_j = Bottleneck(16, 8, stride=2, has_downsample=True)
    variables = convert_state_dict(state_dict_from_torch_module(blk_t))
    out = blk_j.apply(variables, nhwc(x))
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 3, 1, 2)), ref, atol=1e-4)


def test_moco_loss_smoke():
    net = MocoLoss()
    rng = np.random.RandomState(4)
    imgs = [jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32)) for _ in range(3)]
    variables = net.init(jax.random.PRNGKey(0), *imgs)
    loss, sim = net.apply(variables, *imgs)
    assert np.isfinite(float(loss)) and np.isfinite(float(sim))
    # identical y_hat and y -> loss 0
    loss0, _ = net.apply(variables, imgs[0], imgs[0], imgs[2])
    assert abs(float(loss0)) < 1e-5
