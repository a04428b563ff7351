"""Criteria parity: ArcFace ID backbone vs reference; LPIPS vs torch oracle."""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference repo not mounted")

if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

import torch  # noqa: E402
import torch.nn.functional as TF  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from invertavatar_tpu.losses import LPIPS, ArcFaceBackbone, id_loss  # noqa: E402
from invertavatar_tpu.utils.torch_import import (  # noqa: E402
    convert_state_dict,
    state_dict_from_torch_module,
)


def nhwc(x_t):
    return jnp.asarray(x_t.permute(0, 2, 3, 1).numpy())


def test_arcface_backbone_parity():
    torch.manual_seed(0)
    from encoder_inversion.models.model_irse import Backbone

    net_t = Backbone(input_size=112, num_layers=50, drop_ratio=0.6, mode="ir_se")
    net_t.eval()
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 112, 112).astype(np.float32)
    with torch.no_grad():
        feats_ref = net_t(torch.tensor(x)).numpy()

    net_j = ArcFaceBackbone()
    variables = convert_state_dict(state_dict_from_torch_module(net_t))
    feats = net_j.apply(variables, nhwc(torch.tensor(x)))
    np.testing.assert_allclose(np.asarray(feats), feats_ref, atol=2e-3)


class _TorchAlexLPIPS(torch.nn.Module):
    """Independent NCHW oracle of LPIPS v0.1 alex (criteria/lpips semantics)."""

    def __init__(self):
        super().__init__()
        self.convs = torch.nn.ModuleList(
            [
                torch.nn.Conv2d(3, 64, 11, 4, 2),
                torch.nn.Conv2d(64, 192, 5, 1, 2),
                torch.nn.Conv2d(192, 384, 3, 1, 1),
                torch.nn.Conv2d(384, 256, 3, 1, 1),
                torch.nn.Conv2d(256, 256, 3, 1, 1),
            ]
        )
        self.lins = torch.nn.ModuleList(
            [torch.nn.Conv2d(c, 1, 1, bias=False) for c in (64, 192, 384, 256, 256)]
        )
        self.register_buffer("mean", torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1))
        self.register_buffer("std", torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1))

    def feats(self, x):
        x = (x - self.mean) / self.std
        out = []
        for i, conv in enumerate(self.convs):
            x = torch.relu(conv(x))
            norm = x / (x.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            out.append(norm)
            if i in (0, 1):
                x = TF.max_pool2d(x, 3, 2)
        return out

    def forward(self, x, y):
        fx, fy = self.feats(x), self.feats(y)
        res = [lin((a - b) ** 2).mean((2, 3), True) for a, b, lin in zip(fx, fy, self.lins)]
        return torch.sum(torch.cat(res, 0)) / x.shape[0]


def test_lpips_alex_matches_oracle():
    torch.manual_seed(1)
    oracle = _TorchAlexLPIPS()
    oracle.eval()
    rng = np.random.RandomState(1)
    x = (rng.rand(2, 3, 64, 64).astype(np.float32) * 2 - 1)
    y = (rng.rand(2, 3, 64, 64).astype(np.float32) * 2 - 1)
    with torch.no_grad():
        ref = float(oracle(torch.tensor(x), torch.tensor(y)))

    # map oracle weights onto the LPIPS module's torch-style names
    sd = {}
    conv_idx = [0, 3, 6, 8, 10]
    for i, conv in enumerate(oracle.convs):
        sd[f"net.{conv_idx[i]}.weight"] = conv.weight
        sd[f"net.{conv_idx[i]}.bias"] = conv.bias
    for i, lin in enumerate(oracle.lins):
        sd[f"lin.{i}.1.weight"] = lin.weight
    variables = convert_state_dict(sd)

    lp = LPIPS(net_type="alex")
    out = lp.apply(
        variables,
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(y, (0, 2, 3, 1))),
    )
    np.testing.assert_allclose(float(out), ref, rtol=1e-4)

    # identical inputs -> exactly zero
    zero = lp.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    assert abs(float(zero)) < 1e-8


def test_id_loss_zero_for_same_image():
    torch.manual_seed(2)
    net = ArcFaceBackbone()
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(1, 256, 256, 3).astype(np.float32))
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 112, 112, 3)))
    apply = lambda img: net.apply(variables, img)
    assert abs(float(id_loss(apply, x, x))) < 1e-5

def test_ms_ssim_properties():
    from invertavatar_tpu.losses.ms_ssim import ms_ssim, ssim

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(1, 180, 180, 3).astype(np.float32))
    # identical images -> 1
    assert abs(float(ms_ssim(x, x)) - 1.0) < 1e-5
    s, cs = ssim(x, x)
    assert abs(float(s) - 1.0) < 1e-5
    # noisy copy scores lower than identical but higher than unrelated
    noisy = jnp.clip(x + 0.05 * rng.randn(*x.shape).astype(np.float32), 0, 1)
    other = jnp.asarray(rng.rand(1, 180, 180, 3).astype(np.float32))
    v_noisy = float(ms_ssim(x, noisy))
    v_other = float(ms_ssim(x, other))
    assert 0.5 < v_noisy < 1.0
    assert v_other < v_noisy
