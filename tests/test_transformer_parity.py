"""Parity: SegFormer components vs reference mix_transformer."""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference repo not mounted")

if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

import types  # noqa: E402

import torch  # noqa: E402
import jax.numpy as jnp  # noqa: E402

# the reference imports timm only for init/registry helpers — stub it
if "timm" not in sys.modules:
    import collections.abc as _abc
    import itertools as _it

    def _to_2tuple(x):
        return tuple(x) if isinstance(x, _abc.Iterable) else (x, x)

    def _trunc_normal_(tensor, std=1.0, **kw):
        with torch.no_grad():
            tensor.normal_(0, std).clamp_(-2 * std, 2 * std)
        return tensor

    class _DropPath(torch.nn.Module):
        def __init__(self, p=0.0):
            super().__init__()

        def forward(self, x):
            return x

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")
    registry = types.ModuleType("timm.models.registry")
    vit = types.ModuleType("timm.models.vision_transformer")
    layers.DropPath = _DropPath
    layers.to_2tuple = _to_2tuple
    layers.trunc_normal_ = _trunc_normal_
    registry.register_model = lambda fn=None, **kw: (fn if fn is not None else (lambda f: f))
    vit._cfg = lambda *a, **kw: {}
    for name, mod in [
        ("timm", timm), ("timm.models", models), ("timm.models.layers", layers),
        ("timm.models.registry", registry), ("timm.models.vision_transformer", vit),
    ]:
        sys.modules[name] = mod

from invertavatar_tpu.models.encoders.transformer import Block, TransformerBlock, UpLayer  # noqa: E402
from invertavatar_tpu.utils.torch_import import (  # noqa: E402
    convert_state_dict,
    state_dict_from_torch_module,
)


def nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def nchw(x):
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


def test_vit_block_parity():
    torch.manual_seed(0)
    from encoder_inversion.models.mmseg.mix_transformer import Block as RefBlock

    blk_t = RefBlock(dim=64, num_heads=4, mlp_ratio=2, sr_ratio=1)
    blk_t.eval()
    rng = np.random.RandomState(0)
    H = W = 8
    x = rng.randn(2, H * W, 64).astype(np.float32)
    with torch.no_grad():
        ref = blk_t(torch.tensor(x), H, W).numpy()
    blk_j = Block(dim=64, num_heads=4, mlp_ratio=2, sr_ratio=1)
    variables = convert_state_dict(state_dict_from_torch_module(blk_t))
    out = blk_j.apply(variables, jnp.asarray(x), H, W)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_sr_attention_block_parity():
    torch.manual_seed(1)
    from encoder_inversion.models.mmseg.mix_transformer import Block as RefBlock

    blk_t = RefBlock(dim=64, num_heads=2, mlp_ratio=2, sr_ratio=2, qkv_bias=True)
    blk_t.eval()
    rng = np.random.RandomState(1)
    H = W = 8
    x = rng.randn(1, H * W, 64).astype(np.float32)
    with torch.no_grad():
        ref = blk_t(torch.tensor(x), H, W).numpy()
    blk_j = Block(dim=64, num_heads=2, mlp_ratio=2, sr_ratio=2, qkv_bias=True)
    variables = convert_state_dict(state_dict_from_torch_module(blk_t))
    out = blk_j.apply(variables, jnp.asarray(x), H, W)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_transformer_block_parity():
    torch.manual_seed(2)
    from encoder_inversion.models.mmseg.mix_transformer import transformer_block as RefTB

    tb_t = RefTB(in_chans=32, embed_dim=64, num_vit=2)
    tb_t.eval()
    rng = np.random.RandomState(2)
    x = rng.randn(1, 32, 16, 16).astype(np.float32)
    with torch.no_grad():
        ref = tb_t(torch.tensor(x)).numpy()
    tb_j = TransformerBlock(in_chans=32, embed_dim=64, num_vit=2)
    variables = convert_state_dict(state_dict_from_torch_module(tb_t))
    out = tb_j.apply(variables, nhwc(x))
    np.testing.assert_allclose(nchw(out), ref, atol=1e-4)


def test_uplayer_parity():
    torch.manual_seed(3)
    from encoder_inversion.models.unet_transformer import UpLayer as RefUp

    up_t = RefUp(48, 32, upscale_factor=2, use_gru=False, num_vit=2)
    up_t.eval()
    rng = np.random.RandomState(3)
    x1 = rng.randn(1, 64, 8, 8).astype(np.float32)  # pixshuffle -> 16ch 16x16
    x2 = rng.randn(1, 32, 16, 16).astype(np.float32)
    with torch.no_grad():
        ref = up_t(torch.tensor(x1), torch.tensor(x2)).numpy()
    # reference UpLayer default embed_dim=1024
    up_j = UpLayer(48, 32, upscale=2, num_vit=2)
    variables = convert_state_dict(state_dict_from_torch_module(up_t))
    out = up_j.apply(variables, nhwc(x1), nhwc(x2))
    np.testing.assert_allclose(nchw(out), ref, atol=1e-3)


def test_cross_attention_parity():
    torch.manual_seed(5)
    from encoder_inversion.models.attention import CrossAttention as RefCA

    ca_t = RefCA(d_model=32, nhead=4, dim_feedforward=64, dropout=0.0)
    ca_t.eval()
    rng = np.random.RandomState(5)
    tgt = rng.randn(2, 6, 32).astype(np.float32)
    mem = rng.randn(2, 9, 32).astype(np.float32)
    with torch.no_grad():
        ref = ca_t(torch.tensor(tgt), torch.tensor(mem)).numpy()

    from invertavatar_tpu.models.encoders.attention import CrossAttention

    ca_j = CrossAttention(d_model=32, nhead=4, dim_feedforward=64)
    variables = convert_state_dict(state_dict_from_torch_module(ca_t))
    out = ca_j.apply(variables, jnp.asarray(tgt), jnp.asarray(mem))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)
