"""Parity: inversion encoders (e4e, ConvGRU U-Nets) vs the PyTorch reference."""

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

from invertavatar_tpu.models.encoders import (  # noqa: E402
    ConvGRU,
    Encoder4Editing,
    LatentCodesDiscriminator,
    TriPlanefeatEncoder,
    TriPlaneSFTfeatEncoder,
)
from invertavatar_tpu.utils.torch_import import (  # noqa: E402
    convert_state_dict,
    state_dict_from_torch_module,
)


def nhwc(x_t):
    return jnp.asarray(x_t.permute(0, 2, 3, 1).numpy())


def nchw(x_j):
    return np.transpose(np.asarray(x_j), (0, 3, 1, 2))


def test_conv_gru_parity():
    torch.manual_seed(0)
    from encoder_inversion.models.unet_encoders import ConvGRU as RefGRU

    gru_t = RefGRU(channels=8)
    gru_t.eval()
    rng = np.random.RandomState(0)
    x = rng.randn(2, 4, 8, 6, 6).astype(np.float32)  # [B, T, C, H, W]
    with torch.no_grad():
        out_ref, h_ref = gru_t(torch.tensor(x), None)

    gru_j = ConvGRU(channels=8)
    variables = convert_state_dict(state_dict_from_torch_module(gru_t))
    x_j = jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2)))
    out, h = gru_j.apply(variables, x_j, None)
    np.testing.assert_allclose(nchw(out), out_ref.numpy(), atol=1e-5)
    np.testing.assert_allclose(nchw(h), h_ref.numpy(), atol=1e-5)


def test_e4e_encoder_parity():
    torch.manual_seed(1)
    from encoder_inversion.models.e4e import Encoder4Editing as RefEnc

    enc_t = RefEnc(n_styles=14, inp_ch=3)
    enc_t.eval()
    rng = np.random.RandomState(1)
    x = rng.randn(1, 3, 256, 256).astype(np.float32)
    with torch.no_grad():
        ws_ref = enc_t(torch.tensor(x)).numpy()

    enc_j = Encoder4Editing(n_styles=14, inp_ch=3)
    variables = convert_state_dict(state_dict_from_torch_module(enc_t))
    ws = enc_j.apply(variables, nhwc(torch.tensor(x)))
    np.testing.assert_allclose(np.asarray(ws), ws_ref, atol=2e-3)


def test_texture_unet_parity_with_gru_carry():
    torch.manual_seed(2)
    from encoder_inversion.models.unet_encoders import TriPlanefeat_Encoder as RefTex

    net_t = RefTex(inp_ch=7, res=256, use_gru=True)
    net_t.eval()
    rng = np.random.RandomState(2)
    x1 = rng.randn(1, 2, 7, 256, 256).astype(np.float32)
    x2 = rng.randn(1, 2, 7, 256, 256).astype(np.float32)
    with torch.no_grad():
        out_ref, r_ref = net_t(torch.tensor(x1), r_list=None, return_list=True)
        out_ref2, _ = net_t(torch.tensor(x2), r_list=r_ref, return_list=True)

    net_j = TriPlanefeatEncoder(inp_ch=7, res=256, use_gru=True)
    variables = convert_state_dict(state_dict_from_torch_module(net_t))
    xj1 = jnp.asarray(np.transpose(x1, (0, 1, 3, 4, 2)))
    xj2 = jnp.asarray(np.transpose(x2, (0, 1, 3, 4, 2)))
    out, r = net_j.apply(variables, xj1, None)
    for a, b in zip(out, out_ref):
        np.testing.assert_allclose(nchw(a), b.numpy(), atol=2e-3)
    out2, _ = net_j.apply(variables, xj2, r)
    for a, b in zip(out2, out_ref2):
        np.testing.assert_allclose(nchw(a), b.numpy(), atol=2e-3)


def test_sft_unet_parity():
    torch.manual_seed(3)
    from encoder_inversion.models.unet_encoders import TriPlaneSFTfeat_Encoder as RefSFT

    net_t = RefSFT(inp_ch=6, res=256, use_gru=True)
    net_t.eval()
    rng = np.random.RandomState(3)
    x = rng.randn(1, 2, 6, 256, 256).astype(np.float32)
    with torch.no_grad():
        out_ref, _ = net_t(torch.tensor(x), r_list=None)

    net_j = TriPlaneSFTfeatEncoder(inp_ch=6, res=256, use_gru=True)
    variables = convert_state_dict(state_dict_from_torch_module(net_t))
    xj = jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2)))
    out, _ = net_j.apply(variables, xj, None)
    assert set(out.keys()) == set(out_ref.keys())
    for res in out:
        scale_ref, shift_ref = out_ref[res][0].numpy(), out_ref[res][1].numpy()
        np.testing.assert_allclose(nchw(out[res][0]), scale_ref, atol=2e-3, err_msg=f"scale{res}")
        np.testing.assert_allclose(nchw(out[res][1]), shift_ref, atol=2e-3, err_msg=f"shift{res}")


def test_latent_discriminator_parity():
    torch.manual_seed(4)
    from encoder_inversion.models.e4e import LatentCodesDiscriminator as RefD

    d_t = RefD(512, 4)
    d_t.eval()
    rng = np.random.RandomState(4)
    w = rng.randn(3, 14, 512).astype(np.float32)
    with torch.no_grad():
        out_ref = d_t(torch.tensor(w)).numpy()
    d_j = LatentCodesDiscriminator(512, 4)
    variables = convert_state_dict(state_dict_from_torch_module(d_t))
    out = d_j.apply(variables, jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(out), out_ref, atol=1e-4)
