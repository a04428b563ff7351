"""Parity: style-U-Net family vs the reference networks_styleunet."""

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

from invertavatar_tpu.models.encoders.styleunet import (  # noqa: E402
    CondSynthesisNetworkWithGRU,
    EncoderResBlock,
)
from invertavatar_tpu.utils.torch_import import (  # noqa: E402
    convert_state_dict,
    state_dict_from_torch_module,
)


def nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def nchw(x):
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


def test_encoder_res_block_parity():
    torch.manual_seed(0)
    from encoder_inversion.models.networks_styleunet import EncoderResBlock as RefBlock

    blk_t = RefBlock(3, 16, 32, downsample=True)
    blk_t.eval()
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 32, 32).astype(np.float32)
    skip = rng.randn(2, 16, 16, 16).astype(np.float32)
    with torch.no_grad():
        inp_ref, out_ref = blk_t(torch.tensor(x), torch.tensor(skip))

    blk_j = EncoderResBlock(3, 16, 32, downsample=True)
    variables = convert_state_dict(state_dict_from_torch_module(blk_t))
    inp, out = blk_j.apply(variables, nhwc(x), nhwc(skip))
    np.testing.assert_allclose(nchw(inp), inp_ref.numpy(), atol=1e-4)
    np.testing.assert_allclose(nchw(out), out_ref.numpy(), atol=1e-4)


def test_cond_synthesis_with_gru_parity():
    torch.manual_seed(1)
    from encoder_inversion.models.networks_styleunet import CondSynthesisNetwork_withGRU as RefNet

    net_t = RefNet(img_resolution=64, img_channels=8, cond_channels=3, in_size=32,
                   final_size=4, channel_base=512, channel_max=64, num_cond_res=32)
    net_t.eval()
    rng = np.random.RandomState(1)
    x = rng.randn(1, 2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        img_ref, r_ref = net_t(torch.tensor(x), r_list=None, return_list=False)

    net_j = CondSynthesisNetworkWithGRU(img_resolution=64, img_channels=8, cond_channels=3,
                                        in_size=32, final_size=4, channel_base=512,
                                        channel_max=64, num_cond_res=32)
    variables = convert_state_dict(state_dict_from_torch_module(net_t))
    img, r = net_j.apply(variables, jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2))), None)
    np.testing.assert_allclose(nchw(img), img_ref.numpy(), atol=2e-3)


def test_cond_synthesis_plain_residual_parity():
    torch.manual_seed(2)
    from encoder_inversion.models.networks_styleunet import CondSynthesisNetwork as RefNet

    from invertavatar_tpu.models.encoders.styleunet import CondSynthesisNetwork

    kw = dict(img_resolution=64, img_channels=3, cond_channels=3, in_size=32,
              final_size=4, channel_base=512, channel_max=64, num_cond_res=32)
    net_t = RefNet(residual_arch=True, **kw)
    net_t.eval()
    rng = np.random.RandomState(2)
    x = rng.randn(1, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        ref = net_t(torch.tensor(x), return_list=False).numpy()

    net_j = CondSynthesisNetwork(residual_arch=True, **kw)
    variables = convert_state_dict(state_dict_from_torch_module(net_t))
    out = net_j.apply(variables, nhwc(x))
    np.testing.assert_allclose(nchw(out), ref, atol=2e-3)


def test_cond_synthesis_new_parity():
    torch.manual_seed(3)
    from encoder_inversion.models.networks_styleunet import CondSynthesisNetwork_new as RefNet

    from invertavatar_tpu.models.encoders.styleunet import CondSynthesisNetworkNew

    kw = dict(img_resolution=64, img_channels=8, cond_channels=5, in_size=64,
              final_size=4, channel_base=512, channel_max=64, num_cond_res=64)
    net_t = RefNet(**kw)
    net_t.eval()
    rng = np.random.RandomState(3)
    x = rng.randn(2, 5, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref = net_t(torch.tensor(x), return_list=True)

    net_j = CondSynthesisNetworkNew(**kw)
    variables = convert_state_dict(state_dict_from_torch_module(net_t))
    out = net_j.apply(variables, nhwc(x), return_list=True)
    assert len(out) == len(ref)
    for o, r in zip(out, ref):
        np.testing.assert_allclose(nchw(o), r.numpy(), atol=2e-3)


def test_cond_synthesis_convfusion_parity():
    torch.manual_seed(4)
    from encoder_inversion.models.networks_styleunet import (
        CondSynthesisNetwork_withConvFusion as RefNet,
    )

    from invertavatar_tpu.models.encoders.styleunet import CondSynthesisNetworkWithConvFusion

    kw = dict(img_resolution=64, img_channels=8, cond_channels=3, in_size=32,
              final_size=4, channel_base=512, channel_max=64, num_cond_res=32)
    net_t = RefNet(**kw)
    net_t.eval()
    rng = np.random.RandomState(4)
    x = rng.randn(1, 4, 3, 32, 32).astype(np.float32)  # T=4 (conv_fusion is built for T=4)
    with torch.no_grad():
        ref, _ = net_t(torch.tensor(x), return_list=False)

    net_j = CondSynthesisNetworkWithConvFusion(**kw)
    variables = convert_state_dict(state_dict_from_torch_module(net_t))
    out, _ = net_j.apply(variables, jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2))))
    np.testing.assert_allclose(nchw(out), ref.numpy(), atol=2e-3)


def test_cond_synthesis_sft_parity():
    torch.manual_seed(5)
    from encoder_inversion.models.networks_styleunet import CondSynthesisNetwork_SFT as RefNet

    from invertavatar_tpu.models.encoders.styleunet import CondSynthesisNetworkSFT

    kw = dict(img_resolution=64, img_channels=8, cond_channels=3, in_size=32,
              final_size=4, channel_base=512, channel_max=64, num_cond_res=32)
    net_t = RefNet(use_gru=True, **kw)
    net_t.eval()
    rng = np.random.RandomState(5)
    x = rng.randn(1, 2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        ref, _ = net_t(torch.tensor(x), r_list=None)

    net_j = CondSynthesisNetworkSFT(**kw)
    variables = convert_state_dict(state_dict_from_torch_module(net_t))
    out, _ = net_j.apply(variables, jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2))))
    assert set(out.keys()) == set(ref.keys())
    for res in ref:
        # reference stacks (scale, shift) along dim0
        np.testing.assert_allclose(nchw(out[res][0]), ref[res][0].numpy(), atol=2e-3)
        np.testing.assert_allclose(nchw(out[res][1]), ref[res][1].numpy(), atol=2e-3)


def test_plain_synthesis_network_parity():
    torch.manual_seed(6)
    from encoder_inversion.models.networks_styleunet import SynthesisNetwork as RefNet

    from invertavatar_tpu.models.encoders.styleunet import PlainSynthesisNetwork

    kw = dict(img_resolution=64, img_channels=4, final_size=4,
              channel_base=512, channel_max=64)
    net_t = RefNet(**kw)
    net_t.eval()
    rng = np.random.RandomState(6)
    x = rng.randn(1, 64, 4, 4).astype(np.float32)  # channels_dict[4]=min(512/4,64)=64
    img = rng.randn(1, 4, 4, 4).astype(np.float32)
    with torch.no_grad():
        ref = net_t(torch.tensor(x), torch.tensor(img), return_list=False).numpy()

    net_j = PlainSynthesisNetwork(**kw)
    variables = convert_state_dict(state_dict_from_torch_module(net_t))
    out = net_j.apply(variables, nhwc(x), nhwc(img))
    np.testing.assert_allclose(nchw(out), ref, atol=2e-3)
