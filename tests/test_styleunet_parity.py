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
