"""Golden parity tests: JAX StyleGAN2 library vs the PyTorch reference.

The reference repo (read-only at /root/reference) is used purely as a test
oracle: we instantiate its modules on CPU, export the torch state dict through
`convert_state_dict`, and require max-abs-err parity on random inputs
(SURVEY.md §4 oracle (a)/(b)). Skipped when the reference tree is absent.
"""

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

from invertavatar_tpu.models import Generator  # noqa: E402
from invertavatar_tpu.utils.torch_import import (  # noqa: E402
    convert_state_dict,
    state_dict_from_torch_module,
)

CFG = dict(z_dim=16, c_dim=0, w_dim=64, img_resolution=32, img_channels=8)
SYN_CFG = dict(channel_base=1024, channel_max=64, num_fp16_res=0, conv_clamp=256)


@pytest.fixture(scope="module")
def ref_gen():
    torch.manual_seed(0)
    from training_avatar_texture.networks_stylegan2_new import Generator as RefGenerator

    g = RefGenerator(**CFG, mapping_kwargs={"num_layers": 2}, **SYN_CFG)
    g.eval()
    return g


@pytest.fixture(scope="module")
def jax_gen(ref_gen):
    gen = Generator(**CFG, **{k: v for k, v in SYN_CFG.items() if k != "conv_clamp"},
                    conv_clamp=256.0, map_num_layers=2)
    variables = convert_state_dict(state_dict_from_torch_module(ref_gen))
    return gen, variables


def nchw(x):
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


def test_mapping_parity(ref_gen, jax_gen):
    gen, variables = jax_gen
    rng = np.random.RandomState(0)
    z = rng.randn(3, CFG["z_dim"]).astype(np.float32)
    with torch.no_grad():
        ws_ref = ref_gen.mapping(torch.tensor(z), None).numpy()
    ws = gen.apply(variables, jnp.asarray(z), None, method=lambda m, z, c: m.mapping(z, c))
    np.testing.assert_allclose(np.asarray(ws), ws_ref, atol=1e-5)


def test_mapping_truncation_parity(ref_gen, jax_gen):
    gen, variables = jax_gen
    rng = np.random.RandomState(1)
    z = rng.randn(2, CFG["z_dim"]).astype(np.float32)
    # seed a nonzero w_avg on both sides
    w_avg = rng.randn(CFG["w_dim"]).astype(np.float32)
    with torch.no_grad():
        ref_gen.mapping.w_avg.copy_(torch.tensor(w_avg))
        ws_ref = ref_gen.mapping(torch.tensor(z), None, truncation_psi=0.7, truncation_cutoff=5).numpy()
    variables = dict(variables)
    buffers = jax.tree_util.tree_map(lambda x: x, variables["buffers"])
    buffers["mapping"]["w_avg"] = w_avg
    variables["buffers"] = buffers
    ws = gen.apply(
        variables, jnp.asarray(z), None,
        method=lambda m, z, c: m.mapping(z, c, truncation_psi=0.7, truncation_cutoff=5),
    )
    np.testing.assert_allclose(np.asarray(ws), ws_ref, atol=1e-5)
    with torch.no_grad():
        ref_gen.mapping.w_avg.zero_()


def test_synthesis_return_list_parity(ref_gen, jax_gen):
    gen, variables = jax_gen
    rng = np.random.RandomState(2)
    num_ws = ref_gen.synthesis.num_ws
    ws = rng.randn(2, num_ws, CFG["w_dim"]).astype(np.float32)
    with torch.no_grad():
        feats_ref = ref_gen.synthesis(
            torch.tensor(ws), cond_list=None, return_list=True, noise_mode="const", out_res=(8, 32)
        )
    feats = gen.apply(
        variables, jnp.asarray(ws),
        method=lambda m, ws: m.synthesis(ws, return_list=True, noise_mode="const", out_res=(8, 32)),
    )
    assert len(feats) == len(feats_ref)
    for i, (a, b) in enumerate(zip(feats, feats_ref)):
        np.testing.assert_allclose(nchw(a), b.numpy(), atol=2e-3, err_msg=f"tap {i}")


def test_synthesis_cond_list_parity(ref_gen, jax_gen):
    gen, variables = jax_gen
    rng = np.random.RandomState(3)
    num_ws = ref_gen.synthesis.num_ws
    ws = rng.randn(2, num_ws, CFG["w_dim"]).astype(np.float32)
    # cond_list for out_res=(8,32): entries at res 8 (img tap, img_ch+1),
    # then per-x taps at res 8, 16 with matching channels + alpha
    ch = {8: 64, 16: 64}
    conds = [rng.rand(2, CFG["img_channels"] + 1, 8, 8).astype(np.float32)]
    for res in (8, 16):
        conds.append(rng.rand(2, ch[res] + 1, res, res).astype(np.float32))
    with torch.no_grad():
        out_ref = ref_gen.synthesis(
            torch.tensor(ws), cond_list=[torch.tensor(c) for c in conds],
            return_list=False, noise_mode="const", out_res=(8, 32),
        )
    conds_nhwc = [jnp.asarray(np.transpose(c, (0, 2, 3, 1))) for c in conds]
    out = gen.apply(
        variables, jnp.asarray(ws),
        method=lambda m, ws: m.synthesis(
            ws, cond_list=conds_nhwc, noise_mode="const", out_res=(8, 32)
        ),
    )
    np.testing.assert_allclose(nchw(out), out_ref.numpy(), atol=2e-3)


def test_synthesis_sft_parity(ref_gen, jax_gen):
    gen, variables = jax_gen
    rng = np.random.RandomState(4)
    num_ws = ref_gen.synthesis.num_ws
    ws = rng.randn(1, num_ws, CFG["w_dim"]).astype(np.float32)
    # CS-SFT condition at res 16: (scale, shift) over half of 64 channels
    scale = rng.rand(1, 32, 16, 16).astype(np.float32)
    shift = rng.randn(1, 32, 16, 16).astype(np.float32)
    with torch.no_grad():
        out_ref = ref_gen.synthesis(
            torch.tensor(ws), cond_list=None, return_list=False, noise_mode="const",
            feat_conditions={16: [torch.tensor(scale), torch.tensor(shift)]}, out_res=(8, 32),
        )
    fc = {16: (jnp.asarray(np.transpose(scale, (0, 2, 3, 1))), jnp.asarray(np.transpose(shift, (0, 2, 3, 1))))}
    out = gen.apply(
        variables, jnp.asarray(ws),
        method=lambda m, ws: m.synthesis(ws, feat_conditions=fc, noise_mode="const", out_res=(8, 32)),
    )
    np.testing.assert_allclose(nchw(out), out_ref.numpy(), atol=2e-3)
