"""Torch-free checkpoint unpickler vs live torch modules pickled the reference way."""

import io
import os
import pickle
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference repo not mounted")

if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

import torch  # noqa: E402

from invertavatar_tpu.utils.pkl_import import (  # noqa: E402
    get_init_kwargs,
    safe_load_pickle,
    state_dict_from_stub,
)


def test_roundtrip_persistent_module():
    torch.manual_seed(0)
    from training_avatar_texture.networks_stylegan2_new import Generator as RefGenerator

    g = RefGenerator(z_dim=8, c_dim=0, w_dim=16, img_resolution=16, img_channels=4,
                     channel_base=256, channel_max=32, num_fp16_res=0,
                     mapping_kwargs={"num_layers": 2})
    blob = pickle.dumps({"G": g, "extra": {"num": 3}})

    data = safe_load_pickle(io.BytesIO(blob))
    assert data["extra"] == {"num": 3}
    sd = state_dict_from_stub(data["G"])
    ref_sd = {k: v.detach().numpy() for k, v in g.state_dict().items()}

    missing = set(ref_sd) - set(sd)
    assert not missing, f"missing keys: {sorted(missing)[:5]}"
    for k, v in ref_sd.items():
        np.testing.assert_allclose(sd[k], v, atol=0, rtol=0, err_msg=k)

    kw = get_init_kwargs(data["G"])
    assert kw.get("z_dim") == 8 and kw.get("img_resolution") == 16


class _MixedDtypeModule(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.register_buffer("h", torch.randn(5, 3).half())
        self.register_buffer("b", torch.randn(4, 2).bfloat16())
        self.register_buffer("i", torch.arange(6, dtype=torch.int64))


def test_fp16_and_bf16_tensors():
    m = _MixedDtypeModule()
    data = safe_load_pickle(io.BytesIO(pickle.dumps(m)))
    sd = state_dict_from_stub(data)
    np.testing.assert_allclose(sd["h"], m.h.float().numpy(), atol=1e-3)
    np.testing.assert_allclose(sd["b"], m.b.float().numpy(), atol=1e-2)
    np.testing.assert_array_equal(sd["i"], m.i.numpy())
