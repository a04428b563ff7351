"""Regenerate tests/fixtures/golden_*.npz from the live torch reference.

Maintenance script (VERDICT r2 #6): the smoke test tier must not pay
torch-network-construction + oracle-forward cost at test time, so the golden
inputs/outputs (and the converted parameter trees the JAX side needs) are
precomputed HERE — once, by a maintainer with /root/reference mounted — and
committed as small npz fixtures. `tests/test_goldens.py` then only loads
arrays and runs the JAX side.

Configs mirror the live-oracle parity suites exactly (same tiny shapes, same
tolerances; tests/test_stylegan_parity.py, tests/test_triplane_parity.py), so
a golden regression means the same thing a parity regression means. The
eval-time stratum jitter is pinned through tests/oracle_utils.pin_eval_jitter
(asserts the reference still has the jitter semantics being modelled).

Usage: python scripts/make_goldens.py [all|stylegan|triplane]
"""

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REF = "/root/reference"
if not os.path.isdir(REF):
    sys.exit("reference repo not mounted at /root/reference")
if REF not in sys.path:
    sys.path.insert(0, REF)

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

# the axon sitecustomize force-sets jax_platforms at interpreter start;
# override back — goldens are CPU-only maintenance artifacts
jax.config.update("jax_platforms", "cpu")

from tests.oracle_utils import pin_eval_jitter, stub_reference_modules  # noqa: E402

stub_reference_modules()

import numpy as np  # noqa: E402
import torch  # noqa: E402

from flax import serialization  # noqa: E402

from invertavatar_tpu.utils.torch_import import (  # noqa: E402
    convert_state_dict,
    state_dict_from_torch_module,
)

FIXTURES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "tests", "fixtures")


def _save(name, variables, **arrays):
    os.makedirs(FIXTURES, exist_ok=True)
    buf = io.BytesIO()
    buf.write(serialization.to_bytes(variables))
    path = os.path.join(FIXTURES, name)
    np.savez_compressed(path, __variables__=np.frombuffer(buf.getvalue(), np.uint8),
                        **arrays)
    print(f"wrote {path}.npz ({os.path.getsize(path + '.npz') / 1e6:.1f} MB)")


def make_stylegan():
    """Tiny StyleGAN2 G: mapping (plain + truncation) and full forward
    (mirrors tests/test_stylegan_parity.py CFG/SYN_CFG)."""
    from training_avatar_texture.networks_stylegan2_new import Generator as RefGenerator

    CFG = dict(z_dim=16, c_dim=0, w_dim=64, img_resolution=32, img_channels=8)
    torch.manual_seed(0)
    g = RefGenerator(**CFG, mapping_kwargs={"num_layers": 2},
                     channel_base=1024, channel_max=64, num_fp16_res=0, conv_clamp=256)
    g.eval()
    variables = convert_state_dict(state_dict_from_torch_module(g))

    rng = np.random.RandomState(0)
    z = rng.randn(3, CFG["z_dim"]).astype(np.float32)
    w_avg = rng.randn(CFG["w_dim"]).astype(np.float32)
    with torch.no_grad():
        ws_ref = g.mapping(torch.tensor(z), None).numpy()
        img_ref = g.synthesis(
            g.mapping(torch.tensor(z), None), cond_list=None, return_list=False,
            noise_mode="const",
        ).numpy()
        g.mapping.w_avg.copy_(torch.tensor(w_avg))
        ws_trunc_ref = g.mapping(torch.tensor(z), None, truncation_psi=0.7,
                                 truncation_cutoff=5).numpy()
    _save("golden_stylegan", variables, z=z, w_avg=w_avg, ws_ref=ws_ref,
          ws_trunc_ref=ws_trunc_ref, img_ref=img_ref)


def make_triplane():
    """Tiny TriPlaneGenerator v20: synthesis + synthesis_withTexture (the
    animation-loop entry) — mirrors tests/test_triplane_parity.py SMALL."""
    import jax.numpy as jnp

    from training_avatar_texture.triplane_v20 import TriPlaneGenerator as RefG

    from invertavatar_tpu.camera import fov_to_intrinsics, lookat_camera_pose
    from tests.test_triplane_parity import CFG, RENDER_KWARGS, SMALL, _uvcoords

    torch.manual_seed(0)
    g_t = RefG(**CFG, sr_num_fp16_res=0, mapping_kwargs={"num_layers": 2},
               rendering_kwargs=dict(RENDER_KWARGS), **SMALL)
    g_t.eval()
    g_t.neural_rendering_resolution = 64
    variables = convert_state_dict(state_dict_from_torch_module(g_t))

    rng = np.random.RandomState(2)
    num_ws = g_t.backbone.mapping.num_ws
    ws = rng.randn(1, num_ws, CFG["w_dim"]).astype(np.float32)
    c2w = np.asarray(lookat_camera_pose(None, 3.14 / 2, 3.14 / 2,
                                        jnp.array([0.0, 0.0, 0.2]), radius=2.7, batch_size=1))
    K = np.asarray(fov_to_intrinsics(18.837))[None]
    c = np.concatenate([c2w.reshape(1, 16), K.reshape(1, 9)], axis=1).astype(np.float32)
    uvc = _uvcoords(1).astype(np.float32)

    orig = pin_eval_jitter()
    try:
        with torch.no_grad():
            out_syn = g_t.synthesis(
                torch.tensor(ws), torch.tensor(c),
                {"uvcoords_image": torch.tensor(uvc)}, noise_mode="const", evaluation=True,
            )
            tex_t = g_t.texture_backbone.synthesis(torch.tensor(ws), cond_list=None,
                                                   return_list=True, noise_mode="const")
            static_t = g_t.backbone.synthesis(torch.tensor(ws), cond_list=None,
                                              return_list=True, noise_mode="const")
            out_wt = g_t.synthesis_withTexture(
                torch.tensor(ws), tex_t, torch.tensor(c),
                {"uvcoords_image": torch.tensor(uvc)},
                static_feats=static_t, noise_mode="const", evaluation=True,
            )
    finally:
        torch.rand_like = orig
    _save(
        "golden_triplane", variables, ws=ws, c=c, uvc=uvc,
        syn_image_ref=out_syn["image"].numpy(),
        syn_image_raw_ref=out_syn["image_raw"].numpy(),
        syn_image_depth_ref=out_syn["image_depth"].numpy(),
        wt_image_ref=out_wt["image"].numpy(),
        wt_image_raw_ref=out_wt["image_raw"].numpy(),
    )


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "stylegan"):
        make_stylegan()
    if which in ("all", "triplane"):
        make_triplane()
