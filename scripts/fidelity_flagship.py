"""Full-scale fidelity harness: flagship-geometry JAX vs live torch reference.

VERDICT r1 item #3: all parity tests run shrunken configs; this harness runs
the FLAGSHIP geometry (48+48 ray samples, 128^2 neural render, 512^2 SR, full
channel counts) with weights transplanted into the live reference
`triplane_v20.TriPlaneGenerator` (oracle frames per
reenact_avatar_next3d.py:146-218), renders N animation frames on both sides,
and reports per-variant deviation metrics:

  * exact    — JAX fast patch gather, fp32 (the 'pallas off' fallback)
  * default  — the shipped TPU fast path (fused Pallas bf16 kernel + bf16
               fine patch gather)
  * pooled   — default + pooled_importance (tile-pooled fine CDF)

Metrics (v2, VERDICT r2 #5): max|d|, PSNR (images in [-1,1]), and weight-free
MS-SSIM as the perceptual gate; a real-LPIPS slot activates when converted
AlexNet LPIPS weights exist at docs/lpips_weights/. Inputs are N=16
FaceVerse-manager-rasterized uvcoords over a smooth coefficient trajectory.

Run on a TPU host: torch side computes on CPU, JAX side on the TPU.
Writes JSON to docs/fidelity_flagship.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REF = "/root/reference"
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache)

from tests.oracle_utils import pin_eval_jitter, stub_reference_modules  # noqa: E402

stub_reference_modules()

import numpy as np
import torch

import jax
import jax.numpy as jnp

from invertavatar_tpu.flagship import FLAGSHIP_RENDERING_KWARGS
from invertavatar_tpu.models.triplane import TriPlaneGenerator
from invertavatar_tpu.utils.torch_import import convert_state_dict, state_dict_from_torch_module

N_FRAMES = int(os.environ.get("FID_FRAMES", "16"))

# v2 (VERDICT r2 #5): uvcoords_image comes from the repo's own FaceVerse
# manager driven through a smooth coefficient trajectory (the realistic input
# distribution of the online reenact loop, reenact_avatar_next3d.py:208-209)
# instead of 3 hand-drawn ellipse masks; the perceptual gate is weight-free
# MS-SSIM (losses/ms_ssim.py) instead of the degenerate random-weight LPIPS
# proxy. The same rasterized uvcoords feed BOTH frameworks.
_UVC_CACHE = {}


def _uvcoords_bank(n_frames):
    if n_frames not in _UVC_CACHE:
        from invertavatar_tpu.faceverse.synthetic import coeff_trajectory, synthetic_manager

        mgr, _ = synthetic_manager()
        traj = coeff_trajectory(n_frames)
        _UVC_CACHE[n_frames] = [
            np.asarray(mgr.make_driven_rendering(traj[k]), np.float32)
            for k in range(n_frames)
        ]
    return _UVC_CACHE[n_frames]


def _uvcoords(frame_idx, res=256):
    return _uvcoords_bank(N_FRAMES)[frame_idx]


def _camera(frame_idx):
    from invertavatar_tpu.camera import fov_to_intrinsics, lookat_camera_pose

    yaw = np.pi / 2 + 0.25 * np.sin(frame_idx * 0.9)
    pitch = np.pi / 2 + 0.1 * np.cos(frame_idx * 0.7)
    c2w = np.asarray(
        lookat_camera_pose(None, yaw, pitch, jnp.array([0.0, 0.0, 0.2]), radius=2.7, batch_size=1)
    )
    K = np.asarray(fov_to_intrinsics(18.837))[None]
    return np.concatenate([c2w.reshape(1, 16), K.reshape(1, 9)], axis=1).astype(np.float32)


def psnr(a, b):
    mse = float(np.mean((a - b) ** 2))
    return 10.0 * np.log10(4.0 / mse)  # images live in [-1, 1]


def build_torch_oracle(t0=None):
    """Flagship reference generator with the EXACT weight recipe the committed
    goldens (tests/fixtures/golden_fidelity.npz) were produced from:
    torch.manual_seed(0) → RefG init → convert_state_dict. Reused by
    tests/test_fidelity_gate.py to regenerate the JAX variables without
    committing ~150 MB of weights."""
    t0 = t0 or time.time()
    torch.manual_seed(0)
    from training_avatar_texture.triplane_v20 import TriPlaneGenerator as RefG

    CFG = dict(z_dim=512, c_dim=25, w_dim=512, img_resolution=512, img_channels=3)
    SIZES = dict(channel_base=32768, channel_max=512, num_fp16_res=0, conv_clamp=256)
    rk = {k: v for k, v in FLAGSHIP_RENDERING_KWARGS.items() if k not in ("det_stratified", "pallas_coarse")}

    g_t = RefG(**CFG, sr_num_fp16_res=0, mapping_kwargs={"num_layers": 2},
               rendering_kwargs=dict(rk), **SIZES)
    g_t.eval()
    g_t.neural_rendering_resolution = 128
    print(f"[{time.time()-t0:6.1f}s] torch flagship built", flush=True)

    variables = convert_state_dict(state_dict_from_torch_module(g_t))
    print(f"[{time.time()-t0:6.1f}s] weights transplanted", flush=True)

    rng = np.random.RandomState(7)
    num_ws = g_t.backbone.mapping.num_ws
    ws = rng.randn(1, num_ws, 512).astype(np.float32)
    return g_t, variables, ws


def main():
    t0 = time.time()
    g_t, variables, ws = build_torch_oracle(t0)

    # the reference jitters ray strata even in evaluation (renderer.py:395-407);
    # pin to mid-stratum to match det_stratified on the JAX side (asserts the
    # reference still has the jitter semantics this models)
    pin_eval_jitter()

    # torch oracle: precompute features once, animate (eval_seq loop, SURVEY §3.3)
    frames_ref = []
    with torch.no_grad():
        tex_t = g_t.texture_backbone.synthesis(torch.tensor(ws), cond_list=None, return_list=True, noise_mode="const")
        static_t = g_t.backbone.synthesis(torch.tensor(ws), cond_list=None, return_list=True, noise_mode="const")
        for k in range(N_FRAMES):
            out = g_t.synthesis_withTexture(
                torch.tensor(ws), tex_t, torch.tensor(_camera(k)),
                {"uvcoords_image": torch.tensor(_uvcoords(k))},
                static_feats=static_t, noise_mode="const", evaluation=True,
            )
            frames_ref.append(out["image"].numpy())
            print(f"[{time.time()-t0:6.1f}s] torch frame {k}", flush=True)

    if "--dump-goldens" in sys.argv:
        # committed regression fixture (VERDICT r3 #7): the torch frames +
        # inputs; weights are regenerated by build_torch_oracle at test time
        fix = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "tests", "fixtures", "golden_fidelity.npz")
        np.savez_compressed(
            fix,
            ws=ws,
            cameras=np.concatenate([_camera(k) for k in range(N_FRAMES)], axis=0),
            uvcoords=np.concatenate(
                [_uvcoords(k) for k in range(N_FRAMES)], axis=0
            ).astype(np.float16),
            frames_ref=np.concatenate(frames_ref, axis=0).astype(np.float16),
        )
        print(f"[{time.time()-t0:6.1f}s] wrote {fix}", flush=True)
        if "--goldens-only" in sys.argv:
            return

    # JAX side at the same geometry
    variants = {
        "exact": dict(pallas_coarse=False, bf16_gather=False, sr_num_fp16_res=0,
                      num_fp16_res=0, pooled_importance=False),
        "default": dict(pallas_coarse=True, pooled_importance=False, num_fp16_res=0),
        "pooled": dict(pallas_coarse=True, pooled_importance=True, num_fp16_res=0),
        # the shipped TPU eval default: fused bf16 render + pooled fine +
        # bf16 G backbones (flagship.py)
        "bf16_backbones": dict(pallas_coarse=True, pooled_importance=True, num_fp16_res=4),
        # + round-2 rasterize fast path: downsampled-grid UV warp on the
        # sub-256 texture levels (models/triplane.py rasterize)
        "fast_uv": dict(pallas_coarse=True, pooled_importance=True, num_fp16_res=4,
                        fast_uv_warp=True),
        # round-3 candidate: rectangular kernel tiles (lane-width lever,
        # scripts/profile_rect_tiles.py) — pooled-CDF regions become 64×4
        # strips; same bf16 payload error class otherwise
        "rect_64x4": dict(pallas_coarse=True, pooled_importance=True, num_fp16_res=4,
                          fast_uv_warp=True, tile_shape=(64, 4)),
        "rect_64x8": dict(pallas_coarse=True, pooled_importance=True, num_fp16_res=4,
                          fast_uv_warp=True, tile_shape=(64, 8)),
        # the SHIPPED flagship default (flagship.py tile_shape=(128, 4),
        # docs/rect_tiles.json 38.75 fps) — this is the variant that gates
        # the production configuration
        "rect_128x4": dict(pallas_coarse=True, pooled_importance=True, num_fp16_res=4,
                           fast_uv_warp=True, tile_shape=(128, 4)),
    }

    results = {}

    # Perceptual gate: weight-free MS-SSIM (losses/ms_ssim.py — Wang et al.
    # multi-scale SSIM, no pretrained weights needed). A real-LPIPS slot is
    # kept: drop converted AlexNet LPIPS weights (orbax) at
    # docs/lpips_weights/ and it is picked up automatically.
    from invertavatar_tpu.losses.ms_ssim import ms_ssim

    msssim_fn = jax.jit(lambda a, b: ms_ssim((a + 1) * 0.5, (b + 1) * 0.5, val_range=1.0))
    lp_fn = None
    _lp_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "docs", "lpips_weights")
    if os.path.isdir(_lp_dir):
        from invertavatar_tpu.losses.lpips import LPIPS
        from invertavatar_tpu.utils.checkpoint import restore_orbax

        lp = LPIPS(net_type="alex")
        lp_vars = restore_orbax(_lp_dir)
        lp_fn = jax.jit(lambda a, b: lp.apply(lp_vars, a, b))

    for name, over in variants.items():
        over = dict(over)
        sr_fp16 = over.pop("sr_num_fp16_res", 4)
        g_fp16 = over.pop("num_fp16_res", 0)
        G = TriPlaneGenerator(
            z_dim=512, c_dim=25, w_dim=512, img_resolution=512, img_channels=3,
            sr_num_fp16_res=sr_fp16,
            rendering_kwargs=dict(FLAGSHIP_RENDERING_KWARGS, **over),
            neural_rendering_resolution=128,
            channel_base=32768, channel_max=512, num_fp16_res=g_fp16, conv_clamp=256.0,
            map_num_layers=2,
        )

        def precompute(v, ws):
            def run(m, ws):
                tex = m.texture_backbone.synthesis(ws, return_list=True, noise_mode="const")
                static = m.backbone.synthesis(ws, return_list=True, noise_mode="const")
                return tex, static
            return G.apply(v, ws, method=run)

        tex_j, static_j = jax.jit(precompute)(variables, jnp.asarray(ws))

        def frame(v, ws, tex, static, c, uvc):
            def run(m, ws, tex, static, c, v_):
                return m.synthesis_withTexture(
                    ws, tex, c, v_, static_feats=static, noise_mode="const", evaluation=True
                )["image"]
            return G.apply(v, ws, tex, static, c, {"uvcoords_image": uvc}, method=run)

        frame_jit = jax.jit(frame)
        maxd, ps, mss, lps = [], [], [], []
        for k in range(N_FRAMES):
            img = frame_jit(variables, jnp.asarray(ws), tex_j, static_j,
                            jnp.asarray(_camera(k)), jnp.asarray(_uvcoords(k)))
            img_np = np.transpose(np.asarray(img, dtype=np.float32), (0, 3, 1, 2))
            ref = frames_ref[k]
            maxd.append(float(np.abs(img_np - ref).max()))
            ps.append(psnr(img_np, ref))
            a = jnp.asarray(np.transpose(img_np, (0, 2, 3, 1)))
            b = jnp.asarray(np.transpose(ref, (0, 2, 3, 1)))
            mss.append(float(msssim_fn(a, b)))
            if lp_fn is not None:
                lps.append(float(lp_fn(a, b)))
        results[name] = {
            "max_abs": max(maxd),
            "psnr_db_min": min(ps),
            "psnr_db_mean": float(np.mean(ps)),
            "ms_ssim_min": min(mss),
            "ms_ssim_mean": float(np.mean(mss)),
        }
        if lps:
            results[name]["lpips_max"] = max(lps)
        print(f"[{time.time()-t0:6.1f}s] {name}: {results[name]}", flush=True)

    out_path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                            "docs", "fidelity_flagship.json")
    with open(out_path, "w") as f:
        json.dump({"n_frames": N_FRAMES, "results": results,
                   "inputs": "FaceVerse-manager-rasterized uvcoords over a smooth "
                             "coefficient trajectory (faceverse/synthetic.py)",
                   "note": "perceptual gate = weight-free MS-SSIM; real-LPIPS slot "
                           "activates when converted weights exist at docs/lpips_weights/"},
                  f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
