"""Committed fidelity regression gate (VERDICT r3 #7).

Round 3's fidelity evidence lived in a manually-run script
(scripts/fidelity_flagship.py → docs/fidelity_flagship.json); a regression
could only be caught by re-running it by hand. These tests turn the same
MS-SSIM/PSNR gate into CI:

  * CPU tier: the shipped fast-path OPTIONS (fused Pallas render in interpret
    mode + pooled importance + rect tiles) at the small golden_triplane
    geometry, gated against the committed torch-oracle frame
    (tests/fixtures/golden_triplane.npz — exact-path reference from
    scripts/make_goldens.py).
  * TPU tier (@tpu, PYTEST_TPU=1): the shipped flagship configuration
    (flagship.py FLAGSHIP_RENDERING_KWARGS verbatim — rect 128×4 tiles, bf16
    backbones, fast_uv) against committed flagship torch-oracle frames
    (tests/fixtures/golden_fidelity.npz, dumped by
    `python scripts/fidelity_flagship.py --dump-goldens`). Thresholds are the
    docs/fidelity_flagship.json v2 gate: MS-SSIM ≥ 0.996, PSNR ≥ 45 dB.
  * real-LPIPS slot: activates when converted AlexNet LPIPS weights exist at
    docs/lpips_weights/ (zero-egress image ships none); asserts the
    BASELINE.json LPIPS ≤ 0.01 budget literally.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _psnr(a, b):
    mse = float(np.mean((np.asarray(a, np.float32) - np.asarray(b, np.float32)) ** 2))
    return 10.0 * np.log10(4.0 / mse)  # images in [-1, 1]


def _msssim(a_nhwc, b_nhwc):
    from invertavatar_tpu.losses.ms_ssim import ms_ssim

    return float(
        jax.jit(lambda a, b: ms_ssim((a + 1) * 0.5, (b + 1) * 0.5, val_range=1.0))(
            jnp.asarray(a_nhwc), jnp.asarray(b_nhwc)
        )
    )


@pytest.mark.slow
def test_fidelity_gate_cpu_interpret():
    """Shipped fast-path options at golden_triplane geometry, interpret-mode
    Pallas kernels, vs the committed exact-path torch frame. Bounds chosen
    from the measured interpret-mode deviation band (pooled CDF + small
    geometry): looser than the flagship gate but tight enough that a kernel
    or rasterize regression (wrong tile mapping, broken CDF pooling, dtype
    slip) fails loudly."""
    from flax import serialization

    from invertavatar_tpu.models.triplane import TriPlaneGenerator

    path = os.path.join(FIXTURES, "golden_triplane.npz")
    if not os.path.exists(path):
        pytest.skip("golden_triplane.npz not generated (run scripts/make_goldens.py)")
    data = np.load(path)
    variables = serialization.msgpack_restore(data["__variables__"].tobytes())

    from tests.test_triplane_parity import CFG, RENDER_KWARGS, SMALL

    rk = dict(
        RENDER_KWARGS,
        pallas_coarse=True,
        pooled_importance=True,
        pallas_interpret=True,
        tile_shape=(16, 2),  # rect tiles scaled to the 32² neural render
    )
    g = TriPlaneGenerator(
        **CFG, sr_num_fp16_res=0, rendering_kwargs=rk, neural_rendering_resolution=64,
        **SMALL, map_num_layers=2,
    )

    def run(m, ws, c, v):
        tex = m.texture_backbone.synthesis(ws, return_list=True, noise_mode="const")
        static = m.backbone.synthesis(ws, return_list=True, noise_mode="const")
        return m.synthesis_withTexture(ws, tex, c, v, static_feats=static,
                                       noise_mode="const", evaluation=True)

    out = g.apply(variables, jnp.asarray(data["ws"]), jnp.asarray(data["c"]),
                  {"uvcoords_image": jnp.asarray(data["uvc"])}, method=run)
    img = np.asarray(out["image"], np.float32)  # NHWC
    ref = np.transpose(data["wt_image_ref"], (0, 2, 3, 1))
    ms = _msssim(img, ref)
    ps = _psnr(img, ref)
    # measured on commit: MS-SSIM 0.999999 / PSNR 85.3 dB / max|d| 1.8e-3
    # (interpret mode computes the kernel walk in fp32) — 0.999/55 dB leaves
    # ~30 dB of headroom over run-to-run noise while still failing loudly on
    # any tile-mapping/CDF-pooling/dtype regression
    assert ms >= 0.999, f"MS-SSIM {ms} (shipped-option interpret path regressed)"
    assert ps >= 55.0, f"PSNR {ps} dB (shipped-option interpret path regressed)"


def _flagship_goldens():
    path = os.path.join(FIXTURES, "golden_fidelity.npz")
    if not os.path.exists(path):
        pytest.skip("golden_fidelity.npz not generated "
                    "(run scripts/fidelity_flagship.py --dump-goldens)")
    return np.load(path)


def _flagship_variables():
    """Regenerate the JAX weights the goldens were produced from (torch seed 0
    → convert; ~150 MB, too large to commit). Needs torch + /root/reference."""
    if not os.path.isdir("/root/reference"):
        pytest.skip("reference checkout not available for weight regeneration")
    import sys

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    scripts = os.path.join(REPO, "scripts")
    if scripts not in sys.path:
        sys.path.insert(0, scripts)
    from tests.oracle_utils import stub_reference_modules

    stub_reference_modules()
    from fidelity_flagship import build_torch_oracle

    _, variables, ws = build_torch_oracle()
    return variables, ws


def _flagship_shipped_frames(variables, ws, cameras, uvcoords):
    from invertavatar_tpu.flagship import flagship_generator

    G = flagship_generator()  # the SHIPPED config, verbatim

    def precompute(v, ws):
        def run(m, ws):
            tex = m.texture_backbone.synthesis(ws, return_list=True, noise_mode="const")
            static = m.backbone.synthesis(ws, return_list=True, noise_mode="const")
            return tex, static

        return G.apply(v, ws, method=run)

    tex, static = jax.jit(precompute)(variables, jnp.asarray(ws))

    def frame(v, ws, tex, static, c, uvc):
        def run(m, ws, tex, static, c, v_):
            return m.synthesis_withTexture(
                ws, tex, c, v_, static_feats=static, noise_mode="const", evaluation=True
            )["image"]

        return G.apply(v, ws, tex, static, c, {"uvcoords_image": uvc}, method=run)

    frame_jit = jax.jit(frame)
    out = []
    for k in range(cameras.shape[0]):
        img = frame_jit(variables, jnp.asarray(ws), tex, static,
                        jnp.asarray(cameras[k:k + 1]),
                        jnp.asarray(uvcoords[k:k + 1], jnp.float32))
        out.append(np.asarray(img, np.float32))
    return out


@pytest.mark.tpu
@pytest.mark.timeout(3600)
def test_fidelity_gate_tpu_shipped():
    """Flagship shipped config on the chip vs committed torch-oracle frames:
    MS-SSIM ≥ 0.996 / PSNR ≥ 45 dB (docs/fidelity_flagship.json v2 gate)."""
    if jax.devices()[0].platform != "tpu":
        pytest.skip("requires TPU hardware (PYTEST_TPU=1)")
    data = _flagship_goldens()
    variables, ws = _flagship_variables()
    np.testing.assert_allclose(ws, data["ws"], rtol=0, atol=0)
    frames = _flagship_shipped_frames(
        variables, ws, data["cameras"], data["uvcoords"]
    )
    refs = np.transpose(data["frames_ref"].astype(np.float32), (0, 2, 3, 1))
    ms_all, ps_all = [], []
    for k, img in enumerate(frames):
        ms_all.append(_msssim(img, refs[k:k + 1]))
        ps_all.append(_psnr(img, refs[k:k + 1]))
    assert min(ms_all) >= 0.996, f"MS-SSIM min {min(ms_all)} < 0.996: {ms_all}"
    assert min(ps_all) >= 45.0, f"PSNR min {min(ps_all)} dB < 45: {ps_all}"


@pytest.mark.tpu
@pytest.mark.timeout(3600)
def test_fidelity_gate_lpips():
    """Literal BASELINE.json LPIPS ≤ 0.01 gate — activates when converted
    AlexNet LPIPS weights are dropped at docs/lpips_weights/ (none ship in
    this zero-egress image; the slot is the committed test, not a note)."""
    lp_dir = os.path.join(REPO, "docs", "lpips_weights")
    if not os.path.isdir(lp_dir):
        pytest.skip("no converted LPIPS weights at docs/lpips_weights/")
    if jax.devices()[0].platform != "tpu":
        pytest.skip("requires TPU hardware (PYTEST_TPU=1)")
    data = _flagship_goldens()
    variables, ws = _flagship_variables()
    frames = _flagship_shipped_frames(
        variables, ws, data["cameras"], data["uvcoords"]
    )
    from invertavatar_tpu.losses.lpips import LPIPS
    from invertavatar_tpu.utils.checkpoint import restore_orbax

    lp = LPIPS(net_type="alex")
    lp_vars = restore_orbax(lp_dir)
    lp_fn = jax.jit(lambda a, b: lp.apply(lp_vars, a, b))
    refs = np.transpose(data["frames_ref"].astype(np.float32), (0, 2, 3, 1))
    vals = [float(lp_fn(jnp.asarray(img), jnp.asarray(refs[k:k + 1])))
            for k, img in enumerate(frames)]
    assert max(vals) <= 0.01, f"LPIPS max {max(vals)} > 0.01: {vals}"
