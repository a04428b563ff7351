"""Regression coverage for the shipped Pallas fast path (VERDICT r2 #2).

The flagship default routes rendering through three Pallas TPU kernels
(`pallas_plane_sample.sample_planes_windowed_pallas`,
`pallas_fused_render.fused_render_pallas`, `fused_merged_march_pallas`); all
pytest runs are pinned to the CPU mesh, so without these tests the suite
silently exercises only the exact XLA fallback. Here the kernels run in TPU
INTERPRET mode (pltpu.InterpretParams: CPU emulation of the grid walk, DMAs
and semaphores) against the exact XLA oracles. Error budgets mirror
docs/PERF_NOTES.md: the fast path is bf16-payload (≈1e-2 feature error,
≤3.7e-3 rgb at flagship geometry); the f32/exact mode must match to ~1e-4.

A TPU-marked companion (test_pallas_tpu_real) runs the REAL kernels when the
suite executes on hardware; on the CPU mesh it skips.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from invertavatar_tpu.ops.grid_sample import grid_sample
from invertavatar_tpu.ops.pallas_plane_sample import sample_planes_windowed_pallas
from invertavatar_tpu.render.renderer import ImportanceRenderer
from invertavatar_tpu.render.ray_sampler import sample_rays

pytestmark = pytest.mark.smoke


def _structured_grid(rng, N, res, S, spread=0.08, scale=1.1):
    """Tile-coherent sampling grid like the real coarse pass (rays of a tile
    diverge little; strata drift a few texels)."""
    ys, xs = np.mgrid[0:res, 0:res].astype(np.float32) / res
    base = np.stack([xs * 2 - 1, ys * 2 - 1], -1).reshape(res * res, 2)
    offs = (rng.rand(res * res, S, 2) - 0.5) * spread
    grid_np = np.clip(base[:, None, :] * scale + offs, -1.15, 1.15).astype(np.float32)
    return jnp.asarray(np.broadcast_to(grid_np[None], (N, res * res, S, 2)).copy())


def test_windowed_pallas_interpret_exact_matches_grid_sample():
    """f32/exact kernel ≡ grid_sample (zeros-padding) to 1e-4."""
    rng = np.random.RandomState(1)
    N, H, C = 3, 64, 8
    res, S, tile = 32, 4, 8
    planes = jnp.asarray(rng.randn(N, H, H, C).astype(np.float32))
    grid = _structured_grid(rng, N, res, S)

    ref = grid_sample(planes, grid.reshape(N, -1, 2)).reshape(N, res * res, S, C)
    out = sample_planes_windowed_pallas(
        planes, grid, res=res, tile=tile, window=32,
        payload_dtype=jnp.float32, exact=True, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_windowed_pallas_interpret_bf16_error_band():
    """bf16 payload: the shipped fast-path config stays within ~1e-2 feature
    error (PERF_NOTES error class)."""
    rng = np.random.RandomState(2)
    N, H, C = 3, 64, 8
    res, S, tile = 32, 4, 8
    planes = jnp.asarray(rng.randn(N, H, H, C).astype(np.float32))
    grid = _structured_grid(rng, N, res, S)

    ref = grid_sample(planes, grid.reshape(N, -1, 2)).reshape(N, res * res, S, C)
    out = sample_planes_windowed_pallas(
        planes, grid, res=res, tile=tile, window=32,
        payload_dtype=jnp.bfloat16, exact=False, interpret=True,
    )
    err = np.abs(np.asarray(out, np.float32) - np.asarray(ref))
    assert err.max() < 5e-2, err.max()
    assert err.mean() < 5e-3, err.mean()


def _decoder_params(rng, C=8, HID=16, OUT=8):
    w1 = jnp.asarray(rng.randn(C, HID).astype(np.float32) * 0.3)
    b1 = jnp.asarray(rng.randn(HID).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(HID, 1 + OUT).astype(np.float32) * 0.3)
    b2 = jnp.asarray(rng.randn(1 + OUT).astype(np.float32) * 0.1)
    return (w1, b1, w2, b2)


def _osg_oracle(feats_mean, params):
    """XLA oracle for the in-kernel decoder (triplane_v20.py:426-438 math)."""
    w1, b1, w2, b2 = params
    h = jax.nn.softplus(feats_mean @ w1 + b1[None])
    o = h @ w2 + b2[None]
    sigma = o[..., 0:1]
    rgb = jax.nn.sigmoid(o[..., 1:]) * (1 + 2 * 0.001) - 0.001
    return rgb, sigma


def test_fused_render_interpret_matches_xla_oracle():
    """fused sampling+decoder kernel vs grid_sample → OSG MLP oracle."""
    rng = np.random.RandomState(3)
    N, H, C = 3, 64, 8
    res, S, tile = 32, 4, 8
    planes = jnp.asarray(rng.randn(N, H, H, C).astype(np.float32))
    grid = _structured_grid(rng, N, res, S)
    params = _decoder_params(rng, C=C)

    from invertavatar_tpu.ops.pallas_fused_render import fused_render_pallas

    feats = grid_sample(planes, grid.reshape(N, -1, 2)).reshape(N, res * res, S, C)
    rgb_ref, sigma_ref = _osg_oracle(jnp.mean(feats, axis=0), params)

    rgb, sigma = fused_render_pallas(
        planes, grid, params, res=res, tile=tile, window=32, interpret=True,
    )
    # bf16 payload fast path: feature error ~1e-2 → post-decoder budgets
    assert np.abs(np.asarray(rgb) - np.asarray(rgb_ref)).max() < 2e-2
    assert np.abs(np.asarray(sigma) - np.asarray(sigma_ref)).max() < 1e-1
    # f32 payload tightens to near-exact (decoder runs fp32 in-kernel)
    rgb32, sigma32 = fused_render_pallas(
        planes, grid, params, res=res, tile=tile, window=32,
        payload_dtype=jnp.float32, interpret=True,
    )
    assert np.abs(np.asarray(rgb32) - np.asarray(rgb_ref)).max() < 1e-3
    assert np.abs(np.asarray(sigma32) - np.asarray(sigma_ref)).max() < 1e-2


def _renderer_setup(rng, res=32, C=8, planeH=64):
    planes = jnp.asarray(rng.randn(1, 3, planeH, planeH, C).astype(np.float32) * 0.5)
    params = _decoder_params(rng, C=C)

    def decoder(feats):  # [B, 3, M, C] -> dict (exact fallback path)
        x = jnp.mean(feats.astype(jnp.float32), axis=1)
        rgb, sigma = _osg_oracle(x, params)
        return {"rgb": rgb, "sigma": sigma}

    from invertavatar_tpu.camera import fov_to_intrinsics, lookat_camera_pose

    c2w = np.asarray(lookat_camera_pose(None, np.pi / 2, np.pi / 2, jnp.zeros(3),
                                        radius=2.7, batch_size=1))
    K = np.tile(np.asarray(fov_to_intrinsics(18.837))[None], (1, 1, 1))
    ro, rd = sample_rays(jnp.asarray(c2w, jnp.float32), jnp.asarray(K, jnp.float32), res)
    opts = {
        "depth_resolution": 8,
        "depth_resolution_importance": 8,
        "box_warp": 1.0,
        "clamp_mode": "softplus",
        "disparity_space_sampling": False,
        "det_stratified": True,
        "pooled_importance": True,
        "coarse_window": 32,
    }
    return planes, decoder, params, ro, rd, opts


def test_renderer_fused_march_interpret_vs_exact():
    """Full flagship fast path (pallas_coarse + fused_render + march_in_kernel)
    in interpret mode vs the exact XLA pooled path — the end-to-end regression
    gate for the 559-line merged-march kernel."""
    rng = np.random.RandomState(4)
    planes, decoder, params, ro, rd, opts = _renderer_setup(rng)
    r = ImportanceRenderer()

    rgb_ref, dep_ref, ws_ref = r(planes, decoder, ro, rd, dict(opts), evaluation=True)

    fast_opts = dict(
        opts, pallas_coarse=True, fused_render=True, march_in_kernel=True,
        pallas_interpret=True,
    )
    rgb, dep, ws = r(planes, decoder, ro, rd, fast_opts, evaluation=True,
                     decoder_params=params)
    rgb_err = np.abs(np.asarray(rgb) - np.asarray(rgb_ref))
    assert rgb_err.max() < 5e-2, rgb_err.max()
    assert rgb_err.mean() < 5e-3, rgb_err.mean()
    assert np.abs(np.asarray(dep) - np.asarray(dep_ref)).max() < 5e-2
    assert np.abs(np.asarray(ws) - np.asarray(ws_ref)).max() < 5e-2


def test_renderer_pallas_coarse_interpret_vs_exact():
    """pallas_coarse WITHOUT the merged march (the non-pooled routing):
    exercises sample_planes_windowed_pallas + fused_render inside the
    standard two-pass renderer."""
    rng = np.random.RandomState(5)
    planes, decoder, params, ro, rd, opts = _renderer_setup(rng)
    r = ImportanceRenderer()

    rgb_ref, dep_ref, ws_ref = r(planes, decoder, ro, rd, dict(opts), evaluation=True)

    fast_opts = dict(
        opts, pallas_coarse=True, fused_render=True, march_in_kernel=False,
        pallas_interpret=True,
    )
    rgb, dep, ws = r(planes, decoder, ro, rd, fast_opts, evaluation=True,
                     decoder_params=params)
    assert np.abs(np.asarray(rgb) - np.asarray(rgb_ref)).max() < 5e-2
    assert np.abs(np.asarray(dep) - np.asarray(dep_ref)).max() < 5e-2
    assert np.abs(np.asarray(ws) - np.asarray(ws_ref)).max() < 5e-2


def test_renderer_fused_march_interpret_rect_tiles():
    """Rectangular (tall×thin) kernel tiles (options['tile_shape']): the
    lane-width lever for the fused kernels. Must stay within the same error
    band as the square-tile fast path vs the exact pooled oracle — pooling
    regions follow the tile shape, so this is gated like `pooled` itself."""
    rng = np.random.RandomState(7)
    planes, decoder, params, ro, rd, opts = _renderer_setup(rng)
    r = ImportanceRenderer()

    rgb_ref, dep_ref, ws_ref = r(planes, decoder, ro, rd, dict(opts), evaluation=True)

    fast_opts = dict(
        opts, pallas_coarse=True, fused_render=True, march_in_kernel=True,
        pallas_interpret=True, tile_shape=(16, 2),
    )
    rgb, dep, ws = r(planes, decoder, ro, rd, fast_opts, evaluation=True,
                     decoder_params=params)
    rgb_err = np.abs(np.asarray(rgb) - np.asarray(rgb_ref))
    # pooled regions differ (16×2 strips vs 8×8 squares) → slightly wider
    # band than the square-tile test; the flagship-geometry gate is the
    # fidelity harness (scripts/fidelity_flagship.py)
    assert rgb_err.max() < 8e-2, rgb_err.max()
    assert rgb_err.mean() < 1e-2, rgb_err.mean()
    assert np.abs(np.asarray(ws) - np.asarray(ws_ref)).max() < 8e-2


def test_fused_render_interpret_rect_tiles_exact():
    """Rect tiles in the plain fused kernel: f32 payload must match the XLA
    oracle bilinear+decoder to near-exact — the tile shape is a pure
    scheduling choice there (no pooling interaction)."""
    rng = np.random.RandomState(8)
    N, H, C = 3, 64, 8
    res, S = 32, 4
    planes = jnp.asarray(rng.randn(N, H, H, C).astype(np.float32))
    grid = _structured_grid(rng, N, res, S)
    params = _decoder_params(rng, C=C)

    from invertavatar_tpu.ops.pallas_fused_render import fused_render_pallas

    feats = grid_sample(planes, grid.reshape(N, -1, 2)).reshape(N, res * res, S, C)
    rgb_ref, sigma_ref = _osg_oracle(jnp.mean(feats, axis=0), params)

    rgb, sigma = fused_render_pallas(
        planes, grid, params, res=res, tile=(16, 2), window=(48, 16),
        payload_dtype=jnp.float32, interpret=True,
    )
    assert np.abs(np.asarray(rgb) - np.asarray(rgb_ref)).max() < 1e-3
    assert np.abs(np.asarray(sigma) - np.asarray(sigma_ref)).max() < 1e-2


@pytest.mark.tpu
def test_pallas_tpu_real_kernels():
    """Real-hardware kernel check (runs only when the suite executes on TPU;
    the CPU-mesh conftest skips it). Asserts the PERF_NOTES error bounds on
    the actual Mosaic-compiled kernels."""
    if jax.devices()[0].platform != "tpu":
        pytest.skip("requires TPU hardware")
    rng = np.random.RandomState(6)
    planes, decoder, params, ro, rd, opts = _renderer_setup(rng)
    r = ImportanceRenderer()
    rgb_ref, dep_ref, ws_ref = r(planes, decoder, ro, rd, dict(opts), evaluation=True)
    fast_opts = dict(opts, pallas_coarse=True, fused_render=True, march_in_kernel=True)
    rgb, dep, ws = r(planes, decoder, ro, rd, fast_opts, evaluation=True,
                     decoder_params=params)
    assert np.abs(np.asarray(rgb) - np.asarray(rgb_ref)).max() < 5e-2
    assert np.abs(np.asarray(dep) - np.asarray(dep_ref)).max() < 5e-2


def test_renderer_fused_march_interpret_resident_identical():
    """resident_planes=True (whole plane set in VMEM, windows sliced in place)
    must be BITWISE-identical to the windowed-DMA kernels — same payload
    dtype, same tent contraction; only the data motion differs."""
    rng = np.random.RandomState(4)
    planes, decoder, params, ro, rd, opts = _renderer_setup(rng)
    r = ImportanceRenderer()

    base = dict(opts, pallas_coarse=True, fused_render=True, march_in_kernel=True,
                pallas_interpret=True)
    rgb_w, dep_w, ws_w = r(planes, decoder, ro, rd, dict(base), evaluation=True,
                           decoder_params=params)
    rgb_r, dep_r, ws_r = r(planes, decoder, ro, rd, dict(base, resident_planes=True),
                           evaluation=True, decoder_params=params)
    np.testing.assert_array_equal(np.asarray(rgb_w), np.asarray(rgb_r))
    np.testing.assert_array_equal(np.asarray(dep_w), np.asarray(dep_r))
    np.testing.assert_array_equal(np.asarray(ws_w), np.asarray(ws_r))


def test_windowed_cvjp_grads_match_xla_windowed():
    """`sample_planes_windowed_cvjp` (Pallas fwd, linear-transpose bwd): the
    forward must match the XLA windowed formulation and the plane gradient
    must match jax.grad through `sample_planes_coarse_windowed` — the grad
    path the inversion training loops take under fast_grad="pallas"."""
    from invertavatar_tpu.ops.plane_sample import (
        sample_planes_coarse_windowed,
        sample_planes_windowed_cvjp,
    )

    rng = np.random.RandomState(3)
    N, H, C = 3, 64, 8
    res, S, tile, window = 32, 4, 8, 32
    planes = jnp.asarray(rng.randn(N, H, H, C).astype(np.float32))
    grid = _structured_grid(rng, N, res, S)
    cot_w = jnp.asarray(rng.randn(N, res * res, S, C).astype(np.float32))

    ref = sample_planes_coarse_windowed(planes, grid, res=res, tile=tile, window=window)
    out = sample_planes_windowed_cvjp(planes, grid, res, tile, window, True, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    def loss_ref(p):
        return jnp.sum(sample_planes_coarse_windowed(p, grid, res=res, tile=tile,
                                                     window=window) * cot_w)

    def loss_cvjp(p):
        return jnp.sum(sample_planes_windowed_cvjp(p, grid, res, tile, window,
                                                   True, True) * cot_w)

    g_ref = jax.grad(loss_ref)(planes)
    g_out = jax.grad(loss_cvjp)(planes)
    np.testing.assert_allclose(np.asarray(g_out), np.asarray(g_ref), atol=2e-3,
                               rtol=1e-4)

    # sanity: the cotangent actually reaches every touched texel (non-trivial)
    assert float(jnp.sum(jnp.abs(g_out))) > 1.0


def test_flops_ledger_records_kernel_work():
    """The kernel-FLOP ledger (bench.py MXU-utilization accounting) records
    nonzero matmul FLOPs when a Pallas sampler traces, and clears after."""
    from invertavatar_tpu.ops.pallas_fused_render import (
        start_flops_ledger,
        stop_flops_ledger,
    )
    from invertavatar_tpu.ops.pallas_plane_sample import sample_planes_windowed_pallas

    rng = np.random.RandomState(4)
    N, H, C = 3, 64, 8
    res, S, tile = 32, 4, 8
    planes = jnp.asarray(rng.randn(N, H, H, C).astype(np.float32))
    grid = _structured_grid(rng, N, res, S)

    start_flops_ledger()
    jax.eval_shape(
        lambda p, g: sample_planes_windowed_pallas(
            p, g, res=res, tile=tile, window=32,
            payload_dtype=jnp.float32, exact=True, interpret=True,
        ),
        planes, grid,
    )
    total = stop_flops_ledger()
    # 3 planes × 64 tiles·... — the exact number tracks the wrapper's dims;
    # what matters is that the work is visible and the ledger resets
    assert total > 1e6, total
    assert stop_flops_ledger() == 0.0
