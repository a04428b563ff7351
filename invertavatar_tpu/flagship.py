"""Flagship model configuration — the shipped `ani3dgan512` geometry
(reference train_avatar_texture.py:254-348 + triplane_v20 defaults)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .models.triplane import TriPlaneGenerator

FLAGSHIP_RENDERING_KWARGS = {
    "image_resolution": 512,
    "disparity_space_sampling": False,
    "clamp_mode": "softplus",
    "superresolution_module": "training_avatar_texture.superresolution.SuperresolutionHybrid8XDC",
    "c_gen_conditioning_zero": True,
    "c_scale": 1.0,
    "superresolution_noise_mode": "none",
    "density_reg": 0.25,
    "density_reg_p_dist": 0.004,
    "reg_type": "l1",
    "decoder_lr_mul": 1.0,
    "sr_antialias": True,
    # round-5 EVAL sampling budget (reference trains/evals at 48+48): with the
    # tile-pooled fine CDF the gate metrics are sample-count-flat — 40+24
    # scores the SAME MS-SSIM (0.9968) and a BETTER min PSNR (47.23 vs 46.87)
    # than 48+48 on the committed flagship torch-oracle trajectory while
    # buying ~17% frame time (docs/online_r5.json sweep: every config from
    # 48+48 down to 40+16 passes the 0.996/45 dB gate; 40+16 is another
    # +1.8 fps online if needed). Training formulations keep the literal
    # 48+48 (validators/configs set their own rendering kwargs).
    "depth_resolution": 40,
    "depth_resolution_importance": 24,
    "ray_start": 2.25,
    "ray_end": 3.3,
    "box_warp": 1.0,
    "avg_camera_radius": 2.7,
    "avg_camera_pivot": [0, 0, 0.2],
    "det_stratified": True,
    # TPU fast path: both render passes through the fused Pallas kernel
    # (bf16 payload + in-VMEM OSG decoder); the fine pass rides it via the
    # tile-pooled importance CDF. Flagship-geometry fidelity evidence
    # (docs/fidelity_flagship.json, scripts/fidelity_flagship.py): PSNR
    # >= 45.6 dB vs the live torch reference, identical with and without
    # pooling (exact path: 55.5 dB). Ignored off-TPU (exact patch gather).
    "pallas_coarse": True,
    "pooled_importance": True,
    # round-2 additions, fidelity-validated in the same harness run:
    # fast_uv_warp (downsampled-grid UV warp, PSNR 47.73 vs 47.76 without)
    # and the merged-march kernel (march_in_kernel, default-on) were active
    # for the pooled/bf16_backbones/fast_uv variants above.
    "fast_uv_warp": True,
    # round-3: rectangular 128×4 pixel tiles for the merged-march kernels —
    # the tent-contract cost scales with the window LANE width (win_c·C), so
    # tall-thin tiles cut it (docs/rect_tiles.json: 32.7 → 38.75 fps,
    # max|d| vs square tiles 1e-5); fidelity harness 'rect' variants gate it.
    "tile_shape": (128, 4),
}


def flagship_generator(
    neural_rendering_resolution: int = 128, num_fp16_res: int = 4
) -> TriPlaneGenerator:
    """The reference trains G in fp32 (--g_num_fp16_res 0) and SR with 4 fp16
    resolutions (train_avatar_texture.py:215-217). The TPU eval default runs
    the G backbones in bf16 too (num_fp16_res=4, conv_clamp kept at 256):
    fidelity evidence in docs/fidelity_flagship.json ('bf16_backbones'
    variant). Pass num_fp16_res=0 for the reference-exact fp32 backbones."""
    return TriPlaneGenerator(
        z_dim=512,
        c_dim=25,
        w_dim=512,
        img_resolution=512,
        img_channels=3,
        sr_num_fp16_res=4,
        rendering_kwargs=dict(FLAGSHIP_RENDERING_KWARGS),
        neural_rendering_resolution=neural_rendering_resolution,
        channel_base=32768,
        channel_max=512,
        num_fp16_res=num_fp16_res,
        conv_clamp=256.0,
        map_num_layers=2,
    )


def example_inputs(batch: int = 1, seed: int = 0):
    """(z, c, uvcoords_image) with a frontal camera + synthetic face mask."""
    from .camera import fov_to_intrinsics, lookat_camera_pose

    rng = np.random.RandomState(seed)
    z = rng.randn(batch, 512).astype(np.float32)
    c2w = np.asarray(
        lookat_camera_pose(None, np.pi / 2, np.pi / 2, jnp.array([0.0, 0.0, 0.2]), radius=2.7, batch_size=batch)
    )
    K = np.tile(np.asarray(fov_to_intrinsics(18.837))[None], (batch, 1, 1))
    c = np.concatenate([c2w.reshape(batch, 16), K.reshape(batch, 9)], axis=1).astype(np.float32)
    yy, xx = np.mgrid[0:256, 0:256].astype(np.float32) / 256
    face = (((xx - 0.5) / 0.3) ** 2 + ((yy - 0.47) / 0.38) ** 2) < 1.0
    mouth = (((xx - 0.5) / 0.1) ** 2 + ((yy - 0.62) / 0.04) ** 2) < 1.0
    alpha = (face & ~mouth).astype(np.float32)
    uvc = np.stack([(xx * 2 - 1) * 0.9, (yy * 2 - 1) * 0.9, alpha], axis=-1)
    uvc[alpha == 0, :2] = 0.0
    uvcoords = np.tile(uvc[None], (batch, 1, 1, 1)).astype(np.float32)
    return jnp.asarray(z), jnp.asarray(c), jnp.asarray(uvcoords)


def init_flagship(G: TriPlaneGenerator, seed: int = 0):
    z, c, uvc = example_inputs(1, seed)
    rng = jax.random.PRNGKey(seed)
    rngs = {
        "params": rng,
        "buffers": jax.random.fold_in(rng, 1),
        "noise": jax.random.fold_in(rng, 2),
        "ray": jax.random.fold_in(rng, 3),
    }
    # trace-only shape inference, then direct per-leaf init — avoids compiling
    # (and eagerly executing) the full forward just to materialize parameters.
    shapes = jax.eval_shape(
        lambda rngs, z, c, uvc: G.init(
            rngs, z, c, {"uvcoords_image": uvc}, noise_mode="const", evaluation=True
        ),
        rngs, z, c, uvc,
    )
    leaves, treedef = jax.tree_util.tree_flatten(shapes)
    npr = np.random.RandomState(seed)
    vals = [
        (npr.standard_normal(s.shape).astype(s.dtype) * 0.1)
        if np.issubdtype(s.dtype, np.floating)
        else np.zeros(s.shape, s.dtype)
        for s in leaves
    ]
    host = jax.tree_util.tree_unflatten(treedef, vals)
    return jax.device_put(host)


def init_by_shape(init_thunk, seed: int = 0):
    """Materialize `init_thunk()`'s variable tree WITHOUT executing it.

    `jax.eval_shape` traces on the host (no device dispatch — critical through
    the axon relay, where an eager flax `init` dispatches thousands of tiny
    ops at ~1 RTT each), then leaves are filled with scaled Gaussians on the
    host and shipped in one `device_put`. For random-weight benches/validation
    only — real training uses converted checkpoints.

    init_thunk: zero-arg callable running `module.init(...)` (closed over
    rngs/inputs).
    """
    shapes = jax.eval_shape(init_thunk)
    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(shapes)
    npr = np.random.RandomState(seed)

    def leaf(path, s):
        if not np.issubdtype(s.dtype, np.floating):
            return np.zeros(s.shape, s.dtype)
        name = "/".join(str(getattr(k, "key", k)) for k in path).lower()
        # neutral values for stats-like buffers (BN var must be positive)
        if "var" in name:
            return np.ones(s.shape, s.dtype)
        if "mean" in name or "avg" in name:
            return np.zeros(s.shape, s.dtype)
        return (npr.standard_normal(s.shape) * 0.1).astype(s.dtype)

    vals = [leaf(p, s) for p, s in paths_leaves]
    return jax.device_put(jax.tree_util.tree_unflatten(treedef, vals))
