"""Multi-chip dry-run: jit the full GAN training step over an n-device mesh.

Used by `__graft_entry__.dryrun_multichip` (driver contract) and by tests on
the virtual 8-device CPU mesh. The model is shrunken (tiny channels, 32² neural
render, 8+8 ray samples, 128² output) but the step is structurally complete:
Gmain + density-TV Greg + Dmain + R1 Dreg, Adam with lazy-reg scaling, EMA,
batch sharded over the `data` axis with replicated params.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.discriminator import DualDiscriminator
from ..models.triplane import TriPlaneGenerator
from ..parallel.mesh import make_mesh
from .gan import GANLossConfig, Schedules, make_gan_train_step, make_schedules
from .state import TrainState, adam_with_lazy_reg, ema_update

TINY_RENDERING_KWARGS = {
    "image_resolution": 128,
    "disparity_space_sampling": False,
    "clamp_mode": "softplus",
    "superresolution_module": "invertavatar_tpu.models.superresolution.SuperresolutionHybrid2X",
    "c_gen_conditioning_zero": False,
    "c_scale": 1.0,
    "superresolution_noise_mode": "random",
    "density_reg": 0.25,
    "density_reg_p_dist": 0.004,
    "reg_type": "l1",
    "decoder_lr_mul": 1.0,
    "sr_antialias": True,
    "depth_resolution": 8,
    "depth_resolution_importance": 8,
    "box_warp": 1.0,
    "gpc_reg_prob": 0.5,
}


def tiny_models(nrr: int = 32):
    g = TriPlaneGenerator(
        z_dim=32,
        c_dim=25,
        w_dim=512,  # SR blocks are built at w_dim=512 (reference superresolution.py)
        img_resolution=128,
        img_channels=3,
        rendering_kwargs=dict(TINY_RENDERING_KWARGS),
        neural_rendering_resolution=nrr,
        channel_base=1024,
        channel_max=64,
        map_num_layers=2,
    )
    d = DualDiscriminator(
        c_dim=25, img_resolution=128, img_channels=6, channel_base=1024, channel_max=64,
        num_fp16_res=0, disc_c_noise=0.0,
    )
    return g, d


def _fake_batch(rng: np.random.RandomState, batch: int, res: int, z_dim: int):
    from ..camera import fov_to_intrinsics, lookat_camera_pose

    c2w = np.asarray(
        lookat_camera_pose(None, np.pi / 2, np.pi / 2, jnp.array([0.0, 0.0, 0.2]), radius=2.7, batch_size=batch)
    )
    K = np.tile(np.asarray(fov_to_intrinsics(18.837))[None], (batch, 1, 1))
    c = np.concatenate([c2w.reshape(batch, 16), K.reshape(batch, 9)], axis=1).astype(np.float32)
    yy, xx = np.mgrid[0:256, 0:256].astype(np.float32) / 256
    alpha = ((((xx - 0.5) / 0.3) ** 2 + ((yy - 0.47) / 0.38) ** 2) < 1.0).astype(np.float32)
    uvc = np.stack([(xx * 2 - 1) * 0.9, (yy * 2 - 1) * 0.9, alpha], axis=-1)
    return {
        "image": rng.randn(batch, res, res, 3).astype(np.float32),
        "c": c,
        "v": {"uvcoords_image": np.tile(uvc[None], (batch, 1, 1, 1)).astype(np.float32)},
        "z": rng.randn(batch, z_dim).astype(np.float32),
    }


def run_dryrun(n_devices: int, devices=None) -> None:
    """Create an n-device mesh, jit the full training step, run one step."""
    mesh = make_mesh(devices=devices if devices is not None else jax.devices()[:n_devices])
    nrr = 32
    G, D = tiny_models(nrr=nrr)
    cfg = GANLossConfig(
        r1_gamma=8.0,
        gpc_reg_prob=0.5,
        neural_rendering_resolution_initial=nrr,
        neural_rendering_resolution_final=None,
        blur_init_sigma=10.0,
        blur_fade_kimg=8.0,
    )

    rng = jax.random.PRNGKey(0)
    npr = np.random.RandomState(0)
    batch = _fake_batch(npr, batch=n_devices, res=128, z_dim=32)

    init_rngs = {"params": rng, "buffers": jax.random.fold_in(rng, 1), "noise": jax.random.fold_in(rng, 2), "ray": jax.random.fold_in(rng, 3)}
    g_vars = G.init(
        init_rngs,
        jnp.asarray(batch["z"][:1]),
        jnp.asarray(batch["c"][:1]),
        {"uvcoords_image": jnp.asarray(batch["v"]["uvcoords_image"][:1])},
    )
    d_vars = D.init(
        init_rngs,
        {"image": jnp.asarray(batch["image"][:1]), "image_raw": jnp.zeros((1, nrr, nrr, 3), jnp.float32)},
        jnp.asarray(batch["c"][:1]),
    )

    g_tx = adam_with_lazy_reg(0.0025, 0.0, 0.99, 1e-8, cfg.g_reg_interval)
    d_tx = adam_with_lazy_reg(0.002, 0.0, 0.99, 1e-8, cfg.d_reg_interval)
    g_state = TrainState(g_vars["params"], g_tx.init(g_vars["params"]), g_vars.get("buffers", {}))
    d_state = TrainState(d_vars["params"], d_tx.init(d_vars["params"]), d_vars.get("buffers", {}))
    ema_params = jax.tree_util.tree_map(lambda x: x, g_state.params)

    step = make_gan_train_step(G, D, g_tx, d_tx, cfg, nrr=nrr, do_greg=True, do_dreg=True)

    rep = NamedSharding(mesh, P())
    shard = lambda x: jax.device_put(x, NamedSharding(mesh, P(*(["data"] + [None] * (np.ndim(x) - 1)))))
    batch_dev = jax.tree_util.tree_map(shard, {k: v for k, v in batch.items()})
    g_state = jax.device_put(g_state, rep)
    d_state = jax.device_put(d_state, rep)

    sched = make_schedules(cfg, cur_nimg=0)
    sched = jax.device_put(sched, rep)

    with mesh:
        jitted = jax.jit(step)
        g_state, d_state, metrics = jitted(g_state, d_state, batch_dev, sched, jax.random.PRNGKey(7))
        ema_params = jax.jit(lambda e, p: ema_update(e, p, 0.999))(ema_params, g_state.params)
        jax.block_until_ready((g_state, d_state, metrics, ema_params))

    # sanity: finite losses
    for k, val in metrics.items():
        v = float(val)
        assert np.isfinite(v), f"non-finite metric {k}={v}"
    return metrics
