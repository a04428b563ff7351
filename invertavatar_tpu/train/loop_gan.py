"""3D-GAN training loop (reference training_avatar_texture/training_loop.py:163-529).

Orchestration: data pipeline → jitted phase steps (lazy-reg specializations) →
EMA → schedules (blur fade, neural-res 64→128, gpc ramp) → ticks with stats /
snapshots. Distribution is a single data mesh: batch sharded, params
replicated; gradient reduction is XLA-inserted (SURVEY §2.3).

Differences from the reference, by design:
  * optimizer state is checkpointed (the reference restarts Adam moments);
  * snapshots are orbax pytrees + a json config, not source-embedding pickles;
  * the neural-res fade quantizes to {initial, …, final} — each value is its
    own compiled graph, swapped at tick boundaries.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.discriminator import DualDiscriminator
from ..models.triplane import TriPlaneGenerator
from ..parallel.mesh import make_mesh
from ..utils.checkpoint import restore_orbax, save_orbax
from ..utils.stats import Collector, StatsLogger
from .gan import GANLossConfig, make_gan_train_step, make_schedules, neural_rendering_resolution
from .state import TrainState, adam_with_lazy_reg, ema_beta, ema_update


class _SkipImages(Exception):
    pass


@dataclasses.dataclass
class GANTrainConfig:
    run_dir: str = "runs/gan"
    total_kimg: int = 25000
    batch_size: int = 32
    g_lr: float = 0.0025
    d_lr: float = 0.002
    beta2: float = 0.99
    ema_kimg: float = 10.0
    ema_rampup: Optional[float] = 0.05
    kimg_per_tick: int = 4
    snapshot_ticks: int = 50
    snapshot_images: bool = True  # render the EMA fakes grid at snapshots
    seed: int = 0
    # micro-batch gradient accumulation (reference `batch_gpu` inner loop,
    # training_loop.py:371-374): each optimizer update aggregates this many
    # micro-batch steps via optax.MultiSteps; batch_iter then yields
    # micro-batches of batch_size // grad_accum
    grad_accum: int = 1
    augment_p: float = 0.0  # initial ADA probability (training_loop.py:183)
    loss: GANLossConfig = dataclasses.field(default_factory=GANLossConfig)


def train_gan(
    G: TriPlaneGenerator,
    D: DualDiscriminator,
    batch_iter,  # yields {'image' NHWC [-1,1], 'c', 'v': {'uvcoords_image'}, 'z'}
    cfg: GANTrainConfig,
    mesh=None,
    max_steps: Optional[int] = None,
    resume_dir: Optional[str] = None,
    augment_pipe=None,  # train.augment.AugmentPipe (ADA); None disables
    metric_names=(),  # e.g. ("fid50k_full",) — evaluated at snapshot ticks
    metric_dataset=None,  # dataset with items {'image', 'c', 'v'} for real stats + (c, v) sampling
    metric_detector_fn=None,  # detector(uint8 NHWC) -> [N, D] features
    init_vars=None,  # optional (g_vars, d_vars) — skips the eager flax init
    # (through the axon relay an eager init dispatches thousands of tiny ops;
    # validation runs pass flagship.init_by_shape-built trees instead)
    on_step=None,  # callback(step_idx, cur_nimg, metrics) after every step
):
    mesh = mesh or make_mesh()
    os.makedirs(cfg.run_dir, exist_ok=True)
    with open(os.path.join(cfg.run_dir, "training_options.json"), "w") as f:
        json.dump({k: str(v) for k, v in dataclasses.asdict(cfg).items()}, f, indent=2)

    rng = jax.random.PRNGKey(cfg.seed)
    batch0 = next(batch_iter)

    init_rngs = {
        "params": rng,
        "buffers": jax.random.fold_in(rng, 1),
        "noise": jax.random.fold_in(rng, 2),
        "ray": jax.random.fold_in(rng, 3),
    }
    nrr0 = cfg.loss.neural_rendering_resolution_initial
    if init_vars is not None:
        g_vars, d_vars = init_vars
    else:
        g_vars = G.init(
            init_rngs,
            jnp.asarray(batch0["z"][:1]),
            jnp.asarray(batch0["c"][:1]),
            {"uvcoords_image": jnp.asarray(batch0["v"]["uvcoords_image"][:1])},
        )
        d_vars = D.init(
            init_rngs,
            {
                "image": jnp.asarray(batch0["image"][:1]),
                "image_raw": jnp.zeros((1, nrr0, nrr0, 3), jnp.float32),
            },
            jnp.asarray(batch0["c"][:1]),
        )

    g_tx = adam_with_lazy_reg(cfg.g_lr, 0.0, cfg.beta2, 1e-8, cfg.loss.g_reg_interval)
    d_tx = adam_with_lazy_reg(cfg.d_lr, 0.0, cfg.beta2, 1e-8, cfg.loss.d_reg_interval)
    if cfg.grad_accum > 1:
        import optax

        g_tx = optax.MultiSteps(g_tx, every_k_schedule=cfg.grad_accum)
        d_tx = optax.MultiSteps(d_tx, every_k_schedule=cfg.grad_accum)
    g_state = TrainState(g_vars["params"], g_tx.init(g_vars["params"]), g_vars.get("buffers", {}))
    d_state = TrainState(d_vars["params"], d_tx.init(d_vars["params"]), d_vars.get("buffers", {}))
    ema_params = jax.tree_util.tree_map(lambda x: x, g_state.params)
    cur_nimg = 0
    start_step = 0
    resumed_augment_p = None

    if resume_dir:
        # restore INTO the freshly-built trees: orbax without a template
        # returns plain nested dicts, which breaks the optax NamedTuple states
        template = {
            "g_state": g_state._asdict(),
            "d_state": d_state._asdict(),
            "ema_params": ema_params,
            "cur_nimg": np.asarray(0),
            "step_idx": np.asarray(0),
            "augment_p": np.asarray(0.0),
        }
        restored = restore_orbax(resume_dir, template)
        g_state = TrainState(**restored["g_state"])
        d_state = TrainState(**restored["d_state"])
        ema_params = restored["ema_params"]
        cur_nimg = int(restored["cur_nimg"])
        # step_idx drives the rng fold and the lazy-reg phase cadence
        # (reference training_loop.py phases key on batch_idx); without it a
        # resumed run replays step-0 noise and reg phases
        start_step = int(restored["step_idx"])
        resumed_augment_p = float(restored["augment_p"])

    rep = NamedSharding(mesh, P())
    shard = lambda x: jax.device_put(
        x, NamedSharding(mesh, P(*(["data"] + [None] * (np.ndim(x) - 1))))
    )
    g_state = jax.device_put(g_state, rep)
    d_state = jax.device_put(d_state, rep)
    ema_params = jax.device_put(ema_params, rep)

    # one compiled step per (nrr, do_greg, do_dreg) combination
    step_cache: Dict[Any, Any] = {}

    def get_step(nrr, do_greg, do_dreg):
        key = (nrr, do_greg, do_dreg)
        if key not in step_cache:
            G_nrr = dataclasses.replace(G, neural_rendering_resolution=nrr)
            step = make_gan_train_step(
                G_nrr, D, g_tx, d_tx, cfg.loss, nrr, do_greg, do_dreg,
                augment_pipe=augment_pipe,
            )
            step_cache[key] = jax.jit(step)
        return step_cache[key]

    # ADA state (reference training_loop.py:244-248, :452-456)
    augment_p = float(cfg.augment_p) if resumed_augment_p is None else resumed_augment_p
    sign_real_acc = []

    collector = Collector()
    logger = StatsLogger(cfg.run_dir)
    ema_jit = jax.jit(ema_update)

    step_idx = start_step
    tick_start = time.time()
    next_tick_nimg = cur_nimg + cfg.kimg_per_tick * 1000
    while cur_nimg < cfg.total_kimg * 1000:
        batch = next(batch_iter)
        batch_dev = jax.tree_util.tree_map(shard, batch)
        sched = jax.device_put(make_schedules(cfg.loss, cur_nimg, augment_p=augment_p), rep)
        nrr = neural_rendering_resolution(cfg.loss, cur_nimg)
        do_greg = (step_idx % cfg.loss.g_reg_interval) == 0 and cfg.loss.density_reg > 0
        do_dreg = (step_idx % cfg.loss.d_reg_interval) == 0 and cfg.loss.r1_gamma > 0

        step_fn = get_step(nrr, do_greg, do_dreg)
        g_state, d_state, metrics = step_fn(
            g_state, d_state, batch_dev, sched, jax.random.fold_in(rng, step_idx)
        )
        beta = ema_beta(cfg.batch_size, cfg.ema_kimg, cur_nimg, cfg.ema_rampup)
        ema_params = ema_jit(ema_params, g_state.params, beta)

        cur_nimg += cfg.batch_size // cfg.grad_accum
        step_idx += 1
        for k, val in metrics.items():
            collector.report(k, np.asarray(val))
        if on_step is not None:
            on_step(step_idx, cur_nimg, metrics)

        # ADA heuristic (training_loop.py:452-456)
        if augment_pipe is not None and cfg.loss.ada_target is not None:
            sign_real_acc.append(float(metrics.get("Loss/signs/real", 0.0)))
            if step_idx % cfg.loss.ada_interval == 0:
                adjust = np.sign(np.mean(sign_real_acc) - cfg.loss.ada_target) * (
                    cfg.batch_size * cfg.loss.ada_interval
                ) / (cfg.loss.ada_kimg * 1000)
                augment_p = max(augment_p + float(adjust), 0.0)
                sign_real_acc = []
                collector.report("Progress/augment", augment_p)

        if cur_nimg >= next_tick_nimg or (max_steps and step_idx >= max_steps):
            collector.update()
            dt = time.time() - tick_start
            spk = dt / max((cur_nimg - (next_tick_nimg - cfg.kimg_per_tick * 1000)) / 1000, 1e-8)
            print(
                f"kimg {cur_nimg/1000:.1f}  sec/kimg {spk:.1f}  "
                + "  ".join(f"{n}={collector.mean(n):.4f}" for n in collector.names())
            )
            logger.write(collector, cur_nimg)
            tick_start = time.time()
            next_tick_nimg = cur_nimg + cfg.kimg_per_tick * 1000
            if (cur_nimg // (cfg.kimg_per_tick * 1000)) % cfg.snapshot_ticks == 0 or (
                max_steps and step_idx >= max_steps
            ):
                snap = {
                    "g_state": g_state._asdict(),
                    "d_state": d_state._asdict(),
                    "ema_params": ema_params,
                    "cur_nimg": np.asarray(cur_nimg),
                    "step_idx": np.asarray(step_idx),
                    "augment_p": np.asarray(augment_p),
                }
                save_orbax(os.path.join(cfg.run_dir, f"snapshot-{cur_nimg:08d}"), snap)
                # fakes grid via EMA params (reference training_loop.py:460-472)
                try:
                    if not cfg.snapshot_images:
                        raise _SkipImages
                    from ..utils.vis import save_image_grid

                    nrr = neural_rendering_resolution(cfg.loss, cur_nimg)
                    G_snap = dataclasses.replace(G, neural_rendering_resolution=nrr)
                    out = jax.jit(
                        lambda v, z, c, uvc: G_snap.apply(
                            v, z, c, {"uvcoords_image": uvc}, noise_mode="const",
                            # the SR module's noise mode comes from the config
                            # (training default 'random') and needs an rng
                            rngs={"noise": jax.random.PRNGKey(0),
                                  "ray": jax.random.PRNGKey(1)},
                        )["image"]
                    )(
                        {"params": ema_params, "buffers": g_state.buffers},
                        jnp.asarray(batch["z"][:4]),
                        jnp.asarray(batch["c"][:4]),
                        jnp.asarray(batch["v"]["uvcoords_image"][:4]),
                    )
                    save_image_grid(
                        np.asarray(out), os.path.join(cfg.run_dir, f"fakes{cur_nimg:08d}.png")
                    )
                except _SkipImages:
                    pass  # cfg.snapshot_images=False: grid (and its eval-
                    # program compile) disabled — resume tests, CI
                except Exception as e:  # snapshot rendering must never kill training
                    print(f"[warn] image snapshot failed: {e}")
                # in-training metric eval at snapshot ticks (reference
                # training_loop.py:494-503 + metric_main.py:72-82 jsonl)
                if metric_names and metric_dataset is not None and metric_detector_fn is not None:
                    from ..metrics import metric_main
                    from ..metrics.fid import make_vert_conditioned_sample_fn

                    nrr_m = neural_rendering_resolution(cfg.loss, cur_nimg)
                    G_m = dataclasses.replace(G, neural_rendering_resolution=nrr_m)
                    sample_fn = make_vert_conditioned_sample_fn(
                        G_m,
                        {"params": ema_params, "buffers": g_state.buffers},
                        z_dim=G.z_dim,
                        dataset=metric_dataset,
                    )
                    for mname in metric_names:
                        entry = metric_main.calc_metric(
                            mname,
                            run_dir=cfg.run_dir,
                            dataset=metric_dataset,
                            sample_fn=sample_fn,
                            detector_fn=metric_detector_fn,
                            cache_dir=os.path.join(cfg.run_dir, "metric-cache"),
                        )
                        for k, v in entry["results"].items():
                            print(f"metric {k} = {v:.4f}")
                            collector.report(f"Metrics/{k}", v)
        if max_steps and step_idx >= max_steps:
            break
    logger.close()
    return g_state, d_state, ema_params, cur_nimg
