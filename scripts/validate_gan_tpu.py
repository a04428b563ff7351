"""Record a real-TPU execution of the 3D GAN training step.

VERDICT r3 missing #3: the GAN step runs sharded on the virtual CPU mesh
(MULTICHIP ok) but had never executed on the actual chip. This runs
`make_gan_train_step` at the flagship config (512^2 output, 128^2-capable G,
48+48 samples, channel base 32768 — train_3dgan.sh geometry) at B=1/chip,
nrr=64 (the reference's neural_rendering_resolution_initial), with the
blur/gpc schedules at cur_nimg=0 (blur sigma 10 live, swap-prob ramp live —
training_avatar_texture/training_loop.py:343-389 semantics), and writes
docs/gan_tpu_run.json.

Two statically-specialized programs are recorded separately so a failure in
the heavier one cannot lose the lighter one's record:
  * main:  Gmain + Dmain               (do_greg=False, do_dreg=False)
  * reg:   + density-TV Greg + R1 Dreg (do_greg=True,  do_dreg=True —
           both lazy-reg phases fall on step 0 in the reference cadence)

ADA augmentation is off (train_3dgan.sh passes no --aug; the ADA pipe's
program structure is covered by tests/test_augment.py + the CPU-mesh loop).

Usage: python scripts/validate_gan_tpu.py [main|reg|all]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_repo, ".jax_cache"))

import numpy as np
import jax
import jax.numpy as jnp

from invertavatar_tpu.flagship import flagship_generator, init_by_shape
from invertavatar_tpu.models.discriminator import DualDiscriminator
from invertavatar_tpu.train.dryrun import _fake_batch
from invertavatar_tpu.train.gan import GANLossConfig, make_gan_train_step, make_schedules
from invertavatar_tpu.train.state import TrainState, adam_with_lazy_reg, ema_update

NRR = 64  # train_3dgan.sh --neural_rendering_resolution_initial 64


def build():
    G = flagship_generator(neural_rendering_resolution=NRR)
    # Training formulation, not the eval fast path: the flagship kwargs bake
    # in the Pallas eval samplers (no VJP — differentiating them raised
    # NotImplementedError on chip, r4 run 1) and deterministic/pooled
    # sampling. GAN training keeps the reference's stochastic per-ray
    # sampling (train/fast_render.py rationale: G LEARNS the field here).
    rk = dict(G.rendering_kwargs)
    for k in ("pallas_coarse", "pooled_importance", "fast_uv_warp",
              "tile_shape", "det_stratified"):
        rk.pop(k, None)
    # literal training sampling (train_3dgan.sh geometry): the flagship EVAL
    # kwargs carry the round-5 40+24 eval budget (flagship.py), but training
    # keeps the reference's stochastic 48+48
    rk["depth_resolution"] = 48
    rk["depth_resolution_importance"] = 48
    G = G.clone(rendering_kwargs=rk)
    D = DualDiscriminator(
        c_dim=25, img_resolution=512, img_channels=6,
        channel_base=32768, channel_max=512, num_fp16_res=4, disc_c_noise=0.0,
    )
    cfg = GANLossConfig(
        r1_gamma=8.0,  # train_3dgan.sh --gamma 8
        gpc_reg_prob=0.5,  # --gen_pose_cond 1 (train_avatar_texture.py:352)
        neural_rendering_resolution_initial=NRR,
        neural_rendering_resolution_final=128,
        blur_init_sigma=10.0,
        blur_fade_kimg=200.0,  # blur live at step 0
    )
    rng = jax.random.PRNGKey(0)
    init_rngs = {"params": rng, "buffers": jax.random.fold_in(rng, 1),
                 "noise": jax.random.fold_in(rng, 2), "ray": jax.random.fold_in(rng, 3)}
    raw = _fake_batch(np.random.RandomState(0), batch=1, res=512, z_dim=512)
    batch = {
        "image": jnp.asarray(raw["image"]),
        "c": jnp.asarray(raw["c"]),
        "v": {"uvcoords_image": jnp.asarray(raw["v"]["uvcoords_image"])},
        "z": jnp.asarray(raw["z"]),
    }

    t0 = time.time()
    g_vars = init_by_shape(
        lambda: G.init(init_rngs, batch["z"], batch["c"], batch["v"])
    )
    d_vars = init_by_shape(
        lambda: D.init(
            init_rngs,
            {"image": batch["image"], "image_raw": jnp.zeros((1, NRR, NRR, 3), jnp.float32)},
            batch["c"],
        )
    )
    g_tx = adam_with_lazy_reg(0.0025, 0.0, 0.99, 1e-8, cfg.g_reg_interval)
    d_tx = adam_with_lazy_reg(0.002, 0.0, 0.99, 1e-8, cfg.d_reg_interval)
    g_state = TrainState(g_vars["params"], g_tx.init(g_vars["params"]),
                         g_vars.get("buffers", {}))
    d_state = TrainState(d_vars["params"], d_tx.init(d_vars["params"]),
                         d_vars.get("buffers", {}))
    init_s = time.time() - t0
    return G, D, cfg, g_tx, d_tx, g_state, d_state, batch, init_s


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    out = {
        "backend": jax.devices()[0].platform,
        "device_kind": jax.devices()[0].device_kind,
        "generator": "flagship (512^2 out, nrr=64 initial, 48+48 samples, ch 32768/512)",
        "discriminator": "DualDiscriminator ch 32768/512, 4 fp16 res, mbstd group 4",
        "recipe": "train_3dgan.sh: gamma 8, gen_pose_cond 1 (gpc 0.5), blur sigma 10 live, "
                  "Adam lr G 0.0025 / D 0.002 with lazy-reg scaling; B=1/chip "
                  "(reference: batch 32 on 8 GPUs = 4/device)",
        "batch_per_chip": 1,
        "configs": {},
    }
    print("backend:", out["backend"], out["device_kind"], flush=True)

    path = os.path.join(_repo, "docs", "gan_tpu_run.json")
    if os.path.exists(path):
        try:
            with open(path) as f:
                out["configs"] = json.load(f).get("configs", {})
        except Exception:  # noqa: BLE001
            pass

    def flush_json():
        with open(path, "w") as f:
            json.dump(out, f, indent=2)
        print("wrote", path, flush=True)

    G, D, cfg, g_tx, d_tx, g_state, d_state, batch, init_s = build()
    sched = make_schedules(cfg, cur_nimg=0)
    ema_params = jax.tree_util.tree_map(lambda x: x, g_state.params)

    def fence(state):
        jax.block_until_ready(jax.tree_util.tree_leaves(state.params)[0])
        # block_until_ready is unreliable through the axon relay; a scalar
        # readback actually fences (docs/PERF_NOTES.md)
        np.asarray(jax.tree_util.tree_leaves(state.params)[0]).ravel()[:1]

    def run_config(name, do_greg, do_dreg):
        rec = {"do_greg": do_greg, "do_dreg": do_dreg, "init_s": round(init_s, 1)}
        out["configs"][name] = rec
        nonlocal g_state, d_state, ema_params
        try:
            step = jax.jit(make_gan_train_step(
                G, D, g_tx, d_tx, cfg, nrr=NRR, do_greg=do_greg, do_dreg=do_dreg
            ))
            t0 = time.time()
            g2, d2, metrics = step(g_state, d_state, batch, sched, jax.random.PRNGKey(7))
            fence(g2)
            rec["step1_s"] = round(time.time() - t0, 1)
            g_state, d_state = g2, d2
            t0 = time.time()
            g2, d2, metrics2 = step(g_state, d_state, batch, sched, jax.random.PRNGKey(8))
            fence(g2)
            rec["step2_warm_s"] = round(time.time() - t0, 2)
            g_state, d_state = g2, d2
            t0 = time.time()
            ema_params = jax.jit(lambda e, p: ema_update(e, p, 0.999))(
                ema_params, g_state.params
            )
            np.asarray(jax.tree_util.tree_leaves(ema_params)[0]).ravel()[:1]
            rec["ema_s"] = round(time.time() - t0, 2)
            rec["losses"] = {k: float(v) for k, v in metrics.items()}
            rec["losses_step2"] = {k: float(v) for k, v in metrics2.items()}
            rec["finite_losses"] = bool(
                all(np.isfinite(float(v)) for v in {**metrics, **metrics2}.values())
            )
        except Exception as e:  # noqa: BLE001 — record, keep earlier configs
            rec["error"] = f"{type(e).__name__}: {str(e)[:300]}"
            print(f"[{name}] FAILED: {rec['error']}", flush=True)
        finally:
            flush_json()
        print(name, json.dumps(rec), flush=True)

    if mode in ("all", "main"):
        print("== Gmain + Dmain (no reg phases) ==", flush=True)
        run_config("main_B1_nrr64", do_greg=False, do_dreg=False)
    if mode in ("all", "reg"):
        print("== + density-TV Greg + R1 Dreg ==", flush=True)
        run_config("reg_B1_nrr64", do_greg=True, do_dreg=True)

    # params-moved check at the end (one readback)
    try:
        ok = bool(out["configs"] and all(
            "error" not in r for r in out["configs"].values()
        ))
        out["all_configs_ok"] = ok
    finally:
        flush_json()


if __name__ == "__main__":
    main()
