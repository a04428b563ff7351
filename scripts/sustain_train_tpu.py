"""Sustained on-chip training runs with mid-run snapshot + resume.

VERDICT r4 next-3: every prior on-chip training artifact was 1-2 steps. This
records the loops *sustaining* training on the real TPU:

  gan      30 steps of `train_gan` at the flagship config (512^2, nrr=64,
           B=1/chip — validate_gan_tpu.py geometry) through the REAL loop:
           lazy-reg phase machine (g_reg 4 / d_reg 16 → three compiled
           variants), EMA, blur/gpc schedules, ticks with stats.jsonl +
           fakes grid, orbax snapshots at 10/20/30 imgs.
  gan-resume   restores the 20-img snapshot and runs steps 21-30; the loop
           must continue (restored step_idx drives the rng fold and reg
           cadence; template restore keeps the optax NamedTuple states).
  fewshot  20 steps of `train_fewshot` (fast paths, T=4 shipped unit,
           tex/tri batch-parity groups, per-step Ireal+Igen) with a mid-run
           snapshot at step 10.
  fewshot-resume  restores the step-10 snapshot and runs steps 11-20.

Writes docs/gan_tpu_trainrun.json and docs/fewshot_tpu_trainrun.json with the
per-step loss series; run dirs keep stats.jsonl / fakes grids / snapshots.
Reference match: training_avatar_texture/training_loop.py:343-529,
encoder_inversion/training_loop_video.py:402-480.

Usage: python scripts/sustain_train_tpu.py [gan|gan-resume|fewshot|fewshot-resume]
"""

import json
import os
import sys
import time

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _repo)
sys.path.insert(0, os.path.join(_repo, "scripts"))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_repo, ".jax_cache"))

import numpy as np
import jax
import jax.numpy as jnp

GAN_DIR = os.path.join(_repo, "runs", "sustain_gan")
FS_DIR = os.path.join(_repo, "runs", "sustain_fewshot")


def _load(path):
    if os.path.exists(path):
        try:
            with open(path) as f:
                return json.load(f)
        except Exception:  # noqa: BLE001
            pass
    return {}


def _save(path, out):
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path, flush=True)


def _series_summary(series, key):
    vals = [s["losses"].get(key) for s in series if key in s.get("losses", {})]
    vals = [v for v in vals if v is not None]
    if not vals:
        return None
    return {
        "first": round(vals[0], 5),
        "last": round(vals[-1], 5),
        "mean_first5": round(float(np.mean(vals[:5])), 5),
        "mean_last5": round(float(np.mean(vals[-5:])), 5),
    }


# ---------------------------------------------------------------- GAN stage

def run_gan(resume: bool):
    from validate_gan_tpu import NRR, build  # flagship geometry, shared

    from invertavatar_tpu.train.dryrun import _fake_batch
    from invertavatar_tpu.train.loop_gan import GANTrainConfig, train_gan

    path = os.path.join(_repo, "docs", "gan_tpu_trainrun.json")
    out = _load(path)
    out.setdefault("device_kind", jax.devices()[0].device_kind)
    out.setdefault(
        "config",
        "flagship 512^2 G (48+48 samples, ch 32768/512), nrr=64, B=1/chip, "
        "g_reg_interval=4 / d_reg_interval=16 (three lazy-reg program "
        "variants), blur sigma 10 live, EMA, ticks every 10 imgs with "
        "stats.jsonl + fakes grid + orbax snapshot",
    )
    key = "resume_steps21_30" if resume else "steps1_30"
    rec = {"started": time.strftime("%Y-%m-%d %H:%M:%S")}
    out[key] = rec

    G, D, cfg_loss_holder, g_tx, d_tx, g_state, d_state, batch, init_s = build()
    rec["init_s"] = round(init_s, 1)
    # build() returns states it created for the 2-step validator; the loop
    # builds its own from init_vars — reuse only G/D/loss-config and geometry
    loss_cfg = cfg_loss_holder
    g_vars = {"params": g_state.params, "buffers": g_state.buffers}
    d_vars = {"params": d_state.params, "buffers": d_state.buffers}
    del g_state, d_state

    run_dir = GAN_DIR + ("_resume" if resume else "")
    cfg = GANTrainConfig(
        run_dir=run_dir,
        total_kimg=1,  # bounded by max_steps below
        batch_size=1,
        kimg_per_tick=0.01,  # tick (stats + snapshot + fakes grid) / 10 imgs
        snapshot_ticks=1,
        loss=loss_cfg,
    )

    rng = np.random.RandomState(7)

    def batches():
        while True:
            yield _fake_batch(rng, batch=1, res=512, z_dim=512)

    series = []

    def on_step(step_idx, cur_nimg, metrics):
        entry = {
            "step": int(step_idx),
            "nimg": int(cur_nimg),
            "t": round(time.time(), 2),
            "losses": {k: float(v) for k, v in metrics.items()},
        }
        series.append(entry)
        print(json.dumps(entry), flush=True)

    resume_dir = None
    if resume:
        resume_dir = os.path.join(GAN_DIR, "snapshot-00000020")
        if not os.path.isdir(resume_dir):
            rec["error"] = f"no snapshot at {resume_dir} — run `gan` first"
            _save(path, out)
            return
        # the resumed iterator must not replay steps 1-20's batches. The
        # original run consumed draw 1 (init shapes) + draws 2-21 (steps
        # 1-20); skipping 20 leaves draw 21 for the resume's init batch and
        # draws 22-31 for steps 21-30 — exactly the uninterrupted sequence.
        it = batches()
        for _ in range(20):
            next(it)

    if not resume:
        it = batches()
    t0 = time.time()
    try:
        train_gan(
            G, D, it, cfg, max_steps=30,
            resume_dir=resume_dir,
            init_vars=(g_vars, d_vars),
            on_step=on_step,
        )
        rec["wall_s"] = round(time.time() - t0, 1)
    except Exception as e:  # noqa: BLE001
        rec["error"] = f"{type(e).__name__}: {str(e)[:400]}"
    finally:
        rec["steps"] = series
        finite = [
            np.isfinite(list(s["losses"].values())).all() for s in series
        ]
        rec["finite_losses"] = bool(finite and all(finite))
        rec["n_steps"] = len(series)
        for k in ("Loss/G/loss", "Loss/D/loss", "Loss/r1_penalty"):
            s = _series_summary(series, k)
            if s is not None:
                rec.setdefault("trend", {})[k] = s
        rec["snapshots"] = sorted(
            d for d in os.listdir(run_dir) if d.startswith("snapshot-")
        ) if os.path.isdir(run_dir) else []
        rec["fakes_grids"] = sorted(
            d for d in os.listdir(run_dir) if d.startswith("fakes")
        ) if os.path.isdir(run_dir) else []
        _save(path, out)


# ------------------------------------------------------------ few-shot stage

def run_fewshot(resume: bool):
    from validate_fewshot_tpu import build  # flagship InversionNet geometry

    from invertavatar_tpu.train.inversion import InversionLossWeights
    from invertavatar_tpu.train.loop_inversion import (
        InversionTrainConfig,
        train_fewshot,
    )

    path = os.path.join(_repo, "docs", "fewshot_tpu_trainrun.json")
    out = _load(path)
    out.setdefault("device_kind", jax.devices()[0].device_kind)
    out.setdefault(
        "config",
        "flagship InversionNet (512^2 G, GRU unets), shipped few-shot unit "
        "(multiT off, T=4 run_seq), fast paths (fused no-grad renders + "
        "Pallas-VJP grad sampling), tex/tri batch-parity groups, per-step "
        "Ireal+Igen, lpips term disabled (no pretrained AlexNet in image)",
    )
    key = "resume_steps11_20" if resume else "steps1_10_snapshot_10"
    rec = {"started": time.strftime("%Y-%m-%d %H:%M:%S")}
    out[key] = rec

    T = 4
    net, variables, batch0, init_s = build(T)
    rec["init_s"] = round(init_s, 1)

    run_dir = FS_DIR  # resume continues IN PLACE (snapshot names carry nimg)
    weights = InversionLossWeights(
        l1=1.0, lpips=0.0, id=0.0, raw_l1=1.0, tri=0.001,
        lr_lpips=0.0, mouth=0.0, adv=0.0,
    )
    cfg = InversionTrainConfig(
        run_dir=run_dir, total_kimg=1, batch_size=1, lr=2.5e-5,
        weights=weights,
    )

    npr = np.random.RandomState(11)

    def clips():
        base = {k: np.asarray(v) for k, v in batch0.items() if k != "v"}
        uvc = np.asarray(batch0["v"]["uvcoords_image"])
        while True:
            jit_noise = npr.standard_normal(base["image"].shape).astype(np.float32)
            yield {
                "image": jnp.asarray(base["image"] + 0.01 * jit_noise),
                "c": jnp.asarray(base["c"]),
                "v": {"uvcoords_image": jnp.asarray(uvc)},
                "uv": jnp.asarray(base["uv"]),
                "z": jnp.asarray(
                    npr.standard_normal(base["z"].shape).astype(np.float32)
                ),
            }

    series = []

    def on_step(step_idx, cur_nimg, aux):
        entry = {
            "step": int(step_idx),
            "nimg": int(cur_nimg),
            "t": round(time.time(), 2),
            "losses": {k: float(v) for k, v in aux.items()},
        }
        series.append(entry)
        print(json.dumps(entry), flush=True)

    resume_dir = None
    max_steps = 10
    if resume:
        resume_dir = os.path.join(run_dir, "snapshot-00000010")
        if not os.path.isdir(resume_dir):
            rec["error"] = f"no snapshot at {resume_dir} — run `fewshot` first"
            _save(path, out)
            return
        max_steps = 20
        it = clips()
        for _ in range(10):  # skip the replayed draws
            next(it)
    else:
        it = clips()

    t0 = time.time()
    try:
        train_fewshot(
            net, variables, it, cfg,
            lpips_fn=lambda a, b: jnp.mean(jnp.abs(a - b)),
            max_steps=max_steps,
            multiT=None,  # shipped unit: full-clip run_seq semantics
            frm_per_chunk=T,
            resume_dir=resume_dir,
            fast_no_grad="fused",
            fast_grad="pallas",
            snapshot_every=10,
            on_step=on_step,
            donate=True,
        )
        rec["wall_s"] = round(time.time() - t0, 1)
    except Exception as e:  # noqa: BLE001
        rec["error"] = f"{type(e).__name__}: {str(e)[:400]}"
    finally:
        rec["steps"] = series
        finite = [
            np.isfinite(list(s["losses"].values())).all() for s in series
        ]
        rec["finite_losses"] = bool(finite and all(finite))
        rec["n_steps"] = len(series)
        for k in ("Loss/I/loss", "Loss/I/l1", "loss", "l1"):
            s = _series_summary(series, k)
            if s is not None:
                rec.setdefault("trend", {})[k] = s
        rec["snapshots"] = sorted(
            d for d in os.listdir(run_dir) if d.startswith("snapshot-")
        ) if os.path.isdir(run_dir) else []
        _save(path, out)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "gan"
    print("backend:", jax.devices()[0].platform, jax.devices()[0].device_kind,
          flush=True)
    if mode == "gan":
        run_gan(resume=False)
    elif mode == "gan-resume":
        run_gan(resume=True)
    elif mode == "fewshot":
        run_fewshot(resume=False)
    elif mode == "fewshot-resume":
        run_fewshot(resume=True)
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
