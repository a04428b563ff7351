"""Record real-TPU executions of the e4e and one-shot inversion train steps.

Companion to scripts/validate_fewshot_tpu.py (VERDICT r2 #1 asks for all three
inversion stages: "one few-shot (and one-shot/e4e) step demonstrably compiles
and executes on the real chip"). Both stages run at the flagship generator
config, B=1/chip (the reference trains e4e at 32/8 GPUs = 4/device and
one-shot at 16/8 = 2/device; B=1 exercises the identical program structure).
Writes docs/train_tpu_run.json.

Usage: python scripts/validate_train_tpu.py [e4e|oneshot|all]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_repo, ".jax_cache"))
sys.path.insert(0, os.path.join(_repo, "scripts"))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from invertavatar_tpu.models.encoders.uvnet import InversionNet
from invertavatar_tpu.train.dryrun import _fake_batch
from invertavatar_tpu.train.inversion import InversionLossWeights
from invertavatar_tpu.train.state import TrainState
from invertavatar_tpu.flagship import init_by_shape
from validate_fewshot_tpu import FLAGSHIP_RENDERING_KWARGS

GEN_CFG = dict(
    z_dim=512, c_dim=25, w_dim=512, img_resolution=512, img_channels=3,
    rendering_kwargs=dict(FLAGSHIP_RENDERING_KWARGS),
    neural_rendering_resolution=128, channel_base=32768, channel_max=512,
    map_num_layers=2,
)


def _finite(aux):
    return all(np.isfinite(float(v)) for v in aux.values())


def _hbm(record, name):
    try:
        ms = jax.devices()[0].memory_stats() or {}
        if "bytes_in_use" in ms:
            record[f"{name}_hbm_gb"] = round(ms["bytes_in_use"] / 2**30, 2)
            if "peak_bytes_in_use" in ms:
                record[f"{name}_hbm_peak_gb"] = round(ms["peak_bytes_in_use"] / 2**30, 2)
    except Exception:  # noqa: BLE001 — telemetry only
        pass


def run_e4e(record):
    from invertavatar_tpu.models.encoders.e4e import LatentCodesDiscriminator
    from invertavatar_tpu.train.loop_inversion import (
        e4e_trainable,
        make_e4e_grad_programs,
        masked_adam,
    )

    net = InversionNet(generator_cfg=GEN_CFG)
    rng = jax.random.PRNGKey(0)
    rngs = {"params": rng, "buffers": jax.random.fold_in(rng, 1),
            "noise": jax.random.fold_in(rng, 2), "ray": jax.random.fold_in(rng, 3)}
    raw = _fake_batch(np.random.RandomState(0), batch=1, res=512, z_dim=512)
    batch = {
        "image": jnp.asarray(raw["image"]),
        "c": jnp.asarray(raw["c"]),
        "v": {"uvcoords_image": jnp.asarray(raw["v"]["uvcoords_image"])},
        "z": jnp.asarray(raw["z"]),
    }
    t0 = time.time()
    enc_vars = init_by_shape(
        lambda: net.init(rngs, jnp.zeros((1, 256, 256, 3)), method=lambda m, x: m.encode(x))
    )
    gen_vars = init_by_shape(
        lambda: net.init(rngs, batch["z"], batch["c"], batch["v"],
                         method=lambda m, z, cc, v: m.generator(z, cc, v))
    )
    params = dict(enc_vars["params"])
    params["generator"] = gen_vars["params"]["generator"]
    buffers = {
        "buffers": {
            **{k: v for k, v in enc_vars.get("buffers", {}).items()},
            "generator": gen_vars["buffers"]["generator"],
        }
    }
    if "batch_stats" in enc_vars:
        buffers["batch_stats"] = enc_vars["batch_stats"]
    record["init_s"] = round(time.time() - t0, 1)

    # shipped train_e4e_real.yaml semantics; LPIPS/ID off (no pretrained
    # weights in this image — recorded), w_discriminator on
    weights = InversionLossWeights(l1=1.0, lpips=0.0, id=0.0, w_delta=0.001,
                                   w_regular=0.0, w_discriminator=0.01,
                                   raw_l1=1.0, tri=0.001)
    tx = masked_adam(1e-4, e4e_trainable)
    wd = LatentCodesDiscriminator()
    wd_tx = optax.adam(2e-5)
    # per-phase grad programs: the monolithic step (Ireal+Igen+WD in one XLA
    # program) ResourceExhausted the 16 GB v5e at this config — r4 run 1
    step = make_e4e_grad_programs(net, wd, lambda a, b: jnp.mean(jnp.abs(a - b)), None,
                                  tx, wd_tx, weights, donate=True)
    record["step_impl"] = "make_e4e_grad_programs (per-phase HBM split)"
    state = TrainState(params, tx.init(params), buffers)
    wd_vars = wd.init(jax.random.PRNGKey(1), jnp.zeros((1, 512)))
    wd_state = TrainState(wd_vars["params"], wd_tx.init(wd_vars["params"]), {})
    # donation invalidates state.params after step1 — snapshot to host first
    e0 = [np.asarray(x) for x in jax.tree_util.tree_leaves(state.params["encoder"])[:8]]

    t0 = time.time()
    s1, wd1, aux1 = step(state, wd_state, batch, jax.random.PRNGKey(2), do_wd_reg=True)
    jax.block_until_ready(jax.tree_util.tree_leaves(s1.params)[0])
    record["step1_s"] = round(time.time() - t0, 1)
    _hbm(record, "step1")
    del state
    # read the losses BEFORE dispatching step 2 — the r4 run lost them to a
    # ResourceExhausted during post-step2 readback (docs/train_tpu_run.json)
    record["losses"] = {k: float(v) for k, v in aux1.items()}
    record["finite_losses"] = _finite(aux1)
    t0 = time.time()
    s2, wd2, aux2 = step(s1, wd1, batch, jax.random.PRNGKey(3), do_wd_reg=False)
    jax.block_until_ready(jax.tree_util.tree_leaves(s2.params)[0])
    record["step2_warm_s"] = round(time.time() - t0, 2)
    _hbm(record, "step2")
    record["finite_losses"] = record["finite_losses"] and _finite(aux2)
    try:
        e1 = jax.tree_util.tree_leaves(s2.params["encoder"])[:8]
        record["encoder_params_moved"] = bool(
            any(np.abs(a - np.asarray(b)).max() > 0 for a, b in zip(e0, e1))
        )
    except Exception as e:  # noqa: BLE001 — a readback failure must not void the run
        record["encoder_params_moved"] = None
        record["encoder_params_moved_error"] = f"{type(e).__name__}: {str(e)[:200]}"
    return record


def run_oneshot(record):
    from invertavatar_tpu.models.encoders.uvnet import texture_out_channels_for
    from invertavatar_tpu.train.loop_inversion import (
        make_oneshot_grad_programs,
        masked_adam,
        oneshot_tex_trainable,
    )

    net = InversionNet(
        generator_cfg=GEN_CFG, unet_type="segformer",
        texture_out_channels=texture_out_channels_for(32768, 512),
    )
    rng = jax.random.PRNGKey(0)
    rngs = {"params": rng, "buffers": jax.random.fold_in(rng, 1),
            "noise": jax.random.fold_in(rng, 2), "ray": jax.random.fold_in(rng, 3)}
    raw = _fake_batch(np.random.RandomState(0), batch=1, res=512, z_dim=512)
    batch = {
        "image": jnp.asarray(raw["image"]),
        "c": jnp.asarray(raw["c"]),
        "v": {"uvcoords_image": jnp.asarray(raw["v"]["uvcoords_image"])},
        "uv": jnp.zeros((1, 256, 256, 6), jnp.float32),
        "z": jnp.asarray(raw["z"]),
        "gen_uv": jnp.zeros((1, 256, 256, 6), jnp.float32),
    }
    x = {"image": batch["image"], "uv": batch["uv"]}
    t0 = time.time()
    variables = init_by_shape(
        lambda: net.init(rngs, x, batch["c"], batch["v"], method=lambda m, x, c, v: m(x, c, v))
    )
    gen_vars = init_by_shape(
        lambda: net.init(rngs, batch["z"], batch["c"], batch["v"],
                         method=lambda m, z, cc, v: m.generator(z, cc, v))
    )
    variables = dict(variables)
    variables["params"] = dict(variables["params"])
    variables["params"]["generator"] = dict(variables["params"]["generator"])
    variables["params"]["generator"]["backbone"] = gen_vars["params"]["generator"]["backbone"]
    variables["buffers"] = dict(variables["buffers"])
    variables["buffers"]["generator"] = gen_vars["buffers"]["generator"]
    record["init_s"] = round(time.time() - t0, 1)

    # adv=0: the D phases' program structure is covered by the few-shot D step
    # and CPU tests; keeping the Igen/Ireal programs to the I-side bounds the
    # peak-HBM question this script answers to the training forward+backward
    weights = InversionLossWeights(l1=1.0, lpips=0.0, id=0.0, raw_l1=1.0,
                                   tri=0.001, texture=0.001, adv=0.0)
    tx = masked_adam(1e-4, oneshot_tex_trainable)
    # per-phase split (CPU-parity-tested vs the monolith): the monolithic
    # Igen program killed the remote compile helper twice (HTTP 500 after
    # ~16 min — this file's r4 records); donate=True keeps one param set live
    step = make_oneshot_grad_programs(
        net, None, lambda a, b: jnp.mean(jnp.abs(a - b)), None,
        tx, None, weights, donate=True,
    )
    record["step_impl"] = "make_oneshot_grad_programs (per-phase split, donated update)"
    state = TrainState(variables["params"], tx.init(variables["params"]),
                       {k: v for k, v in variables.items() if k != "params"})
    del variables, gen_vars
    t0l = [np.asarray(x) for x in
           jax.tree_util.tree_leaves(state.params["unet_encoder"]["texture_unet"])[:8]]

    t0 = time.time()
    s1, _, aux1 = step(state, None, batch, jax.random.PRNGKey(1), phase="Igen")
    jax.block_until_ready(jax.tree_util.tree_leaves(s1.params)[0])
    record["igen_step1_s"] = round(time.time() - t0, 1)
    _hbm(record, "igen_step1")
    del state
    record["losses"] = {k: float(v) for k, v in aux1.items()}
    record["finite_losses"] = _finite(aux1)
    t0 = time.time()
    s2, _, aux2 = step(s1, None, batch, jax.random.PRNGKey(2), phase="Ireal")
    jax.block_until_ready(jax.tree_util.tree_leaves(s2.params)[0])
    record["ireal_step1_s"] = round(time.time() - t0, 1)
    _hbm(record, "ireal_step1")
    del s1
    record["losses"].update({k: float(v) for k, v in aux2.items()})
    record["finite_losses"] = record["finite_losses"] and _finite(aux2)
    t0 = time.time()
    s3, _, aux3 = step(s2, None, batch, jax.random.PRNGKey(3), phase="Igen")
    jax.block_until_ready(jax.tree_util.tree_leaves(s3.params)[0])
    record["igen_step2_warm_s"] = round(time.time() - t0, 2)
    _hbm(record, "igen_step2")
    del s2
    record["finite_losses"] = record["finite_losses"] and _finite(aux3)
    try:
        t1l = jax.tree_util.tree_leaves(s3.params["unet_encoder"]["texture_unet"])[:8]
        record["texture_unet_moved"] = bool(
            any(np.abs(a - np.asarray(b)).max() > 0 for a, b in zip(t0l, t1l))
        )
    except Exception as e:  # noqa: BLE001
        record["texture_unet_moved"] = None
        record["texture_unet_moved_error"] = f"{type(e).__name__}: {str(e)[:200]}"
    return record


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    out = {
        "backend": jax.devices()[0].platform,
        "device_kind": jax.devices()[0].device_kind,
        "generator": "flagship (512^2 out, 128^2 neural render, 48+48 samples, ch 32768/512)",
        "batch_per_chip": 1,
        "note": "LPIPS/ArcFace terms disabled (no pretrained weights in this image); "
                "shipped YAMLs set lpips=1.0/id=0.1 — same program structure, "
                "different leaf weights.",
        "configs": {},
    }
    print("backend:", out["backend"], out["device_kind"], flush=True)

    path = os.path.join(_repo, "docs", "train_tpu_run.json")
    if os.path.exists(path):
        try:
            with open(path) as f:
                out["configs"] = json.load(f).get("configs", {})
        except Exception:  # noqa: BLE001 — a truncated file must not block a rerun
            pass

    def flush_json():
        with open(path, "w") as f:
            json.dump(out, f, indent=2)
        print("wrote", path, flush=True)

    # each stage flushes on completion AND on failure so a timeout/OOM in a
    # later stage never loses an earlier stage's record (lesson from the
    # round-3 runs that died holding everything in memory)
    if mode in ("all", "e4e"):
        print("== e4e stage: B=1 Ireal+Igen+WD one step ==", flush=True)
        rec = {}
        out["configs"]["e4e_B1"] = rec
        try:
            run_e4e(rec)
        except Exception as e:  # noqa: BLE001
            rec["error"] = f"{type(e).__name__}: {str(e)[:300]}"
        finally:
            flush_json()
        print(json.dumps(rec), flush=True)

    if mode in ("all", "oneshot"):
        print("== one-shot stage: B=1 Igen / Ireal steps ==", flush=True)
        rec = {}
        out["configs"]["oneshot_B1"] = rec
        try:
            run_oneshot(rec)
        except Exception as e:  # noqa: BLE001
            rec["error"] = f"{type(e).__name__}: {str(e)[:300]}"
        finally:
            flush_json()
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
