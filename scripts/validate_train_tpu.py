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


def _mem_analysis(record, name, compiled):
    """XLA compile-time memory plan (what the program will ask the HBM
    allocator for) — distinguishes 'this program cannot fit' from 'the live
    buffers around it tipped it over'."""
    try:
        ma = compiled.memory_analysis()
        record[f"{name}_mem_gb"] = {
            "args": round(ma.argument_size_in_bytes / 2**30, 3),
            "out": round(ma.output_size_in_bytes / 2**30, 3),
            "temp": round(ma.temp_size_in_bytes / 2**30, 3),
            "alias": round(ma.alias_size_in_bytes / 2**30, 3),
        }
    except Exception:  # noqa: BLE001 — telemetry only
        pass


def _aot(record, name, jitted, *args, **kwargs):
    """Lower+compile one program, recording compile wall time and the XLA
    memory plan; returns the compiled executable."""
    t0 = time.time()
    compiled = jitted.lower(*args, **kwargs).compile()
    record[f"{name}_compile_s"] = round(time.time() - t0, 1)
    _mem_analysis(record, name, compiled)
    return compiled


def run_e4e(record, fast: bool = False, remat: bool = False):
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
    # program) ResourceExhausted the 16 GB v5e at this config — r4 run 1.
    # Driven per-program here (step.programs) with AOT compile + XLA memory
    # analysis so one program's OOM doesn't void the earlier evidence and the
    # failing program's memory plan gets recorded.
    fast_kw = dict(fast_igen_target="exact", fast_grad="structured") if fast else {}
    step = make_e4e_grad_programs(net, wd, lambda a, b: jnp.mean(jnp.abs(a - b)), None,
                                  tx, wd_tx, weights, donate=True, remat=remat,
                                  **fast_kw)
    record["step_impl"] = (
        "make_e4e_grad_programs (per-phase HBM split"
        + (", structured fast paths" if fast else "")
        + (", staged remat" if remat else "")
        + ")"
    )
    state = TrainState(params, tx.init(params), buffers)
    wd_vars = wd.init(jax.random.PRNGKey(1), jnp.zeros((1, 512)))
    wd_state = TrainState(wd_vars["params"], wd_tx.init(wd_vars["params"]), {})
    # donation invalidates state.params after update — snapshot to host first
    e0 = [np.asarray(x) for x in jax.tree_util.tree_leaves(state.params["encoder"])[:8]]

    P = step.programs
    record["losses"] = {}
    record["finite_losses"] = True
    rng1, rng2 = jax.random.PRNGKey(2), jax.random.PRNGKey(3)

    def run_prog(name, jitted, *args, **static_kw):
        # static_kw are jit static args — baked into the lowering, not passed
        # at execution time
        compiled = _aot(record, name, jitted, *args, **static_kw)
        t0 = time.time()
        out = compiled(*args)
        jax.block_until_ready([x for x in jax.tree_util.tree_leaves(out)][:1])
        record[f"{name}_s"] = round(time.time() - t0, 2)
        _hbm(record, name)
        return compiled, out

    # cold pass, one program at a time
    try:
        c_ireal, (g1, aux1) = run_prog(
            "grad_ireal", P["grad_ireal"], state.params, state.buffers,
            wd_state.params, batch, rng1,
        )
        record["losses"].update({k: float(v) for k, v in aux1.items()})
        record["finite_losses"] = record["finite_losses"] and _finite(aux1)
    except Exception as e:  # noqa: BLE001
        record["grad_ireal_error"] = f"{type(e).__name__}: {str(e)[:300]}"
        return record
    try:
        c_igen, (g2, aux2) = run_prog(
            "grad_igen", P["grad_igen"], state.params, state.buffers,
            wd_state.params, batch, rng1,
        )
        record["losses"].update({k: float(v) for k, v in aux2.items()})
        record["finite_losses"] = record["finite_losses"] and _finite(aux2)
    except Exception as e:  # noqa: BLE001
        record["grad_igen_error"] = f"{type(e).__name__}: {str(e)[:300]}"
        return record
    try:
        c_upd, (params2, opt2) = run_prog(
            "update", P["update"], state.params, state.opt_state, g1, g2,
        )
        del g1, g2, state
    except Exception as e:  # noqa: BLE001
        record["update_error"] = f"{type(e).__name__}: {str(e)[:300]}"
        return record
    try:
        _, (wd_state2, wd_aux) = run_prog(
            "wd_step", P["wd_step"], params2, buffers, wd_state, batch, rng1,
            do_wd_reg=True,
        )
        record["losses"].update({k: float(v) for k, v in wd_aux.items()})
        record["finite_losses"] = record["finite_losses"] and _finite(wd_aux)
    except Exception as e:  # noqa: BLE001
        record["wd_step_error"] = f"{type(e).__name__}: {str(e)[:300]}"
        wd_state2 = wd_state
    try:
        e1 = jax.tree_util.tree_leaves(params2["encoder"])[:8]
        record["encoder_params_moved"] = bool(
            any(np.abs(a - np.asarray(b)).max() > 0 for a, b in zip(e0, e1))
        )
    except Exception as e:  # noqa: BLE001 — a readback failure must not void the run
        record["encoder_params_moved"] = None
        record["encoder_params_moved_error"] = f"{type(e).__name__}: {str(e)[:200]}"

    # warm full step from the compiled executables
    try:
        t0 = time.time()
        g1b, aux1b = c_ireal(params2, buffers, wd_state2.params, batch, rng2)
        g2b, aux2b = c_igen(params2, buffers, wd_state2.params, batch, rng2)
        params3, opt3 = c_upd(params2, opt2, g1b, g2b)
        jax.block_until_ready(jax.tree_util.tree_leaves(params3)[:1])
        record["step_warm_s"] = round(time.time() - t0, 2)
        _hbm(record, "step_warm")
        record["finite_losses"] = (
            record["finite_losses"] and _finite(aux1b) and _finite(aux2b)
        )
    except Exception as e:  # noqa: BLE001
        record["warm_error"] = f"{type(e).__name__}: {str(e)[:300]}"
    return record


def run_oneshot(record, fast: bool = False, remat: bool = False,
                prefix: bool = False):
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
    fast_kw = dict(fast_igen_target="exact", fast_grad="structured") if fast else {}
    step = make_oneshot_grad_programs(
        net, None, lambda a, b: jnp.mean(jnp.abs(a - b)), None,
        tx, None, weights, donate=True, remat=remat, prefix_split=prefix,
        **fast_kw,
    )
    record["step_impl"] = (
        "make_oneshot_grad_programs (per-phase split, donated update"
        + (", structured fast paths" if fast else "")
        + (", staged remat" if remat else "")
        + (", stop-grad prefix program" if prefix else "")
        + ")"
    )
    state = TrainState(variables["params"], tx.init(variables["params"]),
                       {k: v for k, v in variables.items() if k != "params"})
    del variables, gen_vars
    t0l = [np.asarray(x) for x in
           jax.tree_util.tree_leaves(state.params["unet_encoder"]["texture_unet"])[:8]]
    buffers_ref = state.buffers  # survives `del state` (frozen collections)

    P = step.programs
    record["losses"] = {}
    record["finite_losses"] = True
    rng1, rng2 = jax.random.PRNGKey(1), jax.random.PRNGKey(2)

    def run_prog(name, jitted, *args, **static_kw):
        compiled = _aot(record, name, jitted, *args, **static_kw)
        t0 = time.time()
        out_ = compiled(*args)
        jax.block_until_ready(jax.tree_util.tree_leaves(out_)[:1])
        record[f"{name}_s"] = round(time.time() - t0, 2)
        _hbm(record, name)
        return compiled, out_

    # Igen cold: targets (no-grad render) -> student fwd+bwd -> update
    try:
        c_tgt, (ws_t, gen_out) = run_prog(
            "igen_targets", P["igen_targets"], state.params, state.buffers,
            batch["z"], batch["c"], batch["v"], rng1,
        )
    except Exception as e:  # noqa: BLE001
        record["igen_targets_error"] = f"{type(e).__name__}: {str(e)[:300]}"
        return record
    px = c_px = None
    if prefix:
        try:
            c_px, px = run_prog(
                "prefix", P["prefix"], step.enc_params(state.params),
                state.buffers,
                {"image": gen_out["image"], "uv": batch["gen_uv"]},
                batch["c"], batch["v"], rng1,
            )
        except Exception as e:  # noqa: BLE001
            record["prefix_error"] = f"{type(e).__name__}: {str(e)[:300]}"
            return record
    try:
        if prefix:
            c_gi, (g, aux1) = run_prog(
                "grad_igen", P["grad_igen"], step.gu_params(state.params),
                state.buffers, None, ws_t, gen_out, batch, rng1, px,
            )
        else:
            c_gi, (g, aux1) = run_prog(
                "grad_igen", P["grad_igen"], state.params, state.buffers, None,
                ws_t, gen_out, batch, rng1,
            )
        record["losses"].update({k: float(v) for k, v in aux1.items()})
        record["finite_losses"] = record["finite_losses"] and _finite(aux1)
        del ws_t, gen_out, px
    except Exception as e:  # noqa: BLE001
        record["grad_igen_error"] = f"{type(e).__name__}: {str(e)[:300]}"
        return record
    try:
        c_upd, (params2, opt2) = run_prog(
            "update", P["update"], state.params, state.opt_state, g,
        )
        del g, state
    except Exception as e:  # noqa: BLE001
        record["update_error"] = f"{type(e).__name__}: {str(e)[:300]}"
        return record
    # Ireal cold
    try:
        if prefix:
            x_real = {"image": batch["image"], "uv": batch["uv"]}
            px2 = c_px(step.enc_params(params2), buffers_ref, x_real,
                       batch["c"], batch["v"], rng1)
            c_gr, (g2, aux2) = run_prog(
                "grad_ireal", P["grad_ireal"], step.gu_params(params2),
                buffers_ref, None, batch, rng1, px2,
            )
            del px2
        else:
            c_gr, (g2, aux2) = run_prog(
                "grad_ireal", P["grad_ireal"], params2, buffers_ref, None, batch, rng1,
            )
        record["losses"].update({k: float(v) for k, v in aux2.items()})
        record["finite_losses"] = record["finite_losses"] and _finite(aux2)
        params3, opt3 = c_upd(params2, opt2, g2)
        del g2, params2, opt2
    except Exception as e:  # noqa: BLE001
        record["grad_ireal_error"] = f"{type(e).__name__}: {str(e)[:300]}"
        params3, opt3 = params2, opt2
    try:
        t1l = jax.tree_util.tree_leaves(params3["unet_encoder"]["texture_unet"])[:8]
        record["texture_unet_moved"] = bool(
            any(np.abs(a - np.asarray(b)).max() > 0 for a, b in zip(t0l, t1l))
        )
    except Exception as e:  # noqa: BLE001
        record["texture_unet_moved"] = None
        record["texture_unet_moved_error"] = f"{type(e).__name__}: {str(e)[:200]}"
    # warm Igen step from compiled executables
    try:
        t0 = time.time()
        ws_t, gen_out = c_tgt(params3, buffers_ref, batch["z"], batch["c"],
                              batch["v"], rng2)
        if prefix:
            pxw = c_px(step.enc_params(params3), buffers_ref,
                       {"image": gen_out["image"], "uv": batch["gen_uv"]},
                       batch["c"], batch["v"], rng2)
            gw, auxw = c_gi(step.gu_params(params3), buffers_ref, None,
                            ws_t, gen_out, batch, rng2, pxw)
        else:
            gw, auxw = c_gi(params3, buffers_ref, None, ws_t, gen_out, batch, rng2)
        params4, _ = c_upd(params3, opt3, gw)
        jax.block_until_ready(jax.tree_util.tree_leaves(params4)[:1])
        record["igen_step_warm_s"] = round(time.time() - t0, 2)
        _hbm(record, "igen_step_warm")
        record["finite_losses"] = record["finite_losses"] and _finite(auxw)
    except Exception as e:  # noqa: BLE001
        record["warm_error"] = f"{type(e).__name__}: {str(e)[:300]}"
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

    if mode == "e4e-fast":
        # structured fast paths (train/fast_render.py): exact windowed Igen
        # target + structured grad sampling — the documented-deviation config
        # for when the literal formulation is HBM-marginal on a 16 GB chip
        print("== e4e stage (structured fast paths) ==", flush=True)
        rec = {}
        out["configs"]["e4e_B1_fast"] = rec
        try:
            run_e4e(rec, fast=True)
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

    if mode == "e4e-subtree":
        # literal formulation, grads over the encoder subtree only (the HBM
        # plan's cheap half — no recompute); distinct key so the battery-5
        # full-tree OOM record (e4e_B1) stays as the memory-plan evidence
        print("== e4e stage (literal, encoder-subtree grads) ==", flush=True)
        rec = {}
        out["configs"]["e4e_B1_subtree"] = rec
        try:
            run_e4e(rec)
        except Exception as e:  # noqa: BLE001
            rec["error"] = f"{type(e).__name__}: {str(e)[:300]}"
        finally:
            flush_json()
        print(json.dumps(rec), flush=True)

    if mode == "oneshot-subtree":
        print("== one-shot stage (literal, unet-subtree grads) ==", flush=True)
        rec = {}
        out["configs"]["oneshot_B1_subtree"] = rec
        try:
            run_oneshot(rec)
        except Exception as e:  # noqa: BLE001
            rec["error"] = f"{type(e).__name__}: {str(e)[:300]}"
        finally:
            flush_json()
        print(json.dumps(rec), flush=True)

    if mode == "e4e-remat":
        # staged remat, literal formulation/sampling — the exact-math HBM plan
        print("== e4e stage (staged remat, literal formulation) ==", flush=True)
        rec = {}
        out["configs"]["e4e_B1_remat"] = rec
        try:
            run_e4e(rec, remat=True)
        except Exception as e:  # noqa: BLE001
            rec["error"] = f"{type(e).__name__}: {str(e)[:300]}"
        finally:
            flush_json()
        print(json.dumps(rec), flush=True)

    if mode == "oneshot-remat":
        print("== one-shot stage (staged remat, literal formulation) ==", flush=True)
        rec = {}
        out["configs"]["oneshot_B1_remat"] = rec
        try:
            run_oneshot(rec, remat=True)
        except Exception as e:  # noqa: BLE001
            rec["error"] = f"{type(e).__name__}: {str(e)[:300]}"
        finally:
            flush_json()
        print(json.dumps(rec), flush=True)

    if mode == "oneshot-prefix":
        # literal formulation with the stop-grad prefix in its own program:
        # the HBM plan's third stage — subtree grads and remat both left the
        # grad_igen plan at ~17 GB because its 12 GB temp is the PREFIX
        # render's forward working set (oneshot_B1_subtree / oneshot_B1_remat)
        print("== one-shot stage (literal, prefix-split + unet-subtree grads) ==",
              flush=True)
        rec = {}
        out["configs"]["oneshot_B1_prefix"] = rec
        try:
            run_oneshot(rec, prefix=True)
        except Exception as e:  # noqa: BLE001
            rec["error"] = f"{type(e).__name__}: {str(e)[:300]}"
        finally:
            flush_json()
        print(json.dumps(rec), flush=True)

    if mode == "oneshot-fast":
        print("== one-shot stage (structured fast paths) ==", flush=True)
        rec = {}
        out["configs"]["oneshot_B1_fast"] = rec
        try:
            run_oneshot(rec, fast=True)
        except Exception as e:  # noqa: BLE001
            rec["error"] = f"{type(e).__name__}: {str(e)[:300]}"
        finally:
            flush_json()
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
