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


def _note_finite(record, aux):
    """Fold one aux dict into record['finite_losses'].

    The flag starts as None ("nothing validated yet") and only becomes a bool
    once at least one aux dict has actually been checked — an all-failed
    config must not read `finite_losses: true` (ADVICE r4, VERDICT r4 weak-2)."""
    ok = _finite(aux)
    prev = record.get("finite_losses")
    record["finite_losses"] = ok if prev is None else (prev and ok)


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


def run_e4e(record, fast: bool = False, remat: bool = False, capture=None):
    """`capture` (a dict) switches to parity-capture mode: after exactly ONE
    update from the deterministic initial state, the encoder subtree is read
    back to host numpy into capture[path] and the warm/WD phases are skipped —
    the e4e-parity mode runs this twice (literal, then fast) and diffs the
    results on host (VERDICT r4 next-8: the 29× fast path's equivalence had
    only CPU-tiny-geometry evidence)."""
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
    record["finite_losses"] = None  # None until at least one aux dict is checked
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
        _note_finite(record, aux1)
    except Exception as e:  # noqa: BLE001
        record["grad_ireal_error"] = f"{type(e).__name__}: {str(e)[:300]}"
        return record
    try:
        c_igen, (g2, aux2) = run_prog(
            "grad_igen", P["grad_igen"], state.params, state.buffers,
            wd_state.params, batch, rng1,
        )
        record["losses"].update({k: float(v) for k, v in aux2.items()})
        _note_finite(record, aux2)
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
        _note_finite(record, wd_aux)
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

    if capture is not None:
        # one-step parity capture: the full updated encoder subtree to host
        t0 = time.time()
        flat, _ = jax.tree_util.tree_flatten_with_path(params2["encoder"])
        for path, leaf in flat:
            capture[jax.tree_util.keystr(path)] = np.asarray(leaf)
        record["capture_readback_s"] = round(time.time() - t0, 1)
        return record

    # warm full step from the compiled executables
    try:
        t0 = time.time()
        g1b, aux1b = c_ireal(params2, buffers, wd_state2.params, batch, rng2)
        g2b, aux2b = c_igen(params2, buffers, wd_state2.params, batch, rng2)
        params3, opt3 = c_upd(params2, opt2, g1b, g2b)
        jax.block_until_ready(jax.tree_util.tree_leaves(params3)[:1])
        record["step_warm_s"] = round(time.time() - t0, 2)
        _hbm(record, "step_warm")
        _note_finite(record, aux1b)
        _note_finite(record, aux2b)
    except Exception as e:  # noqa: BLE001
        record["warm_error"] = f"{type(e).__name__}: {str(e)[:300]}"
    return record


def run_oneshot(record, fast: bool = False, remat: bool = False,
                prefix: bool = False, subtree: str = "unet_encoder",
                trainable=None, opt_on_host: bool = False,
                only_ireal: bool = False):
    """`opt_on_host` keeps the masked-adam moments in HOST memory while the
    grad programs run (optimizer-state offload — the classic large-model HBM
    lever): the tex-subtree grad_igen PLAN fits in 14.75 GB
    (oneshot_B1_tex) but params (2.98 GB) + resident moments (~1.9 GB) on
    top still exhaust the 16 GB chip. The update program receives the host
    moments (jax transfers numpy args) and the new moments are read straight
    back; only params stay resident on device."""
    from invertavatar_tpu.models.encoders.uvnet import texture_out_channels_for
    from invertavatar_tpu.train.loop_inversion import (
        make_oneshot_grad_programs,
        masked_adam,
        oneshot_tex_trainable,
    )

    if trainable is None:
        trainable = oneshot_tex_trainable

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
    tx = masked_adam(1e-4, trainable)
    # per-phase split (CPU-parity-tested vs the monolith): the monolithic
    # Igen program killed the remote compile helper twice (HTTP 500 after
    # ~16 min — this file's r4 records); donate=True keeps one param set live
    fast_kw = dict(fast_igen_target="exact", fast_grad="structured") if fast else {}
    # host-opt mode pairs the moment offload with the SUBTREE-LOCAL update
    # (loop_inversion.make_oneshot_grad_programs subtree_tx): no full-tree
    # zeros reconstitution in the update program, and the frozen e4e encoder
    # can live on host during the grad programs
    sub_tx = optax.adam(1e-4) if opt_on_host else None
    step = make_oneshot_grad_programs(
        net, None, lambda a, b: jnp.mean(jnp.abs(a - b)), None,
        tx, None, weights, donate=True, remat=remat, prefix_split=prefix,
        grad_subtree=subtree, subtree_tx=sub_tx,
        **fast_kw,
    )
    record["step_impl"] = (
        "make_oneshot_grad_programs (per-phase split, donated update"
        + (", structured fast paths" if fast else "")
        + (", staged remat" if remat else "")
        + (", stop-grad prefix program" if prefix else "")
        + (f", grads over {subtree}" if subtree != "unet_encoder" else "")
        + ")"
    )
    if opt_on_host:
        # moments as host numpy (shape-traced init — never materialized on
        # device); jax transfers them per update call and the results are
        # read straight back below. The opt state is SUBTREE-LOCAL (sub_tx).
        opt_shapes = jax.eval_shape(sub_tx.init, step.train_sub(variables["params"]))
        opt0 = jax.tree_util.tree_map(
            lambda s: np.zeros(s.shape, s.dtype), opt_shapes
        )
        record["opt_on_host"] = True
        record["subtree_update"] = True
        # the frozen e4e encoder is used ONLY by the prefix program — demote
        # it to host so it is not device-resident during the grad programs
        # (0.78 GB at the flagship config; exactly the margin grad_ireal
        # missed by — oneshot_B1_ireal_hostopt OOMed on a clean heap)
        p = dict(variables["params"])
        p["encoder"] = jax.tree_util.tree_map(np.asarray, p["encoder"])
        variables = {**variables, "params": p}
        record["encoder_on_host"] = True
    else:
        opt0 = tx.init(variables["params"])
    state = TrainState(variables["params"], opt0,
                       {k: v for k, v in variables.items() if k != "params"})
    del variables, gen_vars
    def _trainable_sub(params):
        node = params
        for p in (subtree if "/" in subtree else subtree + "/texture_unet").split("/"):
            node = node[p]
        return node

    t0l = [np.asarray(x) for x in jax.tree_util.tree_leaves(_trainable_sub(state.params))[:8]]
    buffers_ref = state.buffers  # survives `del state` (frozen collections)

    P = step.programs
    record["losses"] = {}
    record["finite_losses"] = None  # None until at least one aux dict is checked
    rng1, rng2 = jax.random.PRNGKey(1), jax.random.PRNGKey(2)

    def run_prog(name, jitted, *args, **static_kw):
        compiled = _aot(record, name, jitted, *args, **static_kw)
        t0 = time.time()
        out_ = compiled(*args)
        jax.block_until_ready(jax.tree_util.tree_leaves(out_)[:1])
        record[f"{name}_s"] = round(time.time() - t0, 2)
        _hbm(record, name)
        return compiled, out_

    def do_update(compiled, params, opt, grads, aot_name=None):
        """One optimizer update; in host-opt mode the program is subtree-local
        (subtree params in/out, moments host→device→host) and the result is
        spliced back into the full tree. Returns (compiled, new_params,
        new_opt)."""
        args = (step.train_sub(params) if opt_on_host else params, opt, grads)
        if aot_name is not None:
            compiled, (new_p, new_opt) = run_prog(aot_name, P["update"], *args)
        else:
            new_p, new_opt = compiled(*args)
        if opt_on_host:
            new_opt = jax.tree_util.tree_map(np.asarray, new_opt)
            new_p = step.merge_params(params, new_p)
        return compiled, new_p, new_opt

    if only_ireal:
        # Ireal phase alone on a clean heap: the tex-host run showed grad_igen
        # + update executing but grad_ireal OOMing afterwards with ~0.2 GB of
        # arithmetic margin — this isolates whether the Ireal program fits
        # without the Igen phase's allocator churn
        record["only_ireal"] = True
        params2, opt2 = state.params, state.opt_state
        del state
        c_px = c_upd = None
        try:
            if prefix:
                c_px, px2 = run_prog(
                    "prefix_real", P["prefix"], step.enc_params(params2),
                    buffers_ref, {"image": batch["image"], "uv": batch["uv"]},
                    batch["c"], batch["v"], rng1,
                )
                c_gr, (g2, aux2) = run_prog(
                    "grad_ireal", P["grad_ireal"], step.gu_params(params2),
                    buffers_ref, None, batch, rng1, px2,
                )
                del px2
            else:
                c_gr, (g2, aux2) = run_prog(
                    "grad_ireal", P["grad_ireal"], params2, buffers_ref, None,
                    batch, rng1,
                )
            record["losses"].update({k: float(v) for k, v in aux2.items()})
            _note_finite(record, aux2)
            c_upd, params3, opt3 = do_update(None, params2, opt2, g2,
                                             aot_name="update")
            del g2, params2, opt2
        except Exception as e:  # noqa: BLE001
            record["grad_ireal_error"] = f"{type(e).__name__}: {str(e)[:300]}"
            return record
        try:
            t1l = jax.tree_util.tree_leaves(_trainable_sub(params3))[:8]
            record["trainable_params_moved"] = bool(
                any(np.abs(a - np.asarray(b)).max() > 0 for a, b in zip(t0l, t1l))
            )
        except Exception as e:  # noqa: BLE001
            record["trainable_params_moved"] = None
            record["trainable_params_moved_error"] = f"{type(e).__name__}: {str(e)[:200]}"
        # warm Ireal step from the compiled executables
        try:
            t0 = time.time()
            if prefix:
                pxw = c_px(step.enc_params(params3), buffers_ref,
                           {"image": batch["image"], "uv": batch["uv"]},
                           batch["c"], batch["v"], rng2)
                gw, auxw = c_gr(step.gu_params(params3), buffers_ref, None,
                                batch, rng2, pxw)
                del pxw
            else:
                gw, auxw = c_gr(params3, buffers_ref, None, batch, rng2)
            _, params4, _ = do_update(c_upd, params3, opt3, gw)
            jax.block_until_ready(jax.tree_util.tree_leaves(params4)[:1])
            record["ireal_step_warm_s"] = round(time.time() - t0, 2)
            _hbm(record, "ireal_step_warm")
            _note_finite(record, auxw)
        except Exception as e:  # noqa: BLE001
            record["warm_error"] = f"{type(e).__name__}: {str(e)[:300]}"
        return record

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
        _note_finite(record, aux1)
        del ws_t, gen_out, px
    except Exception as e:  # noqa: BLE001
        record["grad_igen_error"] = f"{type(e).__name__}: {str(e)[:300]}"
        return record
    try:
        c_upd, params2, opt2 = do_update(None, state.params, state.opt_state,
                                         g, aot_name="update")
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
        _note_finite(record, aux2)
        _, params3, opt3 = do_update(c_upd, params2, opt2, g2)
        del g2, params2, opt2
    except Exception as e:  # noqa: BLE001
        record["grad_ireal_error"] = f"{type(e).__name__}: {str(e)[:300]}"
        params3, opt3 = params2, opt2
    try:
        t1l = jax.tree_util.tree_leaves(_trainable_sub(params3))[:8]
        record["trainable_params_moved"] = bool(
            any(np.abs(a - np.asarray(b)).max() > 0 for a, b in zip(t0l, t1l))
        )
    except Exception as e:  # noqa: BLE001
        record["trainable_params_moved"] = None
        record["trainable_params_moved_error"] = f"{type(e).__name__}: {str(e)[:200]}"
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
        _, params4, _ = do_update(c_upd, params3, opt3, gw)
        jax.block_until_ready(jax.tree_util.tree_leaves(params4)[:1])
        record["igen_step_warm_s"] = round(time.time() - t0, 2)
        _hbm(record, "igen_step_warm")
        _note_finite(record, auxw)
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

    if mode == "e4e-parity":
        # ONE literal step and ONE fast step from byte-identical state, on
        # chip at the flagship config; the updated encoder subtrees are
        # diffed elementwise on host. VERDICT r4 next-8. Writes
        # docs/e4e_fast_vs_literal_tpu.json.
        print("== e4e fast-vs-literal one-step parity (on chip) ==", flush=True)
        parity = {"device_kind": jax.devices()[0].device_kind}
        cap_lit, cap_fast = {}, {}
        rec_l, rec_f = {}, {}
        out["configs"]["e4e_B1_parity_literal"] = rec_l
        out["configs"]["e4e_B1_parity_fast"] = rec_f
        try:
            run_e4e(rec_l, fast=False, capture=cap_lit)
        except Exception as e:  # noqa: BLE001
            rec_l["error"] = f"{type(e).__name__}: {str(e)[:300]}"
        finally:
            flush_json()
        try:
            run_e4e(rec_f, fast=True, capture=cap_fast)
        except Exception as e:  # noqa: BLE001
            rec_f["error"] = f"{type(e).__name__}: {str(e)[:300]}"
        finally:
            flush_json()
        if cap_lit and cap_fast and set(cap_lit) == set(cap_fast):
            per_leaf = {}
            worst = (None, 0.0)
            for k in cap_lit:
                a, b = cap_lit[k], cap_fast[k]
                d = float(np.abs(a - b).max())
                scale = float(np.abs(a).max()) + 1e-12
                per_leaf[k] = {"max_abs": d, "rel": d / scale}
                if d / scale > worst[1]:
                    worst = (k, d / scale)
            parity["n_leaves"] = len(per_leaf)
            parity["max_abs_delta"] = max(v["max_abs"] for v in per_leaf.values())
            parity["max_rel_delta"] = worst[1]
            parity["worst_leaf"] = worst[0]
            parity["mean_rel_delta"] = float(
                np.mean([v["rel"] for v in per_leaf.values()])
            )
            # loss-level comparison (shared keys only — the two formulations
            # emit the same aux names)
            shared = set(rec_l.get("losses", {})) & set(rec_f.get("losses", {}))
            parity["loss_deltas"] = {
                k: {
                    "literal": rec_l["losses"][k],
                    "fast": rec_f["losses"][k],
                    "abs_delta": abs(rec_l["losses"][k] - rec_f["losses"][k]),
                }
                for k in sorted(shared)
            }
            # tolerance statement: the fast path is a DOCUMENTED sampling
            # deviation (train/fast_render.py), not a bit-exact rewrite; the
            # CPU tiny-geometry parity tests bound it at rel<=2e-2 per step
            parity["tolerance"] = {
                "max_rel_delta": 0.05,
                "pass": bool(worst[1] <= 0.05),
            }
        else:
            parity["error"] = "capture incomplete (one of the runs failed)"
        ppath = os.path.join(_repo, "docs", "e4e_fast_vs_literal_tpu.json")
        with open(ppath, "w") as f:
            json.dump(parity, f, indent=2)
        print("wrote", ppath, json.dumps({k: v for k, v in parity.items()
                                          if k != "loss_deltas"}), flush=True)

    if mode == "oneshot-tex":
        # literal formulation, grads over the TEX-phase trainable subtree only
        # (unet_encoder/texture_unet — the reference's interval schedule trains
        # one unet per batch, training_loop_unet_interval.py:358-368, and this
        # validator's optimizer already masks to the texture unet). The
        # whole-unet grad program plans 16.4 GB (> 16 GB HBM,
        # oneshot_B1_prefix); the tex-phase subtree drops the frozen SFT
        # backbone chain from the backward entirely.
        print("== one-shot stage (literal, tex-phase subtree + prefix split) ==",
              flush=True)
        rec = {}
        out["configs"]["oneshot_B1_tex"] = rec
        try:
            run_oneshot(rec, prefix=True, subtree="unet_encoder/texture_unet")
        except Exception as e:  # noqa: BLE001
            rec["error"] = f"{type(e).__name__}: {str(e)[:300]}"
        finally:
            flush_json()
        print(json.dumps(rec), flush=True)

    if mode == "oneshot-tex-remat":
        # tex-phase subtree + prefix split + staged remat: the tex-subtree
        # grad_igen PLAN fits (args 2.26 + out 0.93 + temp 11.56 = 14.75 GB,
        # oneshot_B1_tex) but the program still ResourceExhausts at runtime —
        # the resident params (2.98 GB) + masked-adam moments on top exceed
        # HBM. Staged remat attacks the 11.56 GB temp (with the prefix in its
        # own program this is now the STUDENT render's working set, which
        # remat can stage — unlike r4's oneshot_B1_remat where the stop-grad
        # prefix forward dominated temp and remat moved it only 0.12 GB).
        print("== one-shot stage (literal, tex subtree + prefix + remat) ==",
              flush=True)
        rec = {}
        out["configs"]["oneshot_B1_tex_remat"] = rec
        try:
            run_oneshot(rec, prefix=True, remat=True,
                        subtree="unet_encoder/texture_unet")
        except Exception as e:  # noqa: BLE001
            rec["error"] = f"{type(e).__name__}: {str(e)[:300]}"
        finally:
            flush_json()
        print(json.dumps(rec), flush=True)

    if mode == "oneshot-tex-host":
        # tex subtree + prefix split + OPTIMIZER-STATE HOST OFFLOAD: frees the
        # ~1.9 GB of masked-adam moments from HBM while the grad programs run
        # (the oneshot_B1_tex plan fits; the resident moments are what's left)
        print("== one-shot stage (literal, tex subtree + prefix + host-opt) ==",
              flush=True)
        rec = {}
        out["configs"]["oneshot_B1_tex_hostopt"] = rec
        try:
            # remat=True both for the extra temp margin (11.28 vs 11.56 GB)
            # and to reuse the oneshot_B1_tex_remat compile-cache entries
            run_oneshot(rec, prefix=True, remat=True,
                        subtree="unet_encoder/texture_unet",
                        opt_on_host=True)
        except Exception as e:  # noqa: BLE001
            rec["error"] = f"{type(e).__name__}: {str(e)[:300]}"
        finally:
            flush_json()
        print(json.dumps(rec), flush=True)

    if mode == "oneshot-ireal-host":
        # the Ireal phase ALONE on a clean heap (tex subtree + prefix + remat
        # + host-opt): isolates the oneshot_B1_tex_hostopt finding that
        # grad_igen+update execute but grad_ireal OOMs after the Igen churn
        print("== one-shot stage (literal Ireal only, tex+prefix+remat+host-opt) ==",
              flush=True)
        rec = {}
        out["configs"]["oneshot_B1_ireal_hostopt"] = rec
        try:
            run_oneshot(rec, prefix=True, remat=True,
                        subtree="unet_encoder/texture_unet",
                        opt_on_host=True, only_ireal=True)
        except Exception as e:  # noqa: BLE001
            rec["error"] = f"{type(e).__name__}: {str(e)[:300]}"
        finally:
            flush_json()
        print(json.dumps(rec), flush=True)

    if mode == "oneshot-tri":
        # literal formulation, TRI-phase subtree (unet_encoder/triplane_unet):
        # grads flow through the SFT backbone (the expensive chain) but the
        # texture unet backward drops out. Uses the tri-phase optimizer mask.
        from invertavatar_tpu.train.loop_inversion import oneshot_tri_trainable

        print("== one-shot stage (literal, tri-phase subtree + prefix split) ==",
              flush=True)
        rec = {}
        out["configs"]["oneshot_B1_tri"] = rec
        try:
            run_oneshot(rec, prefix=True, subtree="unet_encoder/triplane_unet",
                        trainable=oneshot_tri_trainable)
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
