"""Record a real-TPU execution of the few-shot inversion training step.

VERDICT r2 #1 done-criterion: "a recorded TPU run (script + JSON/log in docs/)
of one few-shot step at a stated config with finite losses and step/compile
wall times". This script runs the program-split step (train/loop_inversion.py
FewshotPrograms) on whatever backend jax picks (the axon TPU on this box) at
the FLAGSHIP generator config and writes docs/fewshot_tpu_run.json.

Configs exercised:
  * shipped few-shot unit (config/train_textureUnet_video.yaml: multiT off,
    frm_per_vid 4 → run_seq semantics): B=1, T=4, one Ireal + one Igen step.
  * multi-T curriculum probe: B=1, T=12, frm_per_chunk=6 (2 chunks, carried
    GRU state), one Ireal step on the [0]+random frame subset.

Loss weights follow the shipped YAML except the LPIPS terms (lpips 1.0,
lr_lpips 1.0 there) which require pretrained AlexNet weights that do not
exist in this image — recorded as disabled in the JSON.

Usage: python scripts/validate_fewshot_tpu.py [--multiT-only|--plain-only]
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
import optax

from invertavatar_tpu.models.encoders.uvnet import InversionNet
from invertavatar_tpu.train.dryrun import _fake_batch
from invertavatar_tpu.train.inversion import InversionLossWeights
from invertavatar_tpu.train.loop_inversion import (
    make_fewshot_train_step,
    masked_adam,
    unet_decoder_trainable,
)
from invertavatar_tpu.train.state import TrainState

# flagship generator config (models/flagship.py geometry, triplane_v20.py:28-63)
FLAGSHIP_RENDERING_KWARGS = {
    "image_resolution": 512,
    "disparity_space_sampling": False,
    "clamp_mode": "softplus",
    "superresolution_module": "invertavatar_tpu.models.superresolution.SuperresolutionHybrid8XDC",
    "c_gen_conditioning_zero": False,
    "c_scale": 1.0,
    "superresolution_noise_mode": "random",
    "density_reg": 0.25,
    "density_reg_p_dist": 0.004,
    "reg_type": "l1",
    "decoder_lr_mul": 1.0,
    "sr_antialias": True,
    "depth_resolution": 48,
    "depth_resolution_importance": 48,
    "box_warp": 1.0,
    "gpc_reg_prob": 0.5,
}


def build(T: int):
    gen_cfg = dict(
        z_dim=512, c_dim=25, w_dim=512, img_resolution=512, img_channels=3,
        rendering_kwargs=dict(FLAGSHIP_RENDERING_KWARGS),
        neural_rendering_resolution=128, channel_base=32768, channel_max=512,
        map_num_layers=2,
    )
    net = InversionNet(generator_cfg=gen_cfg)
    rng = jax.random.PRNGKey(0)
    rngs = {"params": rng, "buffers": jax.random.fold_in(rng, 1),
            "noise": jax.random.fold_in(rng, 2), "ray": jax.random.fold_in(rng, 3)}
    raw = _fake_batch(np.random.RandomState(0), batch=1, res=512, z_dim=512)
    imgs = np.tile(raw["image"][:, None], (1, T, 1, 1, 1)).astype(np.float32)
    for t in range(T):
        imgs[:, t] += 0.05 * np.sin(t + 1.0)
    uvc = jnp.tile(jnp.asarray(raw["v"]["uvcoords_image"])[:, None], (1, T, 1, 1, 1))
    batch = {
        "image": jnp.asarray(imgs),
        "c": jnp.tile(jnp.asarray(raw["c"])[:, None], (1, T, 1)),
        "v": {"uvcoords_image": uvc},
        "uv": jnp.zeros((1, T, 256, 256, 6), jnp.float32),
        "z": jnp.asarray(raw["z"]),
    }
    t0 = time.time()
    # shape-traced init (no eager dispatch through the axon relay — an eager
    # flax init of the flagship net is thousands of ops at ~1 RTT each)
    from invertavatar_tpu.flagship import init_by_shape

    variables = init_by_shape(
        lambda: net.init(
            rngs, batch["image"][:, :1], batch["c"][:, :1],
            {"uvcoords_image": uvc[:, :1]}, batch["uv"][:, :1], None,
            method=lambda m, f, c, v, uv, ws: m.run_seq(f, c, v, uv, ws=ws),
        )
    )
    gen_vars = init_by_shape(
        lambda: net.init(
            rngs, batch["z"], batch["c"][:, 0], {"uvcoords_image": uvc[:, 0]},
            method=lambda m, z, cc, v: m.generator(z, cc, v),
        )
    )
    variables = dict(variables)
    variables["params"] = dict(variables["params"])
    variables["params"]["generator"] = dict(variables["params"]["generator"])
    variables["params"]["generator"]["backbone"] = gen_vars["params"]["generator"]["backbone"]
    variables["buffers"] = dict(variables["buffers"])
    variables["buffers"]["generator"] = gen_vars["buffers"]["generator"]
    init_s = time.time() - t0
    return net, variables, batch, init_s


def run_stage(net, holder, batch, multiT: bool, frm_per_chunk: int, record: dict,
              fast: bool = False):
    """`holder` is a single-key dict {'v': variables}; ownership transfers —
    the entry is popped so the update program's donated old params are truly
    dead (r4 run 1: the caller's live `variables` binding kept a second
    flagship param set in HBM and Igen hit ResourceExhausted).

    `fast=True` measures the structured fast-path step (train/fast_render.py:
    fused no-grad renders + custom-VJP Pallas grad sampling) — the documented
    TPU-first sampling deviation, CPU-parity-tested in
    tests/test_loop_inversion.py."""
    variables = holder.pop("v")
    weights = InversionLossWeights(l1=1.0, lpips=0.0, id=0.0, raw_l1=1.0, tri=0.001,
                                   lr_lpips=0.0, mouth=0.0, adv=0.0)
    tx = masked_adam(2.5e-5, unet_decoder_trainable, b1=0.5, b2=0.999)
    state = TrainState(variables["params"], tx.init(variables["params"]),
                       {k: v for k, v in variables.items() if k != "params"})
    del variables  # state aliases the leaves; no second param set stays live
    # HBM is the binding resource on one v5e chip (16 GB): keep exactly ONE
    # TrainState live at a time. A reference copy of one decoder block
    # suffices for the params-moved check.
    ref_up2 = [np.asarray(x) for x in jax.tree_util.tree_leaves(
        state.params["unet_encoder"]["triplane_unet"]["up2"])]
    step = make_fewshot_train_step(net, lambda a, b: jnp.mean(jnp.abs(a - b)), tx, weights,
                                   frm_per_chunk=frm_per_chunk, donate=True,
                                   fast_no_grad="fused" if fast else "off",
                                   fast_grad="pallas" if fast else "off")
    T = batch["c"].shape[1]
    Tc = min(frm_per_chunk, T) if multiT else T
    npr = np.random.RandomState(0)
    fake_idx = (
        jnp.asarray(np.concatenate([[0], 1 + npr.permutation(T - 1)[:Tc - 1]]).astype(np.int32))
        if multiT else None
    )

    auxes = {}

    def hbm(name):
        try:
            ms = jax.devices()[0].memory_stats() or {}
            if "bytes_in_use" in ms:
                record[f"{name}_hbm_gb"] = round(ms["bytes_in_use"] / 2**30, 2)
                if "peak_bytes_in_use" in ms:
                    record[f"{name}_hbm_peak_gb"] = round(
                        ms["peak_bytes_in_use"] / 2**30, 2
                    )
        except Exception:  # noqa: BLE001 — telemetry only
            pass

    def phase(name, do_igen, key, fi):
        nonlocal state
        t0 = time.time()
        try:
            new_state, aux = step(state, batch, jax.random.PRNGKey(key),
                                  do_igen=do_igen, multiT=multiT, fake_idx=fi)
            jax.block_until_ready(jax.tree_util.tree_leaves(new_state.params)[0])
            state = new_state  # drop the previous state's device buffers
            record[f"{name}_s"] = round(time.time() - t0, 1)
            record[f"{name}_losses"] = {k: float(v) for k, v in aux.items()}
            hbm(name)
            auxes.update(aux)
            return True
        except Exception as e:  # noqa: BLE001 — record, continue to next phase
            record[f"{name}_error"] = f"{type(e).__name__}: {str(e)[:300]}"
            print(f"[{name}] FAILED: {record[f'{name}_error']}", flush=True)
            return False

    def state_alive():
        # the step donates the old params into the update program; a phase
        # that fails AFTER dispatching the update leaves `state` pointing at
        # deleted buffers — running another phase would crash with "Array has
        # been deleted" instead of recording the real failure (VERDICT r4
        # weak-5: the multiT_T12 record ends in decoder_params_moved_error)
        try:
            return not any(
                getattr(x, "is_deleted", lambda: False)()
                for x in jax.tree_util.tree_leaves(state.params)[:4]
            )
        except Exception:  # noqa: BLE001
            return False

    for nm, ig, key, fi in (("ireal_step1", False, 1, fake_idx),
                            ("igen_step1", True, 2, None),
                            ("ireal_step2_warm", False, 3, fake_idx)):
        if not phase(nm, ig, key, fi) and not state_alive():
            record["aborted_after"] = nm
            record["aborted_reason"] = (
                "train state buffers were donated by the failed step; "
                "remaining phases skipped"
            )
            break

    finite = all(np.isfinite(float(v)) for v in auxes.values()) if auxes else False
    record["finite_losses"] = bool(finite)
    # decoder params moved, trunks frozen (fail-safe: a device OOM on the
    # readback must not lose the phase records already gathered)
    if not state_alive():
        record["decoder_params_moved"] = None
        record["decoder_params_moved_error"] = "state donated by a failed step"
        return record
    try:
        moved = any(
            np.abs(np.asarray(a) - b).max() > 0
            for a, b in zip(
                jax.tree_util.tree_leaves(state.params["unet_encoder"]["triplane_unet"]["up2"]),
                ref_up2,
            )
        )
        record["decoder_params_moved"] = bool(moved)
    except Exception as e:  # noqa: BLE001
        # None (not absent) so consumers can tell infra error from a genuine
        # "params frozen" False (ADVICE r3)
        record["decoder_params_moved"] = None
        record["decoder_params_moved_error"] = f"{type(e).__name__}: {str(e)[:200]}"
    return record


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    out = {
        "backend": jax.devices()[0].platform,
        "device_kind": jax.devices()[0].device_kind,
        "generator": "flagship (512^2 out, 128^2 neural render, 48+48 samples, ch 32768/512)",
        "loss_weights": {"l1": 1.0, "raw_l1": 1.0, "tri": 0.001,
                         "lpips": "disabled (no pretrained AlexNet in image; shipped yaml: 1.0)",
                         "lr_lpips": "disabled (same)", "adv": 0.0},
        "optimizer": "masked adam lr 2.5e-5 betas (0.5, 0.999) on U-Net decoders",
        "configs": {},
    }
    print("backend:", out["backend"], out["device_kind"], flush=True)

    path = os.path.join(_repo, "docs", "fewshot_tpu_run.json")
    # separate --plain-only / --multiT-only invocations accumulate configs
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

    if mode in ("all", "--plain-only"):
        print("== shipped config: B=1 T=4 multiT=off (train_textureUnet_video.yaml) ==", flush=True)
        net, variables, batch, init_s = build(T=4)
        rec = {"B": 1, "T": 4, "multiT": False, "init_s": round(init_s, 1)}
        out["configs"]["shipped_T4"] = rec
        holder = {"v": variables}
        del variables  # ownership transfers into run_stage (HBM)
        try:
            run_stage(net, holder, batch, multiT=False, frm_per_chunk=4, record=rec)
        except Exception as e:  # noqa: BLE001 — one config's hard failure must
            # not skip the remaining configs (ADVICE r3)
            rec["error"] = f"{type(e).__name__}: {str(e)[:300]}"
        finally:
            flush_json()
        print(json.dumps(rec), flush=True)
        del net, holder, batch  # free HBM before the next config

    if mode in ("all", "--multiT-only"):
        print("== multi-T probe: B=1 T=12 frm_per_chunk=6 ==", flush=True)
        net, variables, batch, init_s = build(T=12)
        rec = {"B": 1, "T": 12, "multiT": True, "frm_per_chunk": 6, "init_s": round(init_s, 1)}
        out["configs"]["multiT_T12"] = rec
        holder = {"v": variables}
        del variables
        try:
            run_stage(net, holder, batch, multiT=True, frm_per_chunk=6, record=rec)
        except Exception as e:  # noqa: BLE001
            rec["error"] = f"{type(e).__name__}: {str(e)[:300]}"
        finally:
            flush_json()
        print(json.dumps(rec), flush=True)

    if mode == "--fast-only":
        print("== shipped config + structured fast paths: B=1 T=4 ==", flush=True)
        net, variables, batch, init_s = build(T=4)
        rec = {"B": 1, "T": 4, "multiT": False, "init_s": round(init_s, 1),
               "fast_no_grad": "fused", "fast_grad": "pallas"}
        out["configs"]["shipped_T4_fast"] = rec
        holder = {"v": variables}
        del variables
        try:
            run_stage(net, holder, batch, multiT=False, frm_per_chunk=4, record=rec,
                      fast=True)
        except Exception as e:  # noqa: BLE001
            rec["error"] = f"{type(e).__name__}: {str(e)[:300]}"
        finally:
            flush_json()
        print(json.dumps(rec), flush=True)

    if mode == "--multiT-fast":
        # the literal-formulation T=12 Igen OOMs the 16 GB chip (multiT_T12
        # record); the structured fast paths shrink both the no-grad target
        # renders and the grad-render footprint — this records whether the
        # curriculum chunk trains within HBM under the documented deviation
        print("== multi-T + structured fast paths: B=1 T=12 fpc=6 ==", flush=True)
        net, variables, batch, init_s = build(T=12)
        rec = {"B": 1, "T": 12, "multiT": True, "frm_per_chunk": 6,
               "init_s": round(init_s, 1),
               "fast_no_grad": "fused", "fast_grad": "pallas"}
        out["configs"]["multiT_T12_fast"] = rec
        holder = {"v": variables}
        del variables
        try:
            run_stage(net, holder, batch, multiT=True, frm_per_chunk=6, record=rec,
                      fast=True)
        except Exception as e:  # noqa: BLE001
            rec["error"] = f"{type(e).__name__}: {str(e)[:300]}"
        finally:
            flush_json()
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
