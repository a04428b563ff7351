"""Benchmark: 512² avatar reenactment throughput (frames/sec/chip).

The north-star loop (SURVEY.md §3.3 / BASELINE.md): the avatar is compiled once
into (ws, texture_feats, static_feats); the per-frame animation touches only
`synthesis_withTexture` — UV rasterize + face refinement + volume render + SR.
Baseline target: ≥30 fps/chip on v5e (BASELINE.json north_star).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
_cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
os.makedirs(_cache_dir, exist_ok=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache_dir)
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_FPS = 30.0


def main():
    import jax
    import jax.numpy as jnp

    from invertavatar_tpu.flagship import example_inputs, flagship_generator, init_flagship

    G = flagship_generator()
    variables = init_flagship(G)
    z, c, uvc = example_inputs(1)

    # one-time avatar "compilation": ws + texture/static feature lists
    def precompute(variables, z, c):
        def run(m, z, c):
            ws = m.mapping(z, c)
            tex = m.texture_backbone.synthesis(ws, return_list=True, noise_mode="const")
            static = m.backbone.synthesis(ws, return_list=True, noise_mode="const")
            # frame-independent halves of rasterize (models/triplane.py)
            cache = m.precompute_raster_static(static)
            tex_cat = m.precompute_texture_concat(tex)
            return ws, tex, static, cache, tex_cat

        return G.apply(variables, z, c, method=run)

    ws, tex, static, cache, tex_cat = jax.jit(precompute)(variables, z, c)

    def frame(variables, ws, tex, static, cache, tex_cat, c, uvcoords_image):
        def run(m, ws, tex, static, cache, tex_cat, c, v):
            return m.synthesis_withTexture(
                ws, tex, c, v, static_feats=static, noise_mode="const", evaluation=True,
                raster_static_cache=cache, texture_concat_cache=tex_cat,
            )["image"]

        return G.apply(
            variables, ws, tex, static, cache, tex_cat, c,
            {"uvcoords_image": uvcoords_image}, method=run,
        )

    frame_jit = jax.jit(frame)

    import numpy as np

    # warmup / compile
    out = frame_jit(variables, ws, tex, static, cache, tex_cat, c, uvc)
    np.asarray(out[0, 0, 0, :1])  # block_until_ready is a no-op through the
    # axon relay (docs/PERF_NOTES.md); a scalar readback actually fences

    n_frames = int(os.environ.get("BENCH_FRAMES", "30"))
    t0 = time.perf_counter()
    for i in range(n_frames):
        out = frame_jit(variables, ws, tex, static, cache, tex_cat, c, uvc)
    np.asarray(out[0, 0, 0, :1])
    dt = time.perf_counter() - t0
    fps = n_frames / dt

    # MFU: XLA-counted flops of the jitted frame / chip peak (bf16 matmul
    # path peak; the frame mixes fp32 and bf16 so this is a lower bound)
    peak_tflops = {
        # bf16 dense peak per chip
        "TPU v5 lite": 197.0, "TPU v5e": 197.0, "TPU v5": 459.0,
        "TPU v5p": 459.0, "TPU v4": 275.0, "TPU v6e": 918.0, "TPU v6 lite": 918.0,
    }
    kind = jax.devices()[0].device_kind
    peak = next((v for k, v in peak_tflops.items() if k.lower() in kind.lower()), 197.0)
    mfu = None
    flops = None
    try:
        cost = frame_jit.lower(
            variables, ws, tex, static, cache, tex_cat, c, uvc
        ).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        if flops > 0:
            mfu = flops * fps / (peak * 1e12)
    except Exception:
        pass

    # XLA's cost analysis counts a pallas_call as ZERO flops, so `mfu` above
    # misses the frame's dominant compute (the fused render kernels). The
    # kernel wrappers record their actual matmul FLOPs into a ledger at trace
    # time; (XLA + kernel) FLOPs / peak = the implementation's MXU
    # utilization — the honest "how busy is the hardware" number for this
    # gather-shaped workload (see docs/PERF_NOTES.md round 4).
    mxu_util = None
    kernel_flops = None
    mxu_err = None
    try:
        from invertavatar_tpu.ops.pallas_fused_render import (
            start_flops_ledger,
            stop_flops_ledger,
        )

        start_flops_ledger()
        # a FRESH function object: jax.eval_shape(frame, ...) resolves to the
        # already-cached jit trace of `frame` (frame_jit warmed it above), so
        # the trace — and with it every ledger_add — would be silently
        # skipped; this was the r4 "dead ledger" (BENCH_r04.json had no
        # mxu_util and kernel_flops read 0)
        jax.eval_shape(lambda *a: frame(*a),
                       variables, ws, tex, static, cache, tex_cat, c, uvc)
        kernel_flops = stop_flops_ledger()
        if kernel_flops > 0 and flops is not None:
            mxu_util = (flops + kernel_flops) * fps / (peak * 1e12)
    except Exception as e:  # noqa: BLE001
        # a dead ledger must be VISIBLE in the artifact (ADVICE r4: the r4
        # bench shipped without mxu_util and nothing said why)
        mxu_err = f"{type(e).__name__}: {str(e)[:200]}"

    rec = {
        "metric": "reenact_512_fps_per_chip",
        "value": round(fps, 3),
        "unit": "frames/sec",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }
    if mfu is not None:
        rec["mfu"] = round(mfu, 4)
        rec["model_flops_per_frame"] = flops
        rec["device_kind"] = kind
    # kernel_flops is emitted even when 0 so "ledger never armed" (0.0) is
    # distinguishable from "ledger threw" (mxu_util_error) in the artifact.
    # mxu_util counts every matmul FLOP the kernels issue to the MXU
    # (including the tent-contraction taps that multiply structural zeros) —
    # it is "how busy is the MXU", not "how much useful model compute"; the
    # useful-compute MFU is the `mfu` field (docs/PERF_NOTES.md round 5).
    if kernel_flops is not None:
        rec["kernel_flops_per_frame"] = kernel_flops
    if mxu_util is not None:
        rec["mxu_util"] = round(mxu_util, 4)
    if mxu_err is not None:
        rec["mxu_util_error"] = mxu_err
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
