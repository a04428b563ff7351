"""On-chip probe: resident-planes VMEM variant vs windowed-DMA kernels.

The whole bf16 flagship plane set (3×256²×32 = 12.6 MB) fits v5e VMEM; the
resident mode slices tent windows from it in place instead of double-buffered
per-step DMAs (interpret-mode bitwise equality: tests/test_pallas_interpret.py
::test_renderer_fused_march_interpret_resident_identical). This measures the
full flagship render both ways and writes docs/resident_planes.json.
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

from invertavatar_tpu.flagship import example_inputs, flagship_generator, init_flagship

_fetch = None


def _fence(out):
    global _fetch
    if _fetch is None:
        _fetch = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))
    float(_fetch(jax.tree_util.tree_leaves(out)[0].ravel()[:8]))


def main():
    G = flagship_generator()
    variables = init_flagship(G)
    z, c, uvc = example_inputs()
    rng = jax.random.PRNGKey(0)
    rngs = {"noise": rng, "ray": jax.random.fold_in(rng, 1)}

    def fwd(resident):
        rk = dict(G.rendering_kwargs, resident_planes=resident)
        Gv = G.clone(rendering_kwargs=rk)

        @jax.jit
        def f(v, zz, cc, uu):
            return Gv.apply(v, zz, cc, {"uvcoords_image": uu}, rngs=rngs)

        return f

    rec = {"device": jax.devices()[0].device_kind, "n_frames": 30}
    outs = {}
    for name, res in (("windowed", False), ("resident", True)):
        f = fwd(res)
        t0 = time.time()
        out = f(variables, z, c, uvc)
        _fence(out)
        rec[f"{name}_compile_s"] = round(time.time() - t0, 1)
        t0 = time.time()
        for _ in range(rec["n_frames"]):
            out = f(variables, z, c, uvc)
        _fence(out)
        dt = (time.time() - t0) / rec["n_frames"]
        rec[f"{name}_ms"] = round(dt * 1000, 2)
        rec[f"{name}_fps"] = round(1.0 / dt, 2)
        outs[name] = np.asarray(out["image"])
        print(name, rec[f"{name}_ms"], "ms", flush=True)

    rec["max_abs_diff"] = float(np.abs(outs["windowed"] - outs["resident"]).max())
    print(json.dumps(rec, indent=2))
    with open(os.path.join(_repo, "docs", "resident_planes.json"), "w") as f:
        json.dump(rec, f, indent=2)


if __name__ == "__main__":
    main()
