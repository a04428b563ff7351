"""Smoke-check the restructured (program-split) few-shot train step on CPU.

Runs one Ireal + one Igen orchestrated step at the tiny test config with jit
ENABLED, printing per-stage wall times. This is the compile-feasibility probe
for VERDICT r2 #1 (the old monolithic step exceeded 3 h of XLA-CPU compile).
"""

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS",
    "--xla_backend_optimization_level=0 --xla_llvm_disable_expensive_passes=true",
)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import faulthandler

faulthandler.dump_traceback_later(300, repeat=True)  # hang diagnosis to stderr

import numpy as np
import jax
import jax.numpy as jnp

if "--cpu" in sys.argv:
    # the axon sitecustomize force-sets jax_platforms; override back
    sys.argv.remove("--cpu")
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

import optax

from invertavatar_tpu.models.encoders.uvnet import InversionNet
from invertavatar_tpu.train.dryrun import TINY_RENDERING_KWARGS, _fake_batch
from invertavatar_tpu.train.loop_inversion import (
    make_fewshot_train_step,
    masked_adam,
    unet_decoder_trainable,
)
from invertavatar_tpu.train.inversion import InversionLossWeights
from invertavatar_tpu.train.state import TrainState


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    Tc = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    gen_cfg = dict(
        z_dim=32, c_dim=25, w_dim=512, img_resolution=128, img_channels=3,
        rendering_kwargs=dict(TINY_RENDERING_KWARGS, depth_resolution=6,
                              depth_resolution_importance=6),
        neural_rendering_resolution=32, channel_base=1024, channel_max=64,
        map_num_layers=2,
    )
    net = InversionNet(generator_cfg=gen_cfg, texture_out_channels=(32, 32, 16, 8))
    rng = jax.random.PRNGKey(0)
    rngs = {"params": rng, "buffers": jax.random.fold_in(rng, 1),
            "noise": jax.random.fold_in(rng, 2), "ray": jax.random.fold_in(rng, 3)}
    raw = _fake_batch(np.random.RandomState(0), batch=1, res=256, z_dim=32)
    imgs = np.tile(raw["image"][:, None], (1, T, 1, 1, 1)).astype(np.float32)
    for t in range(T):
        imgs[:, t] += 0.1 * np.sin(t + 1.0)
    uvc = jnp.tile(jnp.asarray(raw["v"]["uvcoords_image"])[:, None], (1, T, 1, 1, 1))
    batch = {
        "image": jnp.asarray(imgs),
        "c": jnp.tile(jnp.asarray(raw["c"])[:, None], (1, T, 1)),
        "v": {"uvcoords_image": uvc},
        "uv": jnp.zeros((1, T, 256, 256, 6), jnp.float32),
        "z": jnp.asarray(raw["z"]),
    }
    t0 = time.time()
    variables = net.init(
        rngs, batch["image"][:, :1], batch["c"][:, :1],
        {"uvcoords_image": uvc[:, :1]}, batch["uv"][:, :1], None,
        method=lambda m, f, c, v, uv, ws: m.run_seq(f, c, v, uv, ws=ws),
    )
    gen_vars = net.init(
        rngs, batch["z"], batch["c"][:, 0], {"uvcoords_image": uvc[:, 0]},
        method=lambda m, z, cc, v: m.generator(z, cc, v),
    )
    variables = dict(variables)
    variables["params"] = dict(variables["params"])
    variables["params"]["generator"] = dict(variables["params"]["generator"])
    variables["params"]["generator"]["backbone"] = gen_vars["params"]["generator"]["backbone"]
    variables["buffers"] = dict(variables["buffers"])
    variables["buffers"]["generator"] = gen_vars["buffers"]["generator"]
    print(f"init: {time.time()-t0:.1f}s", flush=True)

    weights = InversionLossWeights(l1=1.0, lpips=0.0, id=0.0, raw_l1=1.0, tri=0.001,
                                   lr_lpips=0.0, adv=0.0)
    tx = masked_adam(1e-4, unet_decoder_trainable)
    state = TrainState(variables["params"], tx.init(variables["params"]),
                       {k: v for k, v in variables.items() if k != "params"})
    step = make_fewshot_train_step(net, lambda a, b: jnp.mean(jnp.abs(a - b)), tx, weights,
                                   frm_per_chunk=Tc)

    t0 = time.time()
    s1, aux1 = step(state, batch, jax.random.PRNGKey(1), do_igen=False, multiT=True,
                    fake_idx=jnp.asarray([0, T - 1][:Tc]))
    jax.block_until_ready(jax.tree_util.tree_leaves(s1.params)[0])
    print(f"Ireal multiT step 1 (compile): {time.time()-t0:.1f}s  aux={ {k: float(v) for k, v in aux1.items()} }", flush=True)

    t0 = time.time()
    s2, aux2 = step(s1, batch, jax.random.PRNGKey(2), do_igen=True, multiT=True)
    jax.block_until_ready(jax.tree_util.tree_leaves(s2.params)[0])
    print(f"Igen multiT step 1 (compile): {time.time()-t0:.1f}s  aux={ {k: float(v) for k, v in aux2.items()} }", flush=True)

    t0 = time.time()
    s3, aux3 = step(s2, batch, jax.random.PRNGKey(3), do_igen=False, multiT=True,
                    fake_idx=jnp.asarray([0, T - 1][:Tc]))
    jax.block_until_ready(jax.tree_util.tree_leaves(s3.params)[0])
    print(f"Ireal step 2 (warm): {time.time()-t0:.1f}s", flush=True)

    for k, v in {**aux1, **aux2}.items():
        assert np.isfinite(float(v)), k
    print("OK", flush=True)


if __name__ == "__main__":
    main()
