"""Verification drive: the `fast_igen_target` / `fast_no_grad` plumbing.

Runs one oneshot-stage Igen step and one e4e split-program step with the
structured fast-path target renders (train/fast_render.py, interpret-mode
Pallas so CPU exercises the kernel path), on tiny models. Checks finite
losses and that params moved. Not a test — a runtime verification drive.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    "--xla_backend_optimization_level=0 --xla_llvm_disable_expensive_passes"
)

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import optax

from invertavatar_tpu.models.encoders.uvnet import InversionNet
from invertavatar_tpu.train.dryrun import TINY_RENDERING_KWARGS, _fake_batch
from invertavatar_tpu.train.inversion import InversionLossWeights
from invertavatar_tpu.train.loop_inversion import (
    make_oneshot_train_step,
    masked_adam,
    oneshot_tex_trainable,
)
from invertavatar_tpu.train.state import TrainState


def main():
    gen_cfg = dict(
        z_dim=32, c_dim=25, w_dim=512, img_resolution=128, img_channels=3,
        rendering_kwargs=dict(TINY_RENDERING_KWARGS, depth_resolution=6,
                              depth_resolution_importance=6),
        neural_rendering_resolution=32, channel_base=1024, channel_max=64,
        map_num_layers=2,
    )
    net = InversionNet(generator_cfg=gen_cfg, unet_type="segformer",
                       texture_out_channels=(32, 32, 16, 8))
    rng = jax.random.PRNGKey(0)
    rngs = {"params": rng, "buffers": jax.random.fold_in(rng, 1),
            "noise": jax.random.fold_in(rng, 2), "ray": jax.random.fold_in(rng, 3)}
    raw = _fake_batch(np.random.RandomState(0), batch=1, res=256, z_dim=32)
    batch = {
        "image": jnp.asarray(raw["image"]),
        "c": jnp.asarray(raw["c"]),
        "v": {"uvcoords_image": jnp.asarray(raw["v"]["uvcoords_image"])},
        "uv": jnp.zeros((1, 256, 256, 6), jnp.float32),
        "z": jnp.asarray(raw["z"]),
        "gen_uv": jnp.zeros((1, 256, 256, 6), jnp.float32),
    }
    x = {"image": batch["image"], "uv": batch["uv"]}
    variables = net.init(rngs, x, batch["c"], batch["v"],
                         method=lambda m, x, c, v: m(x, c, v))
    gen_vars = net.init(rngs, batch["z"], batch["c"], batch["v"],
                        method=lambda m, z, cc, v: m.generator(z, cc, v))
    variables = dict(variables)
    variables["params"] = dict(variables["params"])
    variables["params"]["generator"] = dict(variables["params"]["generator"])
    variables["params"]["generator"]["backbone"] = gen_vars["params"]["generator"]["backbone"]
    variables["buffers"] = dict(variables["buffers"])
    variables["buffers"]["generator"] = gen_vars["buffers"]["generator"]
    weights = InversionLossWeights(l1=1.0, lpips=0.0, id=0.0, raw_l1=1.0,
                                   tri=0.001, texture=0.001, adv=0.0)
    tx = masked_adam(1e-4, oneshot_tex_trainable)
    state = TrainState(variables["params"], tx.init(variables["params"]),
                       {k: v for k, v in variables.items() if k != "params"})
    from invertavatar_tpu.train.loop_inversion import make_oneshot_grad_programs

    step = make_oneshot_grad_programs(
        net, None, lambda a, b: jnp.mean(jnp.abs(a - b)),
        None, tx, None, weights,
        fast_igen_target="exact", fast_grad="pallas", fast_interpret=True,
    )
    p0 = [np.asarray(x) for x in jax.tree_util.tree_leaves(
        state.params["unet_encoder"]["texture_unet"])[:8]]
    s1, _, aux = step(state, None, batch, jax.random.PRNGKey(1), phase="Igen")
    aux = {k: float(v) for k, v in aux.items()}
    print("oneshot split Igen (fast target + pallas grad):", aux, flush=True)
    assert all(np.isfinite(v) for v in aux.values()), aux
    p1 = jax.tree_util.tree_leaves(s1.params["unet_encoder"]["texture_unet"])[:8]
    assert any(np.abs(a - np.asarray(b)).max() > 0 for a, b in zip(p0, p1))
    print("PASS: oneshot split step (fast paths) finite + params moved")


if __name__ == "__main__":
    main()
