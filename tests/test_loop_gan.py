"""Short GAN training-loop run on the CPU mesh (2 steps, tiny model)."""

import numpy as np

from invertavatar_tpu.train.dryrun import TINY_RENDERING_KWARGS, _fake_batch, tiny_models
from invertavatar_tpu.train.gan import GANLossConfig
from invertavatar_tpu.train.loop_gan import GANTrainConfig, train_gan


def test_train_gan_two_steps(tmp_path):
    G, D = tiny_models(nrr=32)
    cfg = GANTrainConfig(
        run_dir=str(tmp_path / "run"),
        batch_size=8,
        kimg_per_tick=1,
        loss=GANLossConfig(
            r1_gamma=8.0,
            gpc_reg_prob=0.5,
            neural_rendering_resolution_initial=32,
            neural_rendering_resolution_final=None,
            # interval 1 => a single compiled phase variant (keeps CI time down)
            g_reg_interval=1,
            d_reg_interval=1,
        ),
    )
    rng = np.random.RandomState(0)

    def batches():
        while True:
            yield _fake_batch(rng, batch=8, res=128, z_dim=32)

    g_state, d_state, ema, nimg = train_gan(G, D, batches(), cfg, max_steps=2)
    assert nimg == 16
    leaves = [np.asarray(x) for x in
              __import__("jax").tree_util.tree_leaves(ema)]
    assert all(np.isfinite(l).all() for l in leaves)
    import os

    assert os.path.exists(os.path.join(cfg.run_dir, "stats.jsonl"))
