"""Full GAN training step on the virtual 8-device CPU mesh (driver contract)."""

import numpy as np


def test_gan_train_step_8dev_mesh():
    from invertavatar_tpu.train.dryrun import run_dryrun

    metrics = run_dryrun(8)
    assert "Loss/G/loss" in metrics and "Loss/D/loss" in metrics
    assert np.isfinite(float(metrics["Loss/r1_penalty"]))
