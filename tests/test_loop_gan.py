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


import pytest


@pytest.mark.slow
@pytest.mark.timeout(3600)
def test_train_gan_resume_bitwise(tmp_path):
    """Snapshot → resume reproduces the uninterrupted run bit-for-bit.

    Covers the three resume-correctness pieces: the orbax template restore
    (optax NamedTuple states, not plain dicts), the saved step_idx (rng fold
    + lazy-reg cadence continue, not replay), and the EMA/cur_nimg carry.
    Reference semantics: training_loop.py resume_pkl + resume_kimg."""
    import os

    import jax
    import numpy as np

    from invertavatar_tpu.parallel.mesh import make_mesh

    G, D = tiny_models(nrr=32)
    # ONE-device mesh: under the 8-virtual-device CPU mesh the grad psum runs
    # through XLA-CPU's in-process AllReduce, whose summation order follows
    # thread arrival — run-to-run fp wobble (~1e-3 in the losses) that would
    # drown the bitwise comparison this test is about. Resume correctness
    # (template restore, step_idx carry, EMA) is mesh-size-independent;
    # multi-device step correctness is covered by the dryrun + loop tests.
    mesh = make_mesh(devices=jax.devices()[:1])

    def cfg_for(run_dir):
        return GANTrainConfig(
            run_dir=run_dir,
            batch_size=8,
            kimg_per_tick=0.008,  # tick (and snapshot) after every step
            snapshot_ticks=1,
            snapshot_images=False,  # skip the fakes-grid eval compile
            loss=GANLossConfig(
                r1_gamma=8.0,
                gpc_reg_prob=0.5,
                neural_rendering_resolution_initial=32,
                neural_rendering_resolution_final=None,
                g_reg_interval=1,
                d_reg_interval=1,
            ),
        )

    def batch_seq(n):
        rng = np.random.RandomState(0)
        return [_fake_batch(rng, batch=8, res=128, z_dim=32) for _ in range(n)]

    seq = batch_seq(4)  # b0 (init shapes) + 3 training batches

    # uninterrupted: 3 steps
    gA, dA, emaA, nimgA = train_gan(
        G, D, iter(seq), cfg_for(str(tmp_path / "a")), mesh=mesh, max_steps=3
    )

    # interrupted: 2 steps, then resume from the step-2 snapshot for step 3
    train_gan(G, D, iter(seq[:3]), cfg_for(str(tmp_path / "b")), mesh=mesh,
              max_steps=2)
    snap = os.path.join(str(tmp_path / "b"), "snapshot-00000016")
    assert os.path.isdir(snap), os.listdir(str(tmp_path / "b"))
    gB, dB, emaB, nimgB = train_gan(
        G, D, iter([seq[0], seq[3]]), cfg_for(str(tmp_path / "c")),
        mesh=mesh, max_steps=3, resume_dir=snap,
    )

    assert nimgA == nimgB == 24
    for ta, tb, name in ((gA.params, gB.params, "G"), (dA.params, dB.params, "D"),
                         (emaA, emaB, "ema")):
        fa = jax.tree_util.tree_leaves(ta)
        fb = jax.tree_util.tree_leaves(tb)
        assert len(fa) == len(fb)
        for a, b in zip(fa, fb):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=name)


@pytest.mark.slow
def test_train_gan_metric_tick(tmp_path):
    """In-training metric eval at snapshot ticks (reference
    training_loop.py:494-503): metric-*.jsonl written with a finite FID."""
    import json
    import os

    G, D = tiny_models(nrr=32)
    cfg = GANTrainConfig(
        run_dir=str(tmp_path / "run"),
        batch_size=8,
        kimg_per_tick=1,
        snapshot_ticks=1,
        loss=GANLossConfig(
            r1_gamma=8.0,
            neural_rendering_resolution_initial=32,
            neural_rendering_resolution_final=None,
            g_reg_interval=1,
            d_reg_interval=1,
        ),
    )
    rng = np.random.RandomState(0)
    batch = _fake_batch(rng, batch=8, res=128, z_dim=32)

    class DS:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            return {
                "image": batch["image"][i],
                "c": batch["c"][i],
                "v": {"uvcoords_image": batch["v"]["uvcoords_image"][i]},
            }

    def detector(imgs_u8):  # cheap stand-in detector: channel-mean pyramid
        x = imgs_u8.astype(np.float32) / 255.0
        return np.stack(
            [x.mean((1, 2, 3)), x.std((1, 2, 3)), x[:, ::2, ::2].mean((1, 2, 3)),
             x[..., 0].mean((1, 2)), x[..., 1].mean((1, 2)), x[..., 2].mean((1, 2))],
            axis=1,
        )

    def batches():
        while True:
            yield batch

    train_gan(
        G, D, batches(), cfg, max_steps=1,
        metric_names=("fid64",), metric_dataset=DS(), metric_detector_fn=detector,
    )
    path = os.path.join(cfg.run_dir, "metric-fid64.jsonl")
    assert os.path.exists(path)
    entry = json.loads(open(path).read().strip().splitlines()[-1])
    assert np.isfinite(entry["results"]["fid64"])
