"""Inversion-stage training wiring: e4e step on a tiny generator + loss math."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from invertavatar_tpu.train.inversion import (
    InversionLossWeights,
    fewshot_igen_loss,
    fewshot_ireal_loss,
    wd_losses,
)


def test_wd_losses_math():
    rng = np.random.RandomState(0)
    W = jnp.asarray(rng.randn(512, 1).astype(np.float32) * 0.01)

    def wd_apply(w):
        return w @ W

    ws_fake = jnp.asarray(rng.randn(2, 14, 512).astype(np.float32))
    ws_real = jnp.asarray(rng.randn(2, 14, 512).astype(np.float32))
    total, aux = wd_losses(wd_apply, ws_fake, ws_real, InversionLossWeights(), do_r1=True)
    assert np.isfinite(float(total))
    # R1 of a linear scorer == ||W||² per sample
    expected_r1 = float(jnp.sum(jnp.square(W)))
    assert abs(float(aux["wd_r1"]) - expected_r1) / expected_r1 < 1e-4


def test_fewshot_losses_with_mock_model():
    """Loss plumbing against a mock differentiable rollout."""
    rng = np.random.RandomState(1)
    B, T, H = 1, 2, 32
    frames = jnp.asarray(rng.rand(B, T, H, H, 3).astype(np.float32) * 2 - 1)
    vid_c = jnp.asarray(rng.randn(B, T, 25).astype(np.float32))
    vid_v = {"uvcoords_image": jnp.zeros((B, T, 8, 8, 3))}
    vid_uv = jnp.zeros((B, T, 8, 8, 6))

    bias = jnp.asarray(rng.randn(3).astype(np.float32) * 0.1)

    def inv_run_seq(f, c, v, uv, ws):
        img = f.reshape(B * T, H, H, 3) + bias
        return {
            "image": img,
            "feature_image": jnp.tile(img, (1, 1, 1, 2)),
            "triplane": jnp.zeros((B * T, 3, 8, 8, 4)) + bias[0],
        }

    w = InversionLossWeights(l1=1.0, lpips=0.0)
    total, aux = fewshot_ireal_loss(inv_run_seq, lambda a, b: jnp.float32(0.0), w,
                                    frames, vid_c, vid_v, vid_uv)
    # pure bias offset -> l1 == mean |bias|
    assert abs(float(aux["l1"]) - float(jnp.mean(jnp.abs(bias)))) < 1e-5

    # gradients flow to the mock parameter through the loss
    def loss_of_bias(b):
        def run(f, c, v, uv, ws):
            img = f.reshape(B * T, H, H, 3) + b
            return {"image": img, "feature_image": jnp.tile(img, (1, 1, 1, 2)),
                    "triplane": jnp.zeros((B * T, 3, 8, 8, 4)) + b[0]}

        t, _ = fewshot_ireal_loss(run, lambda a, bb: jnp.float32(0.0), w,
                                  frames, vid_c, vid_v, vid_uv)
        return t

    g = jax.grad(loss_of_bias)(bias)
    assert np.all(np.isfinite(np.asarray(g))) and np.abs(np.asarray(g)).max() > 0


def _tiny_e4e_setup():
    """Shared tiny-generator e4e fixture: (net, state, wd, wd_state, batch,
    tx, wd_tx, weights)."""
    import optax

    from invertavatar_tpu.models.encoders.e4e import LatentCodesDiscriminator
    from invertavatar_tpu.models.encoders.uvnet import InversionNet
    from invertavatar_tpu.train.dryrun import TINY_RENDERING_KWARGS, _fake_batch
    from invertavatar_tpu.train.loop_inversion import e4e_trainable, masked_adam
    from invertavatar_tpu.train.state import TrainState

    gen_cfg = dict(
        z_dim=32, c_dim=25, w_dim=512, img_resolution=128, img_channels=3,
        rendering_kwargs=dict(TINY_RENDERING_KWARGS, depth_resolution=6,
                              depth_resolution_importance=6),
        neural_rendering_resolution=32, channel_base=1024, channel_max=64,
        map_num_layers=2,
    )
    net = InversionNet(generator_cfg=gen_cfg)
    rng = jax.random.PRNGKey(0)
    rngs = {"params": rng, "buffers": jax.random.fold_in(rng, 1),
            "noise": jax.random.fold_in(rng, 2), "ray": jax.random.fold_in(rng, 3)}
    # e4e consumes 256² inputs (adaptive pool floors at 256); the tiny
    # generator still renders 128² and Ireal compares after the 256 resize
    raw = _fake_batch(np.random.RandomState(0), batch=1, res=256, z_dim=32)
    batch = {
        "image": jnp.asarray(raw["image"]),
        "c": jnp.asarray(raw["c"]),
        "v": {"uvcoords_image": jnp.asarray(raw["v"]["uvcoords_image"])},
        "z": jnp.asarray(raw["z"]),
    }
    enc_vars = net.init(rngs, jnp.zeros((1, 256, 256, 3)), method=lambda m, x: m.encode(x))
    gen_vars = net.init(
        rngs, batch["z"], batch["c"], batch["v"],
        method=lambda m, z, cc, v: m.generator(z, cc, v),
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

    weights = InversionLossWeights(l1=1.0, lpips=0.0, id=0.0, w_delta=0.001,
                                   w_regular=0.0, w_discriminator=0.01,
                                   raw_l1=1.0, tri=0.001)
    tx = masked_adam(1e-4, e4e_trainable)
    wd = LatentCodesDiscriminator()
    wd_tx = optax.adam(2e-5)
    state = TrainState(params, tx.init(params), buffers)
    wd_vars = wd.init(jax.random.PRNGKey(1), jnp.zeros((1, 512)))
    wd_state = TrainState(wd_vars["params"], wd_tx.init(wd_vars["params"]), {})
    return net, state, wd, wd_state, batch, tx, wd_tx, weights


@pytest.mark.slow
def test_e4e_step_tiny():
    """One jitted e4e step over the tiny dryrun generator (compiles Ireal+Igen+WD)."""
    from invertavatar_tpu.train.loop_inversion import make_e4e_train_step

    net, state, wd, wd_state, batch, tx, wd_tx, weights = _tiny_e4e_setup()
    step = make_e4e_train_step(net, wd, lambda a, b: jnp.mean(jnp.abs(a - b)), None,
                               tx, wd_tx, weights)

    new_state, new_wd, aux = jax.jit(step, static_argnames=("do_wd_reg",))(
        state, wd_state, batch, jax.random.PRNGKey(2), do_wd_reg=True
    )
    for k, v in aux.items():
        assert np.isfinite(float(v)), k
    # encoder params changed; generator unchanged (masked out)
    flat_old = jax.tree_util.tree_leaves(state.params["encoder"])
    flat_new = jax.tree_util.tree_leaves(new_state.params["encoder"])
    assert any(np.abs(np.asarray(a) - np.asarray(b)).max() > 0 for a, b in zip(flat_old, flat_new))
    g0 = jax.tree_util.tree_leaves(state.params["generator"])
    g1 = jax.tree_util.tree_leaves(new_state.params["generator"])
    for a, b in zip(g0, g1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # WD params moved too
    wd0 = jax.tree_util.tree_leaves(wd_state.params)
    wd1 = jax.tree_util.tree_leaves(new_wd.params)
    assert any(np.abs(np.asarray(a) - np.asarray(b)).max() > 0 for a, b in zip(wd0, wd1))


@pytest.mark.slow
def test_e4e_grad_programs_parity():
    """The per-phase HBM split (make_e4e_grad_programs) matches the monolithic
    step: grad(ireal+igen) == grad(ireal)+grad(igen) up to float add order, so
    one step from the same state must land on (numerically) the same params.
    The split is what runs on the 16 GB v5e — docs/train_tpu_run.json."""
    from invertavatar_tpu.train.loop_inversion import (
        make_e4e_grad_programs,
        make_e4e_train_step,
    )

    net, state, wd, wd_state, batch, tx, wd_tx, weights = _tiny_e4e_setup()
    lpips = lambda a, b: jnp.mean(jnp.abs(a - b))
    mono = jax.jit(make_e4e_train_step(net, wd, lpips, None, tx, wd_tx, weights),
                   static_argnames=("do_wd_reg",))
    split = make_e4e_grad_programs(net, wd, lpips, None, tx, wd_tx, weights)

    rng = jax.random.PRNGKey(2)
    m_state, m_wd, m_aux = mono(state, wd_state, batch, rng, do_wd_reg=True)
    s_state, s_wd, s_aux = split(state, wd_state, batch, rng, do_wd_reg=True)

    for k in m_aux:
        np.testing.assert_allclose(float(m_aux[k]), float(s_aux[k]), rtol=2e-4,
                                   atol=1e-6, err_msg=k)
    fm = jax.tree_util.tree_flatten_with_path(m_state.params)[0]
    fs = jax.tree_util.tree_flatten_with_path(s_state.params)[0]
    for (pm, am), (ps, bs) in zip(fm, fs):
        assert pm == ps
        np.testing.assert_allclose(np.asarray(am), np.asarray(bs), rtol=1e-4,
                                   atol=1e-5, err_msg=jax.tree_util.keystr(pm))
    for a, b in zip(jax.tree_util.tree_leaves(m_wd.params),
                    jax.tree_util.tree_leaves(s_wd.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=2e-6)


@pytest.mark.slow
def test_e4e_grad_programs_remat_parity():
    """Staged rematerialization (remat=True → jax.checkpoint segments in the
    loss + model-level remat_stages inside synthesis_withTexture) reproduces
    the literal split step's losses and updated params: remat recomputes the
    SAME forward, so grads differ only by XLA re-association. This flag is
    the HBM plan for the literal-formulation inversion steps on the 16 GB
    v5e, where the un-rematted backward's residual SUM ResourceExhausts
    (docs/train_tpu_run.json r4)."""
    from invertavatar_tpu.train.loop_inversion import make_e4e_grad_programs

    net, state, wd, wd_state, batch, tx, wd_tx, weights = _tiny_e4e_setup()
    lpips = lambda a, b: jnp.mean(jnp.abs(a - b))
    base = make_e4e_grad_programs(net, wd, lpips, None, tx, wd_tx, weights)
    rem = make_e4e_grad_programs(net, wd, lpips, None, tx, wd_tx, weights, remat=True)

    rng = jax.random.PRNGKey(2)
    b_state, b_wd, b_aux = base(state, wd_state, batch, rng, do_wd_reg=True)
    r_state, r_wd, r_aux = rem(state, wd_state, batch, rng, do_wd_reg=True)

    for k in b_aux:
        np.testing.assert_allclose(float(b_aux[k]), float(r_aux[k]), rtol=2e-4,
                                   atol=1e-6, err_msg=k)
    fb = jax.tree_util.tree_flatten_with_path(b_state.params)[0]
    fr = jax.tree_util.tree_flatten_with_path(r_state.params)[0]
    for (pb, ab), (pr, ar) in zip(fb, fr):
        assert pb == pr
        np.testing.assert_allclose(np.asarray(ab), np.asarray(ar), rtol=1e-4,
                                   atol=1e-5, err_msg=jax.tree_util.keystr(pb))


@pytest.mark.slow
def test_oneshot_grad_programs_remat_parity():
    """Staged remat on the one-shot grad programs (remat=True → model-level
    remat_stages on the grad-carrying student render) reproduces the literal
    split step's losses and updated params — the HBM plan's second stage for
    the 16 GB v5e (docs/train_tpu_run.json oneshot_B1 memory plans)."""
    from invertavatar_tpu.train.loop_inversion import make_oneshot_grad_programs

    net, D, state, d_state, batch, tx, d_tx, weights = _tiny_oneshot_setup()
    l1 = lambda a, b: jnp.mean(jnp.abs(a - b))
    base = make_oneshot_grad_programs(net, D, l1, None, tx, d_tx, weights)
    rem = make_oneshot_grad_programs(net, D, l1, None, tx, d_tx, weights, remat=True)

    rng = jax.random.PRNGKey(3)
    b_state, _, b_aux = base(state, d_state, batch, rng, phase="Igen")
    r_state, _, r_aux = rem(state, d_state, batch, rng, phase="Igen")
    assert set(b_aux) == set(r_aux)
    for k in b_aux:
        np.testing.assert_allclose(float(b_aux[k]), float(r_aux[k]), rtol=2e-4,
                                   atol=1e-6, err_msg=k)
    fb = jax.tree_util.tree_flatten_with_path(b_state.params)[0]
    fr = jax.tree_util.tree_flatten_with_path(r_state.params)[0]
    for (pb, ab), (pr, ar) in zip(fb, fr):
        assert pb == pr
        np.testing.assert_allclose(np.asarray(ab), np.asarray(ar), rtol=1e-4,
                                   atol=1e-5, err_msg=jax.tree_util.keystr(pb))


@pytest.mark.slow
def test_oneshot_grad_programs_prefix_split_parity():
    """prefix_split=True (the stop-grad e4e prefix — encode + texture pyramid
    + e4e render — as its OWN program) reproduces the non-split per-phase
    step: same losses and params after one Igen and one Ireal step. This is
    the HBM plan's third stage for the 16 GB v5e: subtree grads and staged
    remat both left the literal grad_igen plan at ~17 GB because its 12 GB
    temp is the prefix render's forward working set
    (docs/train_tpu_run.json oneshot_B1_subtree / oneshot_B1_remat).

    Both sides run the rng-free deterministic sampling overrides
    (fast_igen_target='exact', fast_grad='structured'): the split cuts the
    forward across two `apply`s, which re-bases flax's per-call ray-rng
    folds, so under LITERAL stochastic sampling the two formulations draw
    different (identically distributed) strata — deterministic sampling
    removes exactly that nuisance term and makes the math comparison exact."""
    from invertavatar_tpu.train.loop_inversion import make_oneshot_grad_programs

    net, D, state, d_state, batch, tx, d_tx, weights = _tiny_oneshot_setup()
    l1 = lambda a, b: jnp.mean(jnp.abs(a - b))
    det = dict(fast_igen_target="exact", fast_grad="structured")
    base = make_oneshot_grad_programs(net, D, l1, None, tx, d_tx, weights, **det)
    pref = make_oneshot_grad_programs(net, D, l1, None, tx, d_tx, weights,
                                      prefix_split=True, **det)

    for phase, key in (("Igen", 1), ("Ireal", 2)):
        rng = jax.random.PRNGKey(key)
        b_state, _, b_aux = base(state, d_state, batch, rng, phase=phase)
        p_state, _, p_aux = pref(state, d_state, batch, rng, phase=phase)
        assert set(b_aux) == set(p_aux), (phase, set(b_aux) ^ set(p_aux))
        for k in b_aux:
            np.testing.assert_allclose(float(b_aux[k]), float(p_aux[k]),
                                       rtol=2e-4, atol=1e-6, err_msg=f"{phase}:{k}")
        fb = jax.tree_util.tree_flatten_with_path(b_state.params)[0]
        fp = jax.tree_util.tree_flatten_with_path(p_state.params)[0]
        for (pb, ab), (pp, ap) in zip(fb, fp):
            assert pb == pp
            np.testing.assert_allclose(
                np.asarray(ab), np.asarray(ap), rtol=1e-4, atol=1e-5,
                err_msg=f"{phase}:{jax.tree_util.keystr(pb)}",
            )


@pytest.mark.slow
def test_oneshot_grad_programs_nested_subtree_parity():
    """grad_subtree='unet_encoder/texture_unet' (the tex phase of the
    reference's interval schedule, training_loop_unet_interval.py:358-368)
    matches the whole-unet default: the optimizer masks to the texture unet
    either way, so the applied update is identical — the nested subtree just
    stops computing (and materializing) the frozen triplane-unet/SFT-backbone
    grads, which is what brings the flagship grad_igen HBM plan under 16 GB
    (docs/train_tpu_run.json oneshot_B1_prefix planned 16.4 GB)."""
    from invertavatar_tpu.train.loop_inversion import make_oneshot_grad_programs

    net, D, state, d_state, batch, tx, d_tx, weights = _tiny_oneshot_setup()
    l1 = lambda a, b: jnp.mean(jnp.abs(a - b))
    base = make_oneshot_grad_programs(net, D, l1, None, tx, d_tx, weights)
    sub = make_oneshot_grad_programs(net, D, l1, None, tx, d_tx, weights,
                                     grad_subtree="unet_encoder/texture_unet")

    for phase, key in (("Igen", 1), ("Ireal", 2)):
        rng = jax.random.PRNGKey(key)
        b_state, _, b_aux = base(state, d_state, batch, rng, phase=phase)
        s_state, _, s_aux = sub(state, d_state, batch, rng, phase=phase)
        assert set(b_aux) == set(s_aux), (phase, set(b_aux) ^ set(s_aux))
        for k in b_aux:
            np.testing.assert_allclose(float(b_aux[k]), float(s_aux[k]),
                                       rtol=2e-5, atol=1e-7, err_msg=f"{phase}:{k}")
        fb = jax.tree_util.tree_flatten_with_path(b_state.params)[0]
        fs = jax.tree_util.tree_flatten_with_path(s_state.params)[0]
        for (pb, ab), (ps, as_) in zip(fb, fs):
            assert pb == ps
            np.testing.assert_allclose(
                np.asarray(ab), np.asarray(as_), rtol=1e-5, atol=1e-6,
                err_msg=f"{phase}:{jax.tree_util.keystr(pb)}",
            )


@pytest.mark.slow
def test_fewshot_step_tiny():
    """Ireal + Igen + D steps over the tiny generator with matched unet widths.

    Runs JITTED: the program-split step (train/loop_inversion.py
    FewshotPrograms) never puts more than one generator render in a single
    XLA program, so each sub-program compiles in seconds-to-minutes on the
    CPU mesh (the old monolithic step was uncompilable — VERDICT r2 #1)."""
    _fewshot_step_tiny_body()


def _fewshot_step_tiny_body():
    import optax

    from invertavatar_tpu.models.discriminator import DualDiscriminator
    from invertavatar_tpu.models.encoders.uvnet import InversionNet
    from invertavatar_tpu.train.dryrun import TINY_RENDERING_KWARGS, _fake_batch
    from invertavatar_tpu.train.loop_inversion import (
        make_fewshot_d_step,
        make_fewshot_train_step,
        masked_adam,
        unet_decoder_trainable,
    )
    from invertavatar_tpu.train.state import TrainState

    gen_cfg = dict(
        z_dim=32, c_dim=25, w_dim=512, img_resolution=128, img_channels=3,
        rendering_kwargs=dict(TINY_RENDERING_KWARGS, depth_resolution=6,
                              depth_resolution_importance=6),
        neural_rendering_resolution=32, channel_base=1024, channel_max=64,
        map_num_layers=2,
    )
    # tiny texture taps: [img32(32ch), x32(32), x64(16), x128(8)]
    net = InversionNet(generator_cfg=gen_cfg, texture_out_channels=(32, 32, 16, 8))
    rng = jax.random.PRNGKey(0)
    rngs = {"params": rng, "buffers": jax.random.fold_in(rng, 1),
            "noise": jax.random.fold_in(rng, 2), "ray": jax.random.fold_in(rng, 3)}

    B, T = 1, 2
    raw = _fake_batch(np.random.RandomState(0), batch=1, res=256, z_dim=32)
    uvc = jnp.tile(jnp.asarray(raw["v"]["uvcoords_image"])[:, None], (1, T, 1, 1, 1))
    batch = {
        "image": jnp.tile(jnp.asarray(raw["image"])[:, None], (1, T, 1, 1, 1)),
        "c": jnp.tile(jnp.asarray(raw["c"])[:, None], (1, T, 1)),
        "v": {"uvcoords_image": uvc},
        "uv": jnp.zeros((B, T, 256, 256, 6), jnp.float32),
        "z": jnp.asarray(raw["z"]),
    }

    variables = net.init(
        rngs, batch["image"], batch["c"], batch["v"], batch["uv"], None,
        method=lambda m, f, c, v, uv, ws: m.run_seq(f, c, v, uv, ws=ws),
    )
    # run_seq never touches generator.mapping; graft its params from a full init
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
    weights = InversionLossWeights(l1=1.0, lpips=0.0, id=0.0, raw_l1=1.0, tri=0.001,
                                   lr_lpips=0.0, adv=0.01)
    tx = masked_adam(1e-4, unet_decoder_trainable)
    state = TrainState(variables["params"],
                       tx.init(variables["params"]),
                       {k: v for k, v in variables.items() if k != "params"})
    # host-side orchestrator over jitted sub-programs — no outer jit wrap
    step = make_fewshot_train_step(net, lambda a, b: jnp.mean(jnp.abs(a - b)), tx, weights)
    s1, aux1 = step(state, batch, jax.random.PRNGKey(1), do_igen=False)
    s2, aux2 = step(s1, batch, jax.random.PRNGKey(2), do_igen=True)
    for k, v in {**aux1, **aux2}.items():
        assert np.isfinite(float(v)), k
    # trunk frozen, decoder trains
    t0 = jax.tree_util.tree_leaves(state.params["unet_encoder"]["texture_unet"]["body"])
    t1 = jax.tree_util.tree_leaves(s2.params["unet_encoder"]["texture_unet"]["body"])
    for a, b in zip(t0, t1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    d0 = jax.tree_util.tree_leaves(state.params["unet_encoder"]["texture_unet"]["up2"])
    d1 = jax.tree_util.tree_leaves(s2.params["unet_encoder"]["texture_unet"]["up2"])
    assert any(np.abs(np.asarray(a) - np.asarray(b)).max() > 0 for a, b in zip(d0, d1))

    # D phase
    D = DualDiscriminator(c_dim=25, img_resolution=128, img_channels=6,
                          channel_base=1024, channel_max=64, num_fp16_res=0)
    d_vars = D.init(rngs, {"image": jnp.zeros((1, 128, 128, 3)),
                           "image_raw": jnp.zeros((1, 32, 32, 3))}, jnp.zeros((1, 25)))
    d_tx = optax.adam(2e-4)
    d_state = TrainState(d_vars["params"], d_tx.init(d_vars["params"]),
                         {k: v for k, v in d_vars.items() if k != "params"})
    d_step = make_fewshot_d_step(net, D, d_tx, weights)
    new_d, d_aux = d_step(s2, d_state, batch, jax.random.PRNGKey(3), do_r1=True)
    for k, v in d_aux.items():
        assert np.isfinite(float(v)), k
    # D params moved
    d0 = jax.tree_util.tree_leaves(d_state.params)
    d1 = jax.tree_util.tree_leaves(new_d.params)
    assert any(np.abs(np.asarray(a) - np.asarray(b)).max() > 0 for a, b in zip(d0, d1))


@pytest.mark.slow
def test_oneshot_subtree_tx_update_parity():
    """`subtree_tx` (subtree-local update program: subtree params/opt/grads
    in, subtree out, host-side splice) matches the masked full-tree update —
    the HBM lever that finally let the literal one-shot step execute on chip
    (no 3 GB zeros reconstitution; frozen siblings need not be device-
    resident). Equivalence holds because the adam mask selects exactly the
    grad subtree (oneshot_tex_trainable ≡ 'unet_encoder/texture_unet')."""
    import optax

    from invertavatar_tpu.train.loop_inversion import make_oneshot_grad_programs
    from invertavatar_tpu.train.state import TrainState

    net, D, state, d_state, batch, tx, d_tx, weights = _tiny_oneshot_setup()
    l1 = lambda a, b: jnp.mean(jnp.abs(a - b))
    sub = "unet_encoder/texture_unet"
    base = make_oneshot_grad_programs(net, D, l1, None, tx, d_tx, weights,
                                      grad_subtree=sub)
    # NOTE: _tiny_oneshot_setup's tx is masked_adam(lr, oneshot_tex_trainable);
    # mirror its inner adam hyperparameters for the subtree optimizer
    sub_tx = optax.adam(1e-4)
    subu = make_oneshot_grad_programs(net, D, l1, None, tx, d_tx, weights,
                                      grad_subtree=sub, subtree_tx=sub_tx)
    sub_state = TrainState(
        state.params, sub_tx.init(subu.train_sub(state.params)), state.buffers
    )

    for phase, key in (("Igen", 1), ("Ireal", 2)):
        rng = jax.random.PRNGKey(key)
        b_state, _, b_aux = base(state, d_state, batch, rng, phase=phase)
        s_state, _, s_aux = subu(sub_state, d_state, batch, rng, phase=phase)
        for k in b_aux:
            np.testing.assert_allclose(float(b_aux[k]), float(s_aux[k]),
                                       rtol=2e-5, atol=1e-7, err_msg=f"{phase}:{k}")
        fb = jax.tree_util.tree_flatten_with_path(b_state.params)[0]
        fs = jax.tree_util.tree_flatten_with_path(s_state.params)[0]
        assert len(fb) == len(fs)
        for (pb, ab), (ps, as_) in zip(fb, fs):
            assert pb == ps
            np.testing.assert_allclose(
                np.asarray(ab), np.asarray(as_), rtol=1e-5, atol=1e-6,
                err_msg=f"{phase}:{jax.tree_util.keystr(pb)}",
            )


@pytest.mark.slow
def test_ar_forward_bf16_unets_close():
    """`unet_eval_dtype=bf16` (the absorb fast path, bench_extra.py) stays
    close to the fp32 reference path: the irse primitives propagate the input
    dtype, so this gates the ONLY numeric deviation — bf16 conv/GRU compute.
    Offsets re-enter the fp32 feature path, so closeness of the updated
    texture/static features is the end-to-end criterion."""
    from invertavatar_tpu.models.encoders.uvnet import InversionNet
    from invertavatar_tpu.train.dryrun import TINY_RENDERING_KWARGS, _fake_batch

    gen_cfg = dict(
        z_dim=32, c_dim=25, w_dim=512, img_resolution=128, img_channels=3,
        rendering_kwargs=dict(TINY_RENDERING_KWARGS, depth_resolution=6,
                              depth_resolution_importance=6),
        neural_rendering_resolution=32, channel_base=1024, channel_max=64,
        map_num_layers=2,
    )
    rng = jax.random.PRNGKey(0)
    rngs = {"params": rng, "buffers": jax.random.fold_in(rng, 1),
            "noise": jax.random.fold_in(rng, 2), "ray": jax.random.fold_in(rng, 3)}
    T = 2
    raw = _fake_batch(np.random.RandomState(0), batch=T, res=256, z_dim=32)
    x = {"image": jnp.asarray(raw["image"]), "uv": jnp.zeros((T, 256, 256, 6))}
    vid_c = jnp.asarray(raw["c"])
    vid_v = {"uvcoords_image": jnp.asarray(raw["v"]["uvcoords_image"])}

    outs = {}
    for name, dt in (("fp32", None), ("bf16", jnp.bfloat16)):
        net = InversionNet(generator_cfg=gen_cfg,
                           texture_out_channels=(32, 32, 16, 8),
                           unet_eval_dtype=dt)
        variables = net.init(
            rngs, x, vid_c, vid_v, None, [None, None],
            method=lambda m, x, c, v, ws, r: m.ar_forward(x, c, v, ws, r),
        )
        upd, r_list = net.apply(
            variables, x, vid_c, vid_v, None, [None, None],
            method=lambda m, x, c, v, ws, r: m.ar_forward(x, c, v, ws, r),
            rngs={"ray": jax.random.PRNGKey(9), "noise": jax.random.PRNGKey(10)},
        )
        # second chunk with carried state: the GRU states cross the chunk
        # boundary in dt — covered by the closeness check below
        upd2, _ = net.apply(
            variables, x, vid_c, vid_v, upd["w"], r_list,
            method=lambda m, x, c, v, ws, r: m.ar_forward(x, c, v, ws, r),
            rngs={"ray": jax.random.PRNGKey(9), "noise": jax.random.PRNGKey(10)},
        )
        outs[name] = upd2

    for kind in ("texture", "static"):
        for i, (a, b) in enumerate(zip(outs["fp32"][kind], outs["bf16"][kind])):
            a, b = np.asarray(a), np.asarray(b)
            assert np.isfinite(b).all(), (kind, i)
            scale = np.abs(a).max() + 1e-6
            rel = np.abs(a - b).max() / scale
            assert rel < 0.05, (kind, i, rel)


@pytest.mark.slow
def test_ar_forward_streaming_tiny():
    """ar_forward carries GRU state across chunks (uvnet.py:160-203)."""
    from invertavatar_tpu.models.encoders.uvnet import InversionNet
    from invertavatar_tpu.train.dryrun import TINY_RENDERING_KWARGS, _fake_batch

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

    T = 2
    raw = _fake_batch(np.random.RandomState(0), batch=T, res=256, z_dim=32)
    x = {"image": jnp.asarray(raw["image"]), "uv": jnp.zeros((T, 256, 256, 6))}
    vid_c = jnp.asarray(raw["c"])
    vid_v = {"uvcoords_image": jnp.asarray(raw["v"]["uvcoords_image"])}

    variables = net.init(
        rngs, x, vid_c, vid_v, None, [None, None],
        method=lambda m, x, c, v, ws, r: m.ar_forward(x, c, v, ws, r),
    )
    apply = jax.jit(
        lambda vr, x, c, v, ws, r0, r1: net.apply(
            vr, x, c, v, ws, [r0, r1],
            method=lambda m, x, c, v, ws, r: m.ar_forward(x, c, v, ws, r),
            rngs={"ray": jax.random.PRNGKey(9), "noise": jax.random.PRNGKey(10)},
        )
    )
    # chunk 1: fresh state
    upd1, r_list1 = apply(variables, x, vid_c, vid_v, None, None, None)
    assert set(upd1.keys()) == {"w", "texture", "static"}
    assert upd1["w"].shape[1:] == (14, 512)
    # chunk 2: carried state gives different features than fresh state
    upd2, r_list2 = apply(variables, x, vid_c, vid_v, upd1["w"], r_list1[0], r_list1[1])
    upd2f, _ = apply(variables, x, vid_c, vid_v, upd1["w"], None, None)
    d = max(float(jnp.abs(a - b).max()) for a, b in zip(upd2["texture"], upd2f["texture"]))
    assert np.isfinite(d) and d > 0
    for f in upd2["texture"] + upd2["static"]:
        assert np.all(np.isfinite(np.asarray(f)))


def _tiny_oneshot_setup():
    """Tiny segformer one-shot net + D + batch (shared by the step tests)."""
    import optax

    from invertavatar_tpu.models.discriminator import DualDiscriminator
    from invertavatar_tpu.models.encoders.uvnet import InversionNet
    from invertavatar_tpu.train.dryrun import TINY_RENDERING_KWARGS, _fake_batch
    from invertavatar_tpu.train.loop_inversion import (
        masked_adam,
        oneshot_tex_trainable,
    )
    from invertavatar_tpu.train.state import TrainState

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
    # forward never touches generator.mapping; graft from a full-G init
    gen_vars = net.init(rngs, batch["z"], batch["c"], batch["v"],
                        method=lambda m, z, cc, v: m.generator(z, cc, v))
    variables = dict(variables)
    variables["params"] = dict(variables["params"])
    variables["params"]["generator"] = dict(variables["params"]["generator"])
    variables["params"]["generator"]["backbone"] = gen_vars["params"]["generator"]["backbone"]
    variables["buffers"] = dict(variables["buffers"])
    variables["buffers"]["generator"] = gen_vars["buffers"]["generator"]
    weights = InversionLossWeights(l1=1.0, lpips=0.0, id=0.0, raw_l1=1.0,
                                   tri=0.001, texture=0.001, adv=0.01)
    tx = masked_adam(1e-4, oneshot_tex_trainable)
    D = DualDiscriminator(c_dim=25, img_resolution=128, img_channels=6,
                          channel_base=1024, channel_max=64, num_fp16_res=0)
    d_vars = D.init(rngs, {"image": jnp.zeros((1, 128, 128, 3)),
                           "image_raw": jnp.zeros((1, 32, 32, 3))}, jnp.zeros((1, 25)))
    d_tx = optax.adam(2e-4)
    d_state = TrainState(d_vars["params"], d_tx.init(d_vars["params"]),
                         {k: v for k, v in d_vars.items() if k != "params"})
    state = TrainState(variables["params"], tx.init(variables["params"]),
                       {k: v for k, v in variables.items() if k != "params"})
    return net, D, state, d_state, batch, tx, d_tx, weights


@pytest.mark.slow
def test_oneshot_step_tiny():
    """Igen + Ireal + Dgen phases through the segformer one-shot net."""
    from invertavatar_tpu.train.loop_inversion import make_oneshot_train_step

    net, D, state, d_state, batch, tx, d_tx, weights = _tiny_oneshot_setup()
    step = jax.jit(
        make_oneshot_train_step(net, D, lambda a, b: jnp.mean(jnp.abs(a - b)), None,
                                tx, d_tx, weights),
        static_argnames=("phase", "do_r1"),
    )
    s1, d1, aux1 = step(state, d_state, batch, jax.random.PRNGKey(1), phase="Igen")
    s2, d2, aux2 = step(s1, d1, batch, jax.random.PRNGKey(2), phase="Ireal")
    s3, d3, aux3 = step(s2, d2, batch, jax.random.PRNGKey(3), phase="Dgen", do_r1=True)
    for k, v in {**aux1, **aux2, **aux3}.items():
        assert np.isfinite(float(v)), k
    # texture unet trained; triplane unet frozen under the tex mask
    t0 = jax.tree_util.tree_leaves(state.params["unet_encoder"]["texture_unet"])
    t1 = jax.tree_util.tree_leaves(s2.params["unet_encoder"]["texture_unet"])
    assert any(np.abs(np.asarray(a) - np.asarray(b)).max() > 0 for a, b in zip(t0, t1))
    f0 = jax.tree_util.tree_leaves(state.params["unet_encoder"]["triplane_unet"])
    f1 = jax.tree_util.tree_leaves(s2.params["unet_encoder"]["triplane_unet"])
    for a, b in zip(f0, f1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _tiny_fewshot_net_and_batch(T=4):
    """Tiny InversionNet + a T-frame clip batch (shared by the multiT tests)."""
    from invertavatar_tpu.models.encoders.uvnet import InversionNet
    from invertavatar_tpu.train.dryrun import TINY_RENDERING_KWARGS, _fake_batch

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
    # per-frame variation so the GRU sees a non-constant sequence
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
    variables = net.init(
        rngs, batch["image"], batch["c"], batch["v"], batch["uv"], None,
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
    return net, variables, batch


@pytest.mark.slow
def test_run_seq_multiT_rollout():
    """run_seq_multiT: finite outputs; the no-grad prefix chunk's GRU state
    changes the final chunk's result (video_loss.py:289-357 semantics).

    Runs EAGER (disable_jit): this is the semantic oracle for the MONOLITHIC
    eval composition (one graph with ~4 generator forwards — still XLA-CPU
    compile-bound on a 1-core host). The jit-compiled TRAINING path over the
    same building blocks is covered by test_fewshot_step_multiT_tiny, which
    runs fully jitted."""
    with jax.disable_jit():
        _run_seq_multiT_rollout_body()


@pytest.mark.slow
def test_fewshot_step_multiT_tiny():
    """JITTED multi-T step: T=4, frm_per_chunk=2 drives the prefix-chunk
    programs (chunk_inputs, chunk_state with carried GRU state) and the
    gradient suffix with non-None r states plus Igen chunk-gradient
    accumulation (VERDICT r2 #1 done-criterion: the restructured step
    compiles under jit in the CPU-mesh suite)."""
    import optax

    from invertavatar_tpu.train.loop_inversion import (
        make_fewshot_train_step,
        masked_adam,
        unet_decoder_trainable,
    )
    from invertavatar_tpu.train.state import TrainState

    net, variables, batch = _tiny_fewshot_net_and_batch(T=4)
    weights = InversionLossWeights(l1=1.0, lpips=0.0, id=0.0, raw_l1=1.0, tri=0.001,
                                   lr_lpips=0.0, adv=0.0)
    tx = masked_adam(1e-4, unet_decoder_trainable)
    state = TrainState(variables["params"], tx.init(variables["params"]),
                       {k: v for k, v in variables.items() if k != "params"})
    step = make_fewshot_train_step(net, lambda a, b: jnp.mean(jnp.abs(a - b)), tx, weights,
                                   frm_per_chunk=2)
    s1, aux1 = step(state, batch, jax.random.PRNGKey(1), do_igen=False, multiT=True,
                    fake_idx=jnp.asarray([0, 3]))
    s2, aux2 = step(s1, batch, jax.random.PRNGKey(2), do_igen=True, multiT=True)
    for k, v in {**aux1, **aux2}.items():
        assert np.isfinite(float(v)), k
    # decoders moved, trunks frozen
    t0 = jax.tree_util.tree_leaves(state.params["unet_encoder"]["texture_unet"]["body"])
    t1 = jax.tree_util.tree_leaves(s2.params["unet_encoder"]["texture_unet"]["body"])
    for a, b in zip(t0, t1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    d0 = jax.tree_util.tree_leaves(state.params["unet_encoder"]["texture_unet"]["up2"])
    d1 = jax.tree_util.tree_leaves(s2.params["unet_encoder"]["texture_unet"]["up2"])
    assert any(np.abs(np.asarray(a) - np.asarray(b)).max() > 0 for a, b in zip(d0, d1))


def _run_seq_multiT_rollout_body():
    net, variables, batch = _tiny_fewshot_net_and_batch(T=4)
    rngs = {"ray": jax.random.PRNGKey(9), "noise": jax.random.PRNGKey(10)}

    def run(frames, idx):
        return net.apply(
            variables, frames, batch["c"], batch["v"], batch["uv"],
            method=lambda m, f, c, v, uv: m.run_seq_multiT(
                f, c, v, uv, frm_per_chunk=2, return_idx=idx
            ),
            rngs=rngs,
        )

    run_j = jax.jit(lambda f: run(f, jnp.asarray([0, 3])))
    out = run_j(batch["image"])
    assert out["image"].shape[:2] == (1, 2)
    assert np.all(np.isfinite(np.asarray(out["image"])))

    # perturb only the PREFIX chunk (frames 0-1): the carried GRU state must
    # change the final render even though the last chunk's inputs are identical
    frames2 = batch["image"].at[:, 0:2].add(0.25)
    out2 = run_j(frames2)
    # ws comes from frame 0 which changed; pin ws to isolate the GRU effect
    ws = net.apply(variables, batch["image"][:, 0],
                   method=lambda m, x: m.encode(x), rngs=rngs)
    run_ws = jax.jit(lambda f: net.apply(
        variables, f, batch["c"], batch["v"], batch["uv"], jnp.asarray([0, 3]), ws,
        method=lambda m, f, c, v, uv, idx, w: m.run_seq_multiT(
            f, c, v, uv, frm_per_chunk=2, return_idx=idx, ws=w
        ),
        rngs=rngs,
    ))
    o1 = run_ws(batch["image"])
    o2 = run_ws(frames2)
    d = float(jnp.abs(o1["image"] - o2["image"]).max())
    assert np.isfinite(d) and d > 0, "prefix chunk state must affect the final chunk"


@pytest.mark.slow
def test_fewshot_driver_multiT_curriculum(tmp_path):
    """train_fewshot: phase machine with both param groups, Igen alternation,
    snapshot + bitwise resume (VERDICT r1 #4/#7). Runs JITTED through the
    program-split step; compile surface is kept to what this test uniquely
    exercises: T pinned to 2 and no "z" in the batch (Ireal-only — the Igen/D
    step programs are covered by test_fewshot_step_tiny; the chunked-prefix
    semantics by test_fewshot_step_multiT_tiny)."""
    _fewshot_driver_body(tmp_path)


def _fewshot_driver_body(tmp_path):
    from invertavatar_tpu.train.loop_inversion import InversionTrainConfig, train_fewshot

    net, variables, batch = _tiny_fewshot_net_and_batch(T=2)
    batch.pop("z")

    def it():
        while True:
            yield batch

    weights = InversionLossWeights(l1=1.0, lpips=0.0, id=0.0, raw_l1=1.0, tri=0.001,
                                   lr_lpips=0.0, adv=0.0)
    cfg = InversionTrainConfig(run_dir=str(tmp_path / "run"), batch_size=1,
                               lr=1e-4, weights=weights, seed=3)
    state, _ = train_fewshot(
        net, variables, it(), cfg, lambda a, b: jnp.mean(jnp.abs(a - b)),
        max_steps=4, multiT=(2, 2, 2), frm_per_chunk=2,
    )
    # 4 steps = tri/tex alternation hit both groups; decoders moved, trunks frozen
    for unet in ("texture_unet", "triplane_unet"):
        a = jax.tree_util.tree_leaves(variables["params"]["unet_encoder"][unet]["body"])
        b = jax.tree_util.tree_leaves(state.params["unet_encoder"][unet]["body"])
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        a = jax.tree_util.tree_leaves(variables["params"]["unet_encoder"][unet]["up2"])
        b = jax.tree_util.tree_leaves(state.params["unet_encoder"][unet]["up2"])
        assert any(np.abs(np.asarray(x) - np.asarray(y)).max() > 0 for x, y in zip(a, b))

    # resume: 4 steps straight == 2 steps + snapshot + 2 resumed steps (bitwise)
    cfg2 = InversionTrainConfig(run_dir=str(tmp_path / "run2"), batch_size=1,
                                lr=1e-4, weights=weights, seed=3)
    train_fewshot(net, variables, it(), cfg2, lambda a, b: jnp.mean(jnp.abs(a - b)),
                  max_steps=2, multiT=(2, 2, 2), frm_per_chunk=2)
    cfg3 = InversionTrainConfig(run_dir=str(tmp_path / "run3"), batch_size=1,
                                lr=1e-4, weights=weights, seed=3)
    state_r, _ = train_fewshot(
        net, variables, it(), cfg3, lambda a, b: jnp.mean(jnp.abs(a - b)),
        max_steps=4, multiT=(2, 2, 2), frm_per_chunk=2,
        resume_dir=str(tmp_path / "run2" / "snapshot-final"),
    )
    for x, y in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(state_r.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_fewshot_step_dp_mesh():
    """DP-sharded few-shot step on the virtual mesh (VERDICT r3 #2).

    Delegates to train/dryrun.py:run_dryrun_inversion — the same entry the
    driver contract (__graft_entry__.dryrun_multichip) executes at 8 devices —
    which asserts (a) the clip batch is committed with 'data' on its leading
    axis, (b) losses are finite, and (c) params after the update are bitwise
    identical across replicas (the reference's check_ddp_consistency,
    torch_utils/misc.py:202)."""
    from invertavatar_tpu.train.dryrun import run_dryrun_inversion

    metrics = run_dryrun_inversion(2, devices=jax.devices()[:2])
    assert any(k.startswith("Ireal/") for k in metrics)
    assert any(k.startswith("Igen/") for k in metrics)


@pytest.mark.slow
def test_e4e_step_dp_mesh():
    """The monolithic e4e train step partitions under a batch-sharded mesh:
    grads (and therefore updated params) come out replicated because every
    loss term is a global batch mean (reference trains e4e at --gpus=8,
    train_inversion.sh:7)."""
    import optax

    from invertavatar_tpu.models.encoders.e4e import LatentCodesDiscriminator
    from invertavatar_tpu.models.encoders.uvnet import InversionNet
    from invertavatar_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from invertavatar_tpu.train.dryrun import TINY_RENDERING_KWARGS, _fake_batch
    from invertavatar_tpu.train.loop_inversion import (
        e4e_trainable,
        make_e4e_train_step,
        masked_adam,
    )
    from invertavatar_tpu.train.state import TrainState

    mesh = make_mesh(devices=jax.devices()[:2])
    gen_cfg = dict(
        z_dim=32, c_dim=25, w_dim=512, img_resolution=128, img_channels=3,
        rendering_kwargs=dict(TINY_RENDERING_KWARGS, depth_resolution=6,
                              depth_resolution_importance=6),
        neural_rendering_resolution=32, channel_base=1024, channel_max=64,
        map_num_layers=2,
    )
    net = InversionNet(generator_cfg=gen_cfg)
    rng = jax.random.PRNGKey(0)
    rngs = {"params": rng, "buffers": jax.random.fold_in(rng, 1),
            "noise": jax.random.fold_in(rng, 2), "ray": jax.random.fold_in(rng, 3)}
    B = 2
    raw = _fake_batch(np.random.RandomState(0), batch=B, res=256, z_dim=32)
    batch = {
        "image": jnp.asarray(raw["image"]),
        "c": jnp.asarray(raw["c"]),
        "v": {"uvcoords_image": jnp.asarray(raw["v"]["uvcoords_image"])},
        "z": jnp.asarray(raw["z"]),
    }
    enc_vars = net.init(rngs, jnp.zeros((1, 256, 256, 3)), method=lambda m, x: m.encode(x))
    gen_vars = net.init(rngs, batch["z"][:1], batch["c"][:1],
                        {"uvcoords_image": batch["v"]["uvcoords_image"][:1]},
                        method=lambda m, z, cc, v: m.generator(z, cc, v))
    params = dict(enc_vars["params"])
    params["generator"] = gen_vars["params"]["generator"]
    buffers = {"buffers": {**{k: v for k, v in enc_vars.get("buffers", {}).items()},
                           "generator": gen_vars["buffers"]["generator"]}}
    if "batch_stats" in enc_vars:
        buffers["batch_stats"] = enc_vars["batch_stats"]

    weights = InversionLossWeights(l1=1.0, lpips=0.0, id=0.0, w_delta=0.001,
                                   w_discriminator=0.01, raw_l1=1.0, tri=0.001)
    tx = masked_adam(1e-4, e4e_trainable)
    wd = LatentCodesDiscriminator()
    wd_tx = optax.adam(2e-5)
    step = jax.jit(
        make_e4e_train_step(net, wd, lambda a, b: jnp.mean(jnp.abs(a - b)), None,
                            tx, wd_tx, weights),
        static_argnames=("do_wd_reg",),
    )
    state = TrainState(params, tx.init(params), buffers)
    wd_vars = wd.init(jax.random.PRNGKey(1), jnp.zeros((1, 512)))
    wd_state = TrainState(wd_vars["params"], wd_tx.init(wd_vars["params"]), {})

    state = replicate(mesh, state)
    wd_state = replicate(mesh, wd_state)
    batch_dev = shard_batch(mesh, batch)
    assert batch_dev["image"].sharding.spec[0] == "data"

    s1, wd1, aux = step(state, wd_state, batch_dev, jax.random.PRNGKey(2), do_wd_reg=True)
    jax.block_until_ready(jax.tree_util.tree_leaves(s1.params)[0])
    for k, v in aux.items():
        assert np.isfinite(float(v)), k
    leaf = jax.tree_util.tree_leaves(s1.params["encoder"])[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    assert len(shards) == 2
    np.testing.assert_array_equal(shards[0], shards[1])


@pytest.mark.slow
def test_fewshot_fast_nograd_render():
    """`fast_no_grad="exact"` routes the no-grad renders (Igen targets /
    chunk-prefix e4e renders) through the exact windowed Pallas sampler with
    pooled+det sampling (train/fast_render.py rationale: the generator is
    frozen in this stage). The interpret-mode kernel render must match the
    SAME-sampling XLA windowed formulation to float tolerance."""
    from invertavatar_tpu.train.fast_render import FAST_GRAD_STRUCTURED
    from invertavatar_tpu.train.loop_inversion import FewshotPrograms

    net, variables, batch = _tiny_fewshot_net_and_batch(T=1)
    weights = InversionLossWeights(l1=1.0, lpips=0.0, id=0.0, raw_l1=1.0, tri=0.001,
                                   lr_lpips=0.0, adv=0.0)
    params = variables["params"]
    buffers = {k: v for k, v in variables.items() if k != "params"}
    l1 = lambda a, b: jnp.mean(jnp.abs(a - b))

    progs_fast = FewshotPrograms(net, l1, weights, fast_no_grad="exact",
                                 fast_interpret=True)
    rng = jax.random.PRNGKey(3)
    ws = progs_fast.encode(params, buffers, batch["image"][:, 0], rng)
    tex, static = progs_fast.feats(params, buffers, ws, rng)
    out_fast = progs_fast.render(params, buffers, ws, tex, static,
                                 batch["c"][:, :1],
                                 {"uvcoords_image": batch["v"]["uvcoords_image"][:, :1]},
                                 rng)
    for k, val in out_fast.items():
        assert np.all(np.isfinite(np.asarray(val))), k

    # same sampling geometry through the XLA windowed sampler (no Pallas)
    def render_xla(params, buffers, ws, tex, static, c_t, v_t, rng):
        return net.apply(
            {"params": params, **buffers}, ws, tex, c_t, v_t, static,
            method=lambda m, w, t, cc, vv, s: m.generator.synthesis_withTexture(
                w, t, cc, vv, static_feats=s, noise_mode="const",
                evaluation=True, rendering_overrides=dict(FAST_GRAD_STRUCTURED),
            ),
            rngs={"noise": jax.random.fold_in(rng, 0),
                  "ray": jax.random.fold_in(rng, 1)},
        )

    ref = jax.jit(render_xla)(params, buffers, ws, tex, static, batch["c"][:, 0],
                              {"uvcoords_image": batch["v"]["uvcoords_image"][:, 0]},
                              jax.random.fold_in(rng, 0))
    np.testing.assert_allclose(
        np.asarray(out_fast["image"]), np.asarray(ref["image"]), atol=5e-4,
        err_msg="exact Pallas fast path vs same-sampling XLA windowed render",
    )


@pytest.mark.slow
def test_fast_grad_pallas_matches_structured():
    """fast_grad="pallas" (custom-VJP Pallas sampler, interpret mode) must
    match fast_grad="structured" (XLA windowed formulation) in both the
    render VALUE and the GRADIENT w.r.t. the texture features — identical
    sampling (det + pooled), two exact sampler implementations. This is the
    grad path render_loss_cot1 takes on TPU."""
    from invertavatar_tpu.train.fast_render import grad_overrides

    net, variables, batch = _tiny_fewshot_net_and_batch(T=1)
    params = variables["params"]
    buffers = {k: v for k, v in variables.items() if k != "params"}
    rng = jax.random.PRNGKey(5)
    rngs = {"noise": jax.random.fold_in(rng, 0), "ray": jax.random.fold_in(rng, 1)}

    def feats(ws):
        def run(m, w):
            tex = m.generator.texture_backbone.synthesis(w, return_list=True, noise_mode="const")
            static = m.generator.backbone.synthesis(w, return_list=True, noise_mode="const")
            return tex, static

        return net.apply({"params": params, **buffers}, ws, method=run, rngs=rngs)

    ws = net.apply({"params": params, **buffers}, batch["image"][:, 0],
                   method=lambda m, x: m.encode(x), rngs=rngs)
    tex, static = feats(ws)
    c0 = batch["c"][:, 0]
    v0 = {"uvcoords_image": batch["v"]["uvcoords_image"][:, 0]}
    target = batch["image"][:, 0, ..., :3]
    from invertavatar_tpu.ops.resize import resize_bilinear

    def loss_with(ov):
        def f(tex_in):
            out = net.apply(
                {"params": params, **buffers}, ws, tex_in, c0, v0, static,
                method=lambda m, w, t, cc, vv, s: m.generator.synthesis_withTexture(
                    w, t, cc, vv, static_feats=s, noise_mode="const",
                    rendering_overrides=ov,
                ),
                rngs=rngs,
            )
            img = out["image"]
            tgt = target
            if img.shape[1] != tgt.shape[1]:
                tgt = resize_bilinear(tgt, img.shape[1:3], antialias=True)
            return jnp.mean(jnp.abs(img - tgt))

        return jax.value_and_grad(f)(list(tex))

    v_s, g_s = jax.jit(lambda: loss_with(grad_overrides("structured", interpret=True)))()
    v_p, g_p = jax.jit(lambda: loss_with(grad_overrides("pallas", interpret=True)))()
    np.testing.assert_allclose(float(v_p), float(v_s), rtol=1e-5, atol=1e-6)
    ls, lp = jax.tree_util.tree_leaves(g_s), jax.tree_util.tree_leaves(g_p)
    assert len(ls) == len(lp)
    total = 0.0
    for a, b in zip(ls, lp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-4, rtol=1e-3)
        total += float(jnp.sum(jnp.abs(a)))
    assert total > 0.0  # gradients actually flow into the texture pyramid


@pytest.mark.slow
def test_oneshot_grad_programs_parity():
    """The per-phase split (make_oneshot_grad_programs) matches the monolithic
    one-shot step: same losses and (numerically) the same params after one
    Igen and one Ireal step from the same state. The split is what runs on
    the v5e — the monolithic Igen program reproducibly killed the remote
    compile helper (docs/train_tpu_run.json oneshot_B1)."""
    from invertavatar_tpu.train.loop_inversion import (
        make_oneshot_grad_programs,
        make_oneshot_train_step,
    )

    net, D, state, d_state, batch, tx, d_tx, weights = _tiny_oneshot_setup()
    l1 = lambda a, b: jnp.mean(jnp.abs(a - b))
    mono = jax.jit(make_oneshot_train_step(net, D, l1, None, tx, d_tx, weights),
                   static_argnames=("phase", "do_r1"))
    split = make_oneshot_grad_programs(net, D, l1, None, tx, d_tx, weights)

    for phase, key in (("Igen", 1), ("Ireal", 2)):
        rng = jax.random.PRNGKey(key)
        m_state, _, m_aux = mono(state, d_state, batch, rng, phase=phase)
        s_state, _, s_aux = split(state, d_state, batch, rng, phase=phase)
        assert set(m_aux) == set(s_aux), (phase, set(m_aux) ^ set(s_aux))
        for k in m_aux:
            np.testing.assert_allclose(float(m_aux[k]), float(s_aux[k]),
                                       rtol=2e-4, atol=1e-6, err_msg=f"{phase}:{k}")
        fm = jax.tree_util.tree_flatten_with_path(m_state.params)[0]
        fs = jax.tree_util.tree_flatten_with_path(s_state.params)[0]
        for (pm, am), (ps, bs) in zip(fm, fs):
            assert pm == ps
            np.testing.assert_allclose(
                np.asarray(am), np.asarray(bs), rtol=1e-4, atol=1e-5,
                err_msg=f"{phase}:{jax.tree_util.keystr(pm)}",
            )
