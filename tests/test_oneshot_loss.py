"""One-shot U-Net stage losses + FusionVideoDiscriminator/time encoders."""

import os
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

REF = "/root/reference"
HAVE_REF = os.path.isdir(REF)
if HAVE_REF and REF not in sys.path:
    sys.path.insert(0, REF)

from invertavatar_tpu.train.inversion import (
    InversionLossWeights,
    oneshot_d_loss,
    oneshot_igen_loss,
    oneshot_ireal_loss,
)
from invertavatar_tpu.train.loop_inversion import oneshot_phase_schedule


def test_phase_schedule():
    seq = [oneshot_phase_schedule(i, d_reg_interval=4) for i in range(8)]
    assert [s[0] for s in seq] == ["Ireal", "Ireal", "Igen", "Igen"] * 2
    assert [s[1] for s in seq] == ["tri", "tex"] * 4
    assert [s[2] for s in seq] == ["Dreal", "Dreal", "Dgen", "Dgen"] * 2
    assert [s[3] for s in seq] == [True, False, False, False] * 2


def _mock_world(bias):
    B, H = 1, 32

    def inv_forward(x, c, v, return_feats):
        img = x["image"][..., :3] + bias
        out = {
            "image": img,
            "feature_image": jnp.tile(
                jax.image.resize(img, (B, 128, 128, 3), "linear"), (1, 1, 1, 2)
            ),
            "triplane": jnp.zeros((B, 3, 8, 8, 4)) + bias[0],
            "texture": [jnp.zeros((B, 4, 4, 2)) + bias[1]],
        }
        return out

    def gen_mapping(z, c, truncation_psi=1.0):
        return jnp.zeros((B, 14, 16))

    def gen_synth(ws, c, v):
        img = jnp.zeros((B, H, H, 3))
        return {
            "image": img,
            "feature_image": jnp.zeros((B, 128, 128, 6)),
            "triplane": jnp.zeros((B, 3, 8, 8, 4)),
            "texture": [jnp.zeros((B, 4, 4, 2))],
        }

    return inv_forward, gen_mapping, gen_synth


def test_oneshot_losses_and_grads():
    bias = jnp.asarray([0.1, -0.2, 0.05])
    w = InversionLossWeights(l1=1.0, lpips=0.0, id=0.0, raw_l1=1.0, tri=1.0,
                             texture=1.0, adv=0.0)
    inv_forward, gen_mapping, gen_synth = _mock_world(bias)
    total, aux = oneshot_igen_loss(
        inv_forward, gen_mapping, gen_synth, None, lambda a, b: jnp.float32(0.0),
        None, w, jnp.zeros((1, 16)), jnp.zeros((1, 25)), {}, None,
    )
    assert abs(float(aux["l1"]) - float(jnp.mean(jnp.abs(bias)))) < 1e-5
    assert abs(float(aux["tri"]) - 0.1) < 1e-6
    assert abs(float(aux["texture"]) - 0.2) < 1e-6

    def loss_of(b):
        iv, gm, gs = _mock_world(b)
        t, _ = oneshot_igen_loss(iv, gm, gs, None, lambda a, bb: jnp.float32(0.0),
                                 None, w, jnp.zeros((1, 16)), jnp.zeros((1, 25)), {}, None)
        return t

    g = jax.grad(loss_of)(bias)
    assert np.all(np.isfinite(np.asarray(g))) and np.abs(np.asarray(g)).max() > 0

    # Ireal with a mask channel composites fake onto the real background
    rng = np.random.RandomState(0)
    real = jnp.asarray(rng.rand(1, 32, 32, 4).astype(np.float32))
    real = real.at[..., 3].set(0.0)  # mask everywhere 0 -> fake == real -> l1 == 0
    total_r, aux_r = oneshot_ireal_loss(
        inv_forward, None, lambda a, b: jnp.float32(0.0), None,
        InversionLossWeights(l1=1.0, lpips=0.0, id=0.0, raw_l1=0.0),
        {"image": real, "uv": None}, jnp.zeros((1, 25)), {},
    )
    assert abs(float(aux_r["l1"])) < 1e-6


def test_oneshot_d_loss_r1():
    W = jnp.asarray(np.random.RandomState(1).randn(4, 1).astype(np.float32) * 0.01)

    def d_apply(img, c):
        feats = jnp.stack(
            [jnp.mean(img["image"]), jnp.mean(img["image_raw"]),
             jnp.mean(jnp.square(img["image"])), jnp.mean(jnp.square(img["image_raw"]))],
        )[None]
        return feats @ W

    rng = np.random.RandomState(2)
    fake = {"image": jnp.asarray(rng.rand(2, 16, 16, 3).astype(np.float32)),
            "image_raw": jnp.asarray(rng.rand(2, 8, 8, 3).astype(np.float32))}
    real = {"image": jnp.asarray(rng.rand(2, 16, 16, 3).astype(np.float32)),
            "image_raw": jnp.asarray(rng.rand(2, 8, 8, 3).astype(np.float32))}
    total, aux = oneshot_d_loss(d_apply, fake, real, jnp.zeros((2, 25)),
                                InversionLossWeights(), do_r1=True)
    for v in aux.values():
        assert np.isfinite(float(v))
    assert float(aux["d_r1"]) > 0


# ------------------------------------------------------- video discriminators


@pytest.mark.skipif(not HAVE_REF, reason="reference repo not mounted")
def test_fusion_video_discriminator_parity():
    import torch

    torch.manual_seed(0)
    from training_avatar_texture.dual_discriminator import (
        FusionVideoDiscriminator as RefD,
    )

    from invertavatar_tpu.models.discriminator import FusionVideoDiscriminator
    from invertavatar_tpu.utils.torch_import import (
        convert_state_dict,
        state_dict_from_torch_module,
    )

    d_t = RefD(c_dim=25, img_resolution=64, img_channels=3, channel_base=1024,
               channel_max=64, num_fp16_res=0, disc_c_noise=0.0)
    d_t.eval()
    rng = np.random.RandomState(0)
    img = rng.randn(4, 3, 64, 64).astype(np.float32)  # 2 videos × 2 frames
    Ts = np.array([[0.0, 3.0], [1.0, 5.0]], np.float32)
    c = rng.randn(2, 2, 25).astype(np.float32)
    with torch.no_grad():
        ref, _ = d_t({"image": torch.tensor(img)}, torch.tensor(Ts), torch.tensor(c))

    d_j = FusionVideoDiscriminator(c_dim=25, img_resolution=64, img_channels=3,
                                   channel_base=1024, channel_max=64, num_fp16_res=0)
    variables = convert_state_dict(state_dict_from_torch_module(d_t))
    out = d_j.apply(variables, {"image": jnp.asarray(np.transpose(img, (0, 2, 3, 1)))},
                    jnp.asarray(Ts), jnp.asarray(c))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=2e-4)
