"""Inversion-encoder training CLI (reference encoder_inversion/train.py).

`--training_state` selects the stage exactly like the reference dispatch
(train.py:79-90): `e4e` trains the W+ encoder; `fewshot` trains the ConvGRU
U-Net offset decoders on video clips; `oneshot` trains the SegFormer variant.
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--outdir", required=True)
    p.add_argument("--data", required=True)
    p.add_argument("--gen_pkl", required=True, help="frozen 3D-GAN checkpoint (ani3dgan512-style)")
    p.add_argument("--training_state", choices=["e4e", "oneshot", "fewshot"], default="e4e")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--frm_per_vid", type=int, default=4)
    p.add_argument("--res", type=int, default=512, help="training image resolution")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--kimg", type=int, default=5000)
    p.add_argument("--snap_ticks", type=int, default=20)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max-steps", type=int, default=None,
                   help="stop after N optimizer steps (smoke/CI runs)")
    p.add_argument("--lpips_weights", default=None, help="converted LPIPS weights (orbax)")
    p.add_argument("--irse50", default=None, help="ArcFace ir_se50 torch checkpoint for ID loss")
    p.add_argument("--dry-run", action="store_true")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from ..data.dataset import AvatarDataset, InfiniteSampler, VideoDataset, normalize_image, prefetch_batches
    from ..models.encoders.e4e import LatentCodesDiscriminator
    from ..models.encoders.uvnet import InversionNet, texture_out_channels_for
    from ..train.inversion import InversionLossWeights
    from ..train.loop_inversion import (
        e4e_trainable,
        make_e4e_train_step,
        make_fewshot_train_step,
        masked_adam,
        unet_decoder_trainable,
    )
    from ..utils.checkpoint import load_triplane_from_pkl, restore_orbax, save_orbax
    from ..utils.stats import Collector, StatsLogger
    from ..utils.torch_import import flatten_tree

    if args.dry_run:
        print(json.dumps(vars(args), indent=2))
        return

    G, g_vars = load_triplane_from_pkl(args.gen_pkl, key="G_ema")
    gen_cfg = {f.name: getattr(G, f.name) for f in G.__dataclass_fields__.values()} if False else dict(
        z_dim=G.z_dim, c_dim=G.c_dim, w_dim=G.w_dim, img_resolution=G.img_resolution,
        img_channels=G.img_channels, sr_num_fp16_res=G.sr_num_fp16_res,
        rendering_kwargs=G.rendering_kwargs, neural_rendering_resolution=G.neural_rendering_resolution,
        channel_base=G.channel_base, channel_max=G.channel_max, num_fp16_res=G.num_fp16_res,
        conv_clamp=G.conv_clamp, map_num_layers=G.map_num_layers,
    )
    unet_type = "segformer" if args.training_state == "oneshot" else "gru"
    net = InversionNet(
        generator_cfg=gen_cfg, unet_type=unet_type,
        texture_out_channels=texture_out_channels_for(G.channel_base, G.channel_max),
    )

    rng = jax.random.PRNGKey(args.seed)
    # init the FULL net (encoder + U-Nets + generator) via the single-frame
    # forward, then graft the frozen generator weights from the pkl in
    rngs = {"params": rng, "buffers": jax.random.fold_in(rng, 1),
            "noise": jax.random.fold_in(rng, 2), "ray": jax.random.fold_in(rng, 3)}
    dummy = {
        "image": jnp.zeros((1, 256, 256, 3)),
        "uv": jnp.zeros((1, 256, 256, 6)),
    }
    c0 = jnp.zeros((1, G.c_dim), jnp.float32).at[0, :16].set(jnp.eye(4).reshape(-1))
    v0 = {"uvcoords_image": jnp.zeros((1, 256, 256, 3))}
    if args.training_state == "e4e":
        variables = net.init(rngs, dummy["image"], method=lambda m, x: m.encode(x))
    else:
        variables = net.init(rngs, dummy, c0, v0)
    params = dict(variables["params"])
    params["generator"] = g_vars["params"]
    buffers = dict(variables.get("buffers", {}))
    for coll in ("buffers",):
        if coll in g_vars:
            buffers.setdefault("generator", {})
            buffers["generator"] = g_vars[coll]

    lpips_fn = lambda a, b: jnp.mean(jnp.abs(a - b))  # fallback when no LPIPS weights
    if args.lpips_weights:
        from ..losses import LPIPS

        lp = LPIPS()
        lp_vars = restore_orbax(args.lpips_weights)
        lpips_fn = lambda a, b: lp.apply(lp_vars, a, b)

    id_fn = None
    if args.irse50:
        import torch

        from ..losses import ArcFaceBackbone, id_loss
        from ..utils.torch_import import convert_state_dict

        bb = ArcFaceBackbone()
        sd = {k: v for k, v in torch.load(args.irse50, map_location="cpu").items()}
        bb_vars = convert_state_dict(sd)
        id_fn = lambda a, b: id_loss(lambda x: bb.apply(bb_vars, x), a, b)

    from ..train.loop_inversion import (
        InversionTrainConfig,
        train_e4e,
        train_fewshot,
        train_oneshot,
    )

    cfg = InversionTrainConfig(
        run_dir=args.outdir, total_kimg=args.kimg, batch_size=args.batch,
        lr=args.lr, snapshot_ticks=args.snap_ticks, seed=args.seed,
    )
    all_vars = {"params": params, "buffers": buffers}
    # the encoder's irse BatchNorms live in their own collection — keep them,
    # then graft the generator's (if the pkl carried any) on top
    batch_stats = dict(variables.get("batch_stats", {}))
    if "batch_stats" in g_vars:
        batch_stats["generator"] = g_vars["batch_stats"]
    if batch_stats:
        all_vars["batch_stats"] = batch_stats

    nprng = np.random.RandomState(args.seed)
    if args.training_state == "e4e":
        dataset = AvatarDataset(args.data, resolution=args.res)
        sampler = InfiniteSampler(len(dataset), seed=args.seed)

        def collate(items):
            return {
                "image": np.stack([normalize_image(i["image"]) for i in items]),
                "c": np.stack([i["c"] for i in items]),
                "v": {"uvcoords_image": np.stack([i["uvcoords_image"] for i in items])},
                "z": nprng.randn(len(items), G.z_dim).astype(np.float32),
            }

        batches = prefetch_batches(dataset, sampler, args.batch, collate=collate)
        train_e4e(net, all_vars, LatentCodesDiscriminator(), batches, cfg, lpips_fn, id_fn,
                  max_steps=args.max_steps)
    elif args.training_state == "oneshot":
        # interval-phase stage (reference training_loop_unet_interval.py):
        # single-frame batches, per-unet optimizers, optional dual-D adv
        from ..models.discriminator import DualDiscriminator

        dataset = AvatarDataset(args.data, resolution=args.res, load_uv=True)
        sampler = InfiniteSampler(len(dataset), seed=args.seed)

        def collate_os(items):
            return {
                "image": np.stack([normalize_image(i["image"]) for i in items]),
                "c": np.stack([i["c"] for i in items]),
                "v": {"uvcoords_image": np.stack([i["uvcoords_image"] for i in items])},
                "uv": np.stack([i["uv"] for i in items]),
                "z": nprng.randn(len(items), G.z_dim).astype(np.float32),
                "gen_uv": np.stack([i["uv"] for i in items]),
            }

        batches = prefetch_batches(dataset, sampler, args.batch, collate=collate_os)
        D = (
            DualDiscriminator(c_dim=G.c_dim, img_resolution=G.img_resolution, img_channels=6)
            if cfg.weights.adv > 0
            else None
        )
        train_oneshot(net, all_vars, D, batches, cfg, lpips_fn, id_fn, max_steps=args.max_steps)
    else:
        dataset = VideoDataset(args.data, resolution=args.res, frm_per_vid=args.frm_per_vid)

        def clips():
            # `z` drives the Igen phase (video_loss.py:376 samples gen_z per
            # batch; the uv/c/v conditioning for the synthetic clip reuses the
            # real batch's, :381-385) and gates the D phase in train_fewshot
            while True:
                idxs = nprng.randint(dataset.num_videos, size=args.batch)
                items = [dataset.sample_clip(int(i), nprng) for i in idxs]
                yield {
                    "image": np.stack([it["image"] for it in items]),
                    "c": np.stack([it["c"] for it in items]),
                    "v": {"uvcoords_image": np.stack([it["uvcoords_image"] for it in items])},
                    "uv": np.stack([it["uv"] for it in items]),
                    "z": nprng.randn(args.batch, G.z_dim).astype(np.float32),
                }

        train_fewshot(net, all_vars, clips(), cfg, lpips_fn, max_steps=args.max_steps)


if __name__ == "__main__":
    main()
