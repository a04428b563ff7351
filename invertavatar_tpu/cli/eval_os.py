"""One-shot inversion + reenactment CLI (reference eval_updated_os.py:83-226).

A single source image is inverted by the improved one-shot network (e4e W+
init + SegFormer U-Net offsets), then driven frame-by-frame; optionally also
renders a free-view camera orbit around the inverted avatar
(eval_updated_os.py:211-226).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--network", required=True, help="updatedOSInvertAvatar-style .pkl")
    p.add_argument("--source_image", required=True, help="aligned 512² source image")
    p.add_argument("--source_camera", required=True, help="25-dim camera json/npy for the source")
    p.add_argument("--source_uv", required=True, help="uv npy prefix (uvRender256x256/<stem>)")
    p.add_argument("--source_uvcoords", required=True, help="orthRender uvcoords npy for the source")
    p.add_argument("--drive_root", required=True)
    p.add_argument("--max_frames", type=int, default=100)
    p.add_argument("--orbit_frames", type=int, default=0, help="also render a free-view orbit")
    p.add_argument("--outdir", default="out")
    p.add_argument("--fps", type=int, default=25)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import PIL.Image

    from ..camera import fov_to_intrinsics, lookat_camera_pose
    from ..data.dataset import normalize_image
    from ..utils.checkpoint import load_inversion_from_pkl
    from .common import VideoWriter, load_drive_sequence, load_image, to_uint8

    net, variables = load_inversion_from_pkl(args.network)
    # the one-shot checkpoint carries SegFormer U-Nets
    import dataclasses

    net = dataclasses.replace(net, unet_type="segformer")

    img = load_image(args.source_image, 512)
    c = np.load(args.source_camera) if args.source_camera.endswith(".npy") else np.asarray(
        __import__("json").load(open(args.source_camera)), np.float32
    )
    c = jnp.asarray(c.reshape(1, -1).astype(np.float32))
    uv_pverts = np.load(args.source_uv + ".npy").astype(np.float32)
    uv_gttex = normalize_image(np.array(PIL.Image.open(args.source_uv + "_uvgttex.png")))
    uv = jnp.asarray(np.concatenate([uv_gttex, uv_pverts], axis=-1)[None])
    uvc = np.load(args.source_uvcoords).astype(np.float32)[..., :3]
    uvc[..., -1] = (uvc[..., -1] >= 0.5).astype(np.float32)
    uvc = jnp.asarray(uvc[None])

    @jax.jit
    def invert(variables, img, c, uv, uvc):
        def run(m, img, c, uv, uvc):
            return m({"image": img, "uv": uv}, c, {"uvcoords_image": uvc}, return_feats=True, evaluation=True)

        return net.apply(variables, img, c, uv, uvc, method=run)

    out = invert(variables, jnp.asarray(img), c, uv, uvc)
    ws, tex, static = out["w"], out["texture"], out["static"]
    print("one-shot inversion done", flush=True)

    @jax.jit
    def render_frame(variables, ws, tex, static, cache, tex_cat, c, uvc):
        def run(m, ws, tex, static, cache, tex_cat, c, v):
            return m.generator.synthesis_withTexture(
                ws, tex, c, v, static_feats=static, noise_mode="const", evaluation=True,
                raster_static_cache=cache, texture_concat_cache=tex_cat,
            )["image"]

        return net.apply(
            variables, ws, tex, static, cache, tex_cat, c,
            {"uvcoords_image": uvc}, method=run,
        )

    # inverted avatar features are frozen from here on: hoist the frame-
    # independent halves of rasterize out of both drive loops
    cache, tex_cat = jax.jit(
        lambda v, s, t: net.apply(
            v, s, t,
            method=lambda m, s_, t_: (
                m.generator.precompute_raster_static(s_),
                m.generator.precompute_texture_concat(t_),
            ),
        )
    )(variables, static, tex)

    os.makedirs(args.outdir, exist_ok=True)
    drive = load_drive_sequence(args.drive_root, args.max_frames)
    writer = VideoWriter(os.path.join(args.outdir, "oneshot_reenact.mp4"), fps=args.fps)
    for k, frame in enumerate(drive):
        imgf = render_frame(
            variables, ws, tex, static, cache, tex_cat,
            jnp.asarray(frame["c"]), jnp.asarray(frame["uvcoords_image"]),
        )
        writer.append(to_uint8(imgf))
    writer.close()
    print("wrote oneshot_reenact.mp4")

    if args.orbit_frames > 0:
        K = np.asarray(fov_to_intrinsics(18.837)).reshape(1, 9)
        writer = VideoWriter(os.path.join(args.outdir, "oneshot_orbit.mp4"), fps=args.fps)
        for k in range(args.orbit_frames):
            yaw = np.pi / 2 + 0.6 * np.sin(2 * np.pi * k / args.orbit_frames)
            pitch = np.pi / 2 - 0.1 * np.cos(2 * np.pi * k / args.orbit_frames)
            c2w = np.asarray(
                lookat_camera_pose(None, yaw, pitch, jnp.array([0.0, 0.0, 0.2]), radius=2.7)
            ).reshape(1, 16)
            cam = jnp.asarray(np.concatenate([c2w, K], axis=1).astype(np.float32))
            imgf = render_frame(variables, ws, tex, static, cache, tex_cat, cam, uvc)
            writer.append(to_uint8(imgf))
        writer.close()
        print("wrote oneshot_orbit.mp4")


if __name__ == "__main__":
    main()
