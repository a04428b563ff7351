"""GAN avatar reenactment CLI (reference reenact_avatar_next3d.py:134-218).

Generates avatars from seeds and drives them with a preprocessed video's
FaceVerse conditions, writing an (optionally grid-tiled) mp4. The per-frame
hot loop is `synthesis_withTexture` with the avatar's precomputed features —
the north-star benchmark loop (SURVEY §3.3).
"""

from __future__ import annotations

import argparse
import os
import sys
from functools import partial

import numpy as np


def parse_range(s: str):
    out = []
    for part in s.split(","):
        if "-" in part:
            a, b = part.split("-")
            out.extend(range(int(a), int(b) + 1))
        else:
            out.append(int(part))
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--network", required=True, help="reference .pkl or orbax dir")
    p.add_argument("--drive_root", required=True, help="preprocessed drive video root")
    p.add_argument("--seeds", type=parse_range, default=[100])
    p.add_argument("--outdir", default="out")
    p.add_argument("--grid", default=None, help="WxH grid, e.g. 5x2")
    p.add_argument("--trunc", type=float, default=0.7)
    p.add_argument("--trunc_cutoff", type=int, default=14)
    p.add_argument("--max_frames", type=int, default=50)
    p.add_argument("--fps", type=int, default=25)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..utils.checkpoint import load_triplane_from_pkl
    from .common import VideoWriter, layout_grid, load_drive_sequence, to_uint8

    G, variables = load_triplane_from_pkl(args.network, key="G_ema")
    frames = load_drive_sequence(args.drive_root, args.max_frames)
    assert frames and "uvcoords_image" in frames[0], "drive data must include uvcoords npys"

    # conditioning label for mapping comes from the first drive frame's camera
    cond_c = jnp.asarray(frames[0]["c"])

    @jax.jit
    def make_avatar(variables, z, c):
        def run(m, z, c):
            ws = m.mapping(z, c, truncation_psi=args.trunc, truncation_cutoff=args.trunc_cutoff)
            tex = m.texture_backbone.synthesis(ws, return_list=True, noise_mode="const")
            static = m.backbone.synthesis(ws, return_list=True, noise_mode="const")
            # frame-independent halves of rasterize, hoisted out of the loop
            cache = m.precompute_raster_static(static)
            tex_cat = m.precompute_texture_concat(tex)
            return ws, tex, static, cache, tex_cat

        return G.apply(variables, z, c, method=run)

    @jax.jit
    def render_frame(variables, ws, tex, static, cache, tex_cat, c, uvc):
        def run(m, ws, tex, static, cache, tex_cat, c, v):
            return m.synthesis_withTexture(
                ws, tex, c, v, static_feats=static, noise_mode="const", evaluation=True,
                raster_static_cache=cache, texture_concat_cache=tex_cat,
            )["image"]

        return G.apply(
            variables, ws, tex, static, cache, tex_cat, c,
            {"uvcoords_image": uvc}, method=run,
        )

    avatars = []
    for seed in args.seeds:
        z = jax.random.normal(jax.random.PRNGKey(seed), (1, G.z_dim))
        avatars.append(make_avatar(variables, z, cond_c))

    os.makedirs(args.outdir, exist_ok=True)
    name = f"reenact_seeds{args.seeds[0]}-{args.seeds[-1]}"
    writer = VideoWriter(os.path.join(args.outdir, name + ".mp4"), fps=args.fps)
    if args.grid:
        gw, gh = (int(x) for x in args.grid.split("x"))
    else:
        gw, gh = len(avatars), 1

    for k, frame in enumerate(frames):
        c = jnp.asarray(frame["c"])
        uvc = jnp.asarray(frame["uvcoords_image"])
        imgs = [
            to_uint8(render_frame(variables, ws, tex, static, cache, tex_cat, c, uvc))
            for (ws, tex, static, cache, tex_cat) in avatars
        ]
        writer.append(layout_grid(imgs, (gw, gh)))
        if (k + 1) % 10 == 0:
            print(f"frame {k + 1}/{len(frames)}", flush=True)
    writer.close()
    print(f"wrote {os.path.join(args.outdir, name + '.mp4')}")


if __name__ == "__main__":
    main()
