"""Few-shot incremental inversion + reenactment CLI (reference eval_seq.py:73-219).

The avatar is "compiled" from a source video: e4e inverts the first frame,
then ConvGRU U-Nets refine (ws, texture_feats, static_feats) over chunks of
source frames — quality grows with frame count, GRU state carries across
chunks indefinitely. The drive loop then touches only `synthesis_withTexture`.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--network", required=True, help="FSInvertAvatar-style .pkl")
    p.add_argument("--source_root", required=True, help="preprocessed source video root")
    p.add_argument("--drive_root", required=True, help="preprocessed drive video root")
    p.add_argument("--num_source_frames", type=int, default=8)
    p.add_argument("--chunk", type=int, default=4)
    p.add_argument("--max_frames", type=int, default=100)
    p.add_argument("--outdir", default="out")
    p.add_argument("--fps", type=int, default=40)
    p.add_argument("--faceverse_model", default=None,
                   help="faceverse_v3_1.npy for online identity-corrected driving")
    p.add_argument("--faceverse_assets", default=None,
                   help="dir with fv2fl_30.npy + v31_face_mask_new.npy")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..data.dataset import AvatarDataset, normalize_image
    from ..utils.checkpoint import load_inversion_from_pkl
    from .common import VideoWriter, load_drive_sequence, load_image, to_uint8

    net, variables = load_inversion_from_pkl(args.network)
    G = net  # flax module; generator at net.generator

    src = load_drive_sequence(args.source_root, args.num_source_frames)
    drive = load_drive_sequence(args.drive_root, args.max_frames)

    # ---------------- source ingestion: interleaved chunks (eval_seq.py:173-190)
    def load_src_frame(item):
        img = load_image(item["image_path"], 512)
        return img

    uv_dir = os.path.join(args.source_root, "uvRender256x256")

    def load_src_uv(item):
        stem = item["name"]
        uv_pverts = np.load(os.path.join(uv_dir, stem + ".npy")).astype(np.float32)
        import PIL.Image

        uv_gttex = normalize_image(
            np.array(PIL.Image.open(os.path.join(uv_dir, stem + "_uvgttex.png")))
        )
        return np.concatenate([uv_gttex, uv_pverts], axis=-1)[None]

    @jax.jit
    def encode_first(variables, img):
        return G.apply(variables, img, method=lambda m, x: m.encode(x))

    @jax.jit
    def init_feats(variables, ws):
        def run(m, ws):
            tex = m.generator.texture_backbone.synthesis(ws, return_list=True, noise_mode="const")
            static = m.generator.backbone.synthesis(ws, return_list=True, noise_mode="const")
            return tex, static

        return G.apply(variables, ws, method=run)

    @jax.jit
    def ar_update(variables, images, uvs, cs, uvcs, ws, tex, static, r_tex, r_tri):
        def run(m, images, uvs, cs, uvcs, ws, tex, static, r_tex, r_tri):
            return m.ar_forward(
                {"image": images, "uv": uvs}, cs, {"uvcoords_image": uvcs}, ws,
                [r_tex, r_tri], e4e_results={"texture": tex, "static": static},
            )

        return G.apply(variables, images, uvs, cs, uvcs, ws, tex, static, r_tex, r_tri, method=run)

    @jax.jit
    def render_frame(variables, ws, tex, static, cache, tex_cat, c, uvc):
        def run(m, ws, tex, static, cache, tex_cat, c, v):
            return m.generator.synthesis_withTexture(
                ws, tex, c, v, static_feats=static, noise_mode="const", evaluation=True,
                raster_static_cache=cache, texture_concat_cache=tex_cat,
            )["image"]

        return G.apply(
            variables, ws, tex, static, cache, tex_cat, c,
            {"uvcoords_image": uvc}, method=run,
        )

    @jax.jit
    def make_raster_cache(variables, static, tex):
        def run(m, s, t):
            return m.generator.precompute_raster_static(s), m.generator.precompute_texture_concat(t)

        return G.apply(variables, static, tex, method=run)

    first_img = load_src_frame(src[0])
    ws = encode_first(variables, jnp.asarray(first_img))
    tex, static = init_feats(variables, ws)

    r_tex = r_tri = None
    T = args.chunk
    for start in range(0, len(src) - T + 1, T):
        chunk = src[start : start + T]
        images = jnp.asarray(np.concatenate([load_src_frame(it) for it in chunk]))
        uvs = jnp.asarray(np.concatenate([load_src_uv(it) for it in chunk]))
        cs = jnp.asarray(np.concatenate([it["c"] for it in chunk]))
        uvcs = jnp.asarray(np.concatenate([it["uvcoords_image"] for it in chunk]))
        if r_tex is None:
            # first chunk: trace with fresh (zero) states by calling without carry
            def run0(m, images, uvs, cs, uvcs, ws, tex, static):
                return m.ar_forward(
                    {"image": images, "uv": uvs}, cs, {"uvcoords_image": uvcs}, ws,
                    [None, None], e4e_results={"texture": tex, "static": static},
                )

            updated, r_list = G.apply(variables, images, uvs, cs, uvcs, ws, tex, static, method=run0)
        else:
            updated, r_list = ar_update(variables, images, uvs, cs, uvcs, ws, tex, static, r_tex, r_tri)
        tex, static = updated["texture"], updated["static"]
        r_tex, r_tri = r_list
        print(f"absorbed source frames {start}..{start + T - 1}", flush=True)

    # ---------------- drive loop
    mgr = None
    if args.faceverse_model and args.faceverse_assets:
        from ..faceverse.manager import FaceverseManager

        mgr = FaceverseManager.from_files(args.faceverse_model, args.faceverse_assets)
        if src[0].get("coeff") is not None:
            mgr.set_identity(src[0]["coeff"])

    os.makedirs(args.outdir, exist_ok=True)
    out_path = os.path.join(args.outdir, "fewshot_reenact.mp4")
    writer = VideoWriter(out_path, fps=args.fps)
    # the absorbed avatar's features are now frozen: hoist the static half of
    # rasterize out of the drive loop (models/triplane.py raster_static_cache)
    cache, tex_cat = make_raster_cache(variables, static, tex)
    for k, frame in enumerate(drive):
        if mgr is not None and frame.get("coeff") is not None:
            uvc = mgr.make_driven_rendering(frame["coeff"])
        else:
            uvc = jnp.asarray(frame["uvcoords_image"])
        img = render_frame(variables, ws, tex, static, cache, tex_cat,
                           jnp.asarray(frame["c"]), uvc)
        writer.append(to_uint8(img))
        if (k + 1) % 20 == 0:
            print(f"drive frame {k + 1}/{len(drive)}", flush=True)
    writer.close()
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
