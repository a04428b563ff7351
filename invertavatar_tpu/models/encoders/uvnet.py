"""Few-shot inversion network (reference encoder_inversion/models/uvnet.py:15-210).

`InversionNet` composes: the e4e W+ encoder (one-shot init), the UV-space
texture U-Net and image-space tri-plane SFT U-Net (offset predictors with
ConvGRU recurrence), and the frozen tri-plane generator. Quality grows with
the number of observed frames via `ar_forward`, which carries GRU states
across chunks indefinitely (uvnet.py:160-203 — the streaming few-shot path
driven by eval_seq.py).

Module names mirror torch (`encoder`, `unet_encoder.texture_unet`,
`unet_encoder.triplane_unet`, `generator`, `latent_avg`, `black_uv_bg`) so the
published `FSInvertAvatar.pkl` imports by name.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.grid_sample import grid_sample
from ...ops.resize import resize_bilinear
from ..triplane import TriPlaneGenerator
from .e4e import Encoder4Editing
from .unet_encoders import TriPlanefeatEncoder, TriPlaneSFTfeatEncoder, adaptive_avg_pool


def texture_out_channels_for(channel_base: int, channel_max: int) -> Tuple[int, int, int, int]:
    """Channels of the first 4 texture-backbone `return_list` taps
    [img_lo(32ch), x@32, x@64, x@128] — the taps the texture U-Net offsets
    (uvnet.py:123-158 adds `tex_offsets` to `gt_feats[:4]`). The texture
    backbone's image channels are fixed at 32 (triplane_v20.py:64)."""
    return (32,
            min(channel_base // 32, channel_max),
            min(channel_base // 64, channel_max),
            min(channel_base // 128, channel_max))


class UnetEncoderPair(nn.Module):
    """Container mirroring reference `unet_encoder` (uvnet.py:15-24) /
    `improved_os_unet_encoder` (uvnet_new.py:13-22)."""

    encoding_texture: bool = True
    encoding_triplane: bool = True
    unet_type: str = "gru"  # 'gru' (few-shot) | 'segformer' (improved one-shot)
    # flagship generator widths; configurable so tiny test generators can be
    # driven through the full few-shot graph
    texture_out_channels: Tuple[int, int, int, int] = (32, 512, 512, 256)
    channel_base: int = 32768
    channel_max: int = 512
    trunk_layers_n: int = 50  # 8 = tiny trunk (test/dryrun-only)

    def setup(self):
        if self.unet_type == "gru":
            self.texture_unet = (
                TriPlanefeatEncoder(inp_ch=7, res=256, use_gru=True,
                                    out_channels=self.texture_out_channels,
                                    trunk_layers_n=self.trunk_layers_n)
                if self.encoding_texture
                else None
            )
            self.triplane_unet = (
                TriPlaneSFTfeatEncoder(inp_ch=6, res=256, use_gru=True,
                                       channel_base=self.channel_base,
                                       channel_max=self.channel_max,
                                       trunk_layers_n=self.trunk_layers_n)
                if self.encoding_triplane
                else None
            )
        else:
            from .transformer import (
                TriPlanefeatSegformerDecoder,
                TriPlaneSFTfeatSegformerDecoder,
            )

            self.texture_unet = (
                TriPlanefeatSegformerDecoder(inp_ch=7, res=256,
                                             out_channels=self.texture_out_channels)
                if self.encoding_texture
                else None
            )
            self.triplane_unet = (
                TriPlaneSFTfeatSegformerDecoder(inp_ch=6, res=256,
                                                channel_base=self.channel_base,
                                                channel_max=self.channel_max)
                if self.encoding_triplane
                else None
            )

    def __call__(self, *a, **k):  # container only
        raise NotImplementedError


class InversionNet(nn.Module):
    generator_cfg: Any = None  # dict of TriPlaneGenerator fields
    n_styles: int = 14
    encoding_texture: bool = True
    encoding_triplane: bool = True
    unet_type: str = "gru"  # 'gru' = few-shot (uvnet.py) | 'segformer' = one-shot (uvnet_new.py)
    texture_out_channels: Tuple[int, int, int, int] = (32, 512, 512, 256)
    # Eval-only compute dtype for the U-Net forwards in `ar_forward` (e.g.
    # jnp.bfloat16). The irse primitives propagate the input dtype (conv/PReLU
    # cast weights to x.dtype; BatchNorm normalizes in fp32), so one boundary
    # cast runs the whole trunk+GRU decoder in bf16 — the absorb anatomy
    # (docs/absorb_anatomy.json) put the fp32 U-Nets at 71 ms of each
    # 4-frame chunk. None keeps the reference's fp32. Training paths
    # (`forward`, run_seq) never read this.
    unet_eval_dtype: Any = None
    # 8 = tiny IR-SE trunks in the e4e encoder AND both U-Nets (one
    # bottleneck per stage; same tap channels/strides) — test/dryrun-only:
    # the multichip dryrun's XLA-CPU compile is trunk-dominated
    trunk_layers_n: int = 50

    def setup(self):
        gen_cfg = dict(self.generator_cfg)
        self.generator = TriPlaneGenerator(**gen_cfg)
        self.encoder = Encoder4Editing(n_styles=self.n_styles, inp_ch=3,
                                       trunk_layers_n=self.trunk_layers_n)
        self.unet_encoder = UnetEncoderPair(
            self.encoding_texture, self.encoding_triplane, unet_type=self.unet_type,
            texture_out_channels=self.texture_out_channels,
            channel_base=gen_cfg.get("channel_base", 32768),
            channel_max=gen_cfg.get("channel_max", 512),
            trunk_layers_n=self.trunk_layers_n,
        )
        self.latent_avg = self.variable(
            "buffers", "latent_avg", lambda: jnp.zeros((1, 512), jnp.float32)
        )
        self.black_uv_bg = self.variable(
            "buffers", "black_uv_bg", lambda: -jnp.ones((1, 256, 256, 3), jnp.float32)
        )

    # ------------------------------------------------------------------ encode
    def encode(self, x, train: bool = False):
        """e4e W+ codes + latent_avg (uvnet.py:107-115). x: [B, H, W, 3]."""
        if x.shape[1] > 256:
            x = adaptive_avg_pool(x, 256)
        elif x.shape[1] < 256:
            # sub-256 renders only occur with shrunken test generators; the
            # reference always feeds >=256 (AdaptiveAvgPool2d downsample)
            x = resize_bilinear(x, (256, 256))
        codes = self.encoder(x, train=train)
        return codes + self.latent_avg.value[None]

    def get_unet_uvinput(self, uv, delta_x):
        """UV-space input assembly (uvnet.py:117-121).

        uv: [B, 256, 256, 6] = (uv_gttex 3ch ‖ uv_pverts 3ch); delta_x: [B, 256, 256, 3].
        """
        uv_gttex, uv_pverts = uv[..., :3], uv[..., 3:]
        uv_delta = grid_sample(delta_x, uv_pverts[..., :2])
        mask = uv_pverts[..., 2:3]
        uv_delta = uv_delta * mask + self.black_uv_bg.value * (1 - mask)
        return jnp.concatenate([uv_gttex, uv_delta, mask], axis=-1)

    # ------------------------------------------------------------------ prefix
    def prefix(self, x: Dict, cam, v, e4e_results: Optional[Dict] = None,
               train: bool = False, evaluation: bool = False,
               nograd_render: Optional[Dict] = None) -> Dict:
        """The stop-gradient prefix of the forward: e4e W+ codes, the frozen
        generator's texture pyramid, and the e4e reconstruction render
        (uvnet.py:123-131 up to delta_x). Everything the U-Net stage consumes
        downstream; nothing here carries gradients in any inversion stage, so
        it can run as its OWN XLA program — the one-shot grad program's HBM
        plan (docs/train_tpu_run.json oneshot_B1_remat: the grad program's
        12 GB temp is this prefix render's working set, which neither subtree
        grads nor remat can touch). Returns {'w', 'texture', 'e4e_image'}
        (the plain backbone features are prefix-render-local and not
        returned)."""
        sg = jax.lax.stop_gradient
        if e4e_results is None:
            ws = self.encode(x["image"][..., :3], train=train)
            tex = self.generator.texture_backbone.synthesis(ws, return_list=True, noise_mode="const")
            static = self.generator.backbone.synthesis(ws, return_list=True, noise_mode="const")
        else:
            ws, tex, static = e4e_results["w"], e4e_results["texture"], e4e_results["static"]
        y_hat = self.generator.synthesis_withTexture(
            ws, tex, cam, v, static_feats=static, noise_mode="const",
            evaluation=evaluation or nograd_render is not None,
            rendering_overrides=nograd_render,
        )
        e4e_image = y_hat["image"]
        if e4e_image.shape[1] != x["image"].shape[1]:
            # align the e4e render to the input frames (the reference face-pools
            # to the 256² training res, uvnet.py:131; frames define the res here
            # so shrunken test configs keep Δx consistent)
            e4e_image = resize_bilinear(
                e4e_image, (x["image"].shape[1], x["image"].shape[2]), antialias=True
            )
        return {"w": sg(ws), "texture": sg(tex), "e4e_image": sg(e4e_image)}

    # ----------------------------------------------------------------- forward
    def __call__(self, x: Dict, cam, v, e4e_results: Optional[Dict] = None,
                 return_feats: bool = False, train: bool = False,
                 evaluation: bool = False,
                 nograd_render: Optional[Dict] = None,
                 grad_render: Optional[Dict] = None,
                 prefix_results: Optional[Dict] = None):
        """Single-frame forward (uvnet.py:123-158). x: {'image': [B,H,W,3+], 'uv': [B,256,256,6]}.

        `evaluation=True` marks an inference call (both renders may ride the
        eval kernel paths). `nograd_render` / `grad_render`
        (train/fast_render override dicts) route the stop-gradient e4e render
        / the grad-carrying student render through the structured sampling
        paths during TRAINING. `prefix_results` (a `prefix()` output dict)
        skips the whole stop-gradient prefix — the encoder params and the
        prefix render never enter this computation, which is what lets the
        one-shot grad program fit the 16 GB v5e."""
        sg = jax.lax.stop_gradient
        if prefix_results is None:
            prefix_results = self.prefix(
                x, cam, v, e4e_results=e4e_results, train=train,
                evaluation=evaluation, nograd_render=nograd_render,
            )
        ws = sg(prefix_results["w"])
        tex = sg(prefix_results["texture"])
        e4e_image = sg(prefix_results["e4e_image"])
        delta_x = e4e_image - x["image"][..., :3]

        x_input = self.get_unet_uvinput(x["uv"], delta_x)
        tri_input = jnp.concatenate([x["image"][..., :3], delta_x], axis=-1)
        if self.unet_type == "gru":
            tex_offsets, _ = self.unet_encoder.texture_unet(x_input[:, None], train=train)
            sft, _ = self.unet_encoder.triplane_unet(tri_input[:, None], train=train)
        else:
            tex_offsets = self.unet_encoder.texture_unet(x_input, train=train)
            sft = self.unet_encoder.triplane_unet(tri_input, train=train)
        texture_feats = [f + o for f, o in zip(tex, tex_offsets)] + list(tex[len(tex_offsets):])
        static_feats = self.generator.backbone.synthesis(
            ws, return_list=True, feat_conditions=sft, noise_mode="const"
        )

        out = self.generator.synthesis_withTexture(
            ws, texture_feats, cam, v, static_feats=static_feats, noise_mode="const",
            evaluation=evaluation, rendering_overrides=grad_render,
        )
        if return_feats:
            out["texture"] = texture_feats
            out["static"] = static_feats
        out["w"] = ws
        out["e4e_image"] = e4e_image
        return out

    # ------------------------------------------------------------ train rollout
    def run_seq(self, vid_frames, vid_c, vid_v, vid_uv, ws=None, only_image: bool = False,
                train: bool = False):
        """Parallel recurrent rollout for training (video_loss.py:176-234 run_G_seq).

        vid_frames/[uv]: [B, T, ...]; the e4e branch runs under stop_gradient,
        the U-Net offsets and the final render carry gradients.
        """
        sg = jax.lax.stop_gradient
        B, T = vid_c.shape[:2]
        if ws is None:
            ws = self.encode(vid_frames[:, 0], train=train)
        ws = sg(ws)
        tex = [sg(f) for f in self.generator.texture_backbone.synthesis(ws, return_list=True, noise_mode="const")]
        static = [sg(f) for f in self.generator.backbone.synthesis(ws, return_list=True, noise_mode="const")]

        def rep(feats):
            return [jnp.repeat(f, T, axis=0) for f in feats]

        vid_ws = jnp.repeat(ws, T, axis=0)
        flat_c = vid_c.reshape(B * T, -1)
        flat_v = {"uvcoords_image": vid_v["uvcoords_image"].reshape(B * T, *vid_v["uvcoords_image"].shape[2:])}
        e4e_img = sg(
            self.generator.synthesis_withTexture(
                vid_ws, rep(tex), flat_c, flat_v, static_feats=rep(static), noise_mode="const"
            )["image"]
        )
        frames_flat = vid_frames.reshape(B * T, *vid_frames.shape[2:])
        if e4e_img.shape[1] != frames_flat.shape[1]:
            e4e_img = resize_bilinear(e4e_img, frames_flat.shape[1:3], antialias=True)
        delta = e4e_img - frames_flat[..., :3]

        uv_flat = vid_uv.reshape(B * T, *vid_uv.shape[2:])
        uv_input = self.get_unet_uvinput(uv_flat, delta).reshape(B, T, 256, 256, 7)
        tri_input = jnp.concatenate([frames_flat[..., :3], delta], axis=-1).reshape(B, T, *frames_flat.shape[1:3], 6)

        if self.unet_type == "gru":
            tex_offsets, _ = self.unet_encoder.texture_unet(uv_input, train=train)
            sft, _ = self.unet_encoder.triplane_unet(tri_input, train=train)
        else:
            tex_offsets = self.unet_encoder.texture_unet(uv_input.reshape(B * T, 256, 256, 7), train=train)
            sft = self.unet_encoder.triplane_unet(tri_input.reshape(B * T, *tri_input.shape[2:]), train=train)
        texture_feats = [f + o for f, o in zip(tex, tex_offsets)] + list(tex[len(tex_offsets):])
        static_feats = self.generator.backbone.synthesis(
            ws, return_list=True, feat_conditions=sft, noise_mode="const"
        )

        out = self.generator.synthesis_withTexture(
            vid_ws, rep(texture_feats), flat_c, flat_v,
            static_feats=rep(static_feats), noise_mode="const",
        )
        if only_image:
            return {"image": out["image"], "e4e_image": e4e_img}
        out["e4e_image"] = e4e_img
        return out

    # -------------------------------------------------- multi-T building blocks
    #
    # The reference's run_G_seq_multiT (video_loss.py:289-357) wraps the ENTIRE
    # chunk loop — including the last chunk's e4e render and U-Net input
    # assembly — in torch.no_grad(); only the final U-Net forwards, the
    # backbone-with-SFT pass and one render carry gradients. That boundary lets
    # the training step split into small fixed-shape programs (each jitted
    # once, executed per chunk) instead of one uncompilable unrolled graph:
    #   chunk_inputs (no grad, 1 render)  →  chunk_state (no grad, 2 U-Nets)
    #   → … repeated per prefix chunk …  →  multiT_final (grads, 1 render).

    def backbone_feats(self, ws, train: bool = False):
        """Frozen-generator texture/static feature lists for a ws
        (video_loss.py:303-304). No-grad at the call site."""
        tex = self.generator.texture_backbone.synthesis(ws, return_list=True, noise_mode="const")
        static = self.generator.backbone.synthesis(ws, return_list=True, noise_mode="const")
        return tex, static

    def multiT_chunk_inputs(self, frames, c, v, uv, ws, tex, static,
                            nograd_render=None):
        """One chunk's U-Net inputs (video_loss.py:308-318, under no_grad):
        e4e render of the chunk → Δx → (uv_input, tri_input, e4e_img).

        frames/uv: [B, Tc, ...]; c: [B, Tc, ·]; v['uvcoords_image']: [B, Tc, ...].
        `nograd_render` (a train.fast_render override dict) routes the e4e
        render — no-grad per the reference semantics — through the structured
        eval fast paths.
        """
        B, Tc = c.shape[:2]
        vid_ws = jnp.repeat(ws, Tc, axis=0)

        def rep(feats):
            return [jnp.repeat(f, Tc, axis=0) for f in feats]

        uvi = v["uvcoords_image"]
        flat_c = c.reshape(B * Tc, -1)
        flat_v = {"uvcoords_image": uvi.reshape(B * Tc, *uvi.shape[2:])}
        frames_flat = frames.reshape(B * Tc, *frames.shape[2:])
        e4e_img = self.generator.synthesis_withTexture(
            vid_ws, rep(tex), flat_c, flat_v, static_feats=rep(static), noise_mode="const",
            evaluation=nograd_render is not None,
            rendering_overrides=nograd_render,
        )["image"]
        if e4e_img.shape[1] != frames_flat.shape[1]:
            e4e_img = resize_bilinear(e4e_img, frames_flat.shape[1:3], antialias=True)
        delta = e4e_img - frames_flat[..., :3]
        uv_flat = uv.reshape(B * Tc, *uv.shape[2:])
        uv_input = self.get_unet_uvinput(uv_flat, delta).reshape(B, Tc, 256, 256, 7)
        tri_input = jnp.concatenate([frames_flat[..., :3], delta], axis=-1).reshape(
            B, Tc, *frames_flat.shape[1:3], 6
        )
        return uv_input, tri_input, e4e_img

    def multiT_chunk_state(self, uv_input, tri_input, r_tex=None, r_tri=None,
                           train: bool = False):
        """Prefix GRU-state update (video_loss.py:319-323, under no_grad): run
        both U-Nets for their recurrent states only."""
        _, r_tex = self.unet_encoder.texture_unet(uv_input, r_list=r_tex, train=train)
        _, r_tri = self.unet_encoder.triplane_unet(tri_input, r_list=r_tri, train=train)
        return r_tex, r_tri

    def multiT_final(self, uv_input, tri_input, r_tex, r_tri, ws, tex, static,
                     c_sel, v_sel, train: bool = False):
        """Gradient-carrying suffix (video_loss.py:326-357): U-Nets with the
        carried GRU states → offsets → backbone-with-SFT → one render over the
        selected frames. c_sel: [B, T_out, ·]; v_sel['uvcoords_image'] likewise.
        Returns the raw I_output dict ([B·T_out, ...] leaves)."""
        tex_offsets, _ = self.unet_encoder.texture_unet(uv_input, r_list=r_tex, train=train)
        sft, _ = self.unet_encoder.triplane_unet(tri_input, r_list=r_tri, train=train)
        texture_feats = [f + o for f, o in zip(tex, tex_offsets)] + list(tex[len(tex_offsets):])
        static_feats = self.generator.backbone.synthesis(
            ws, return_list=True, feat_conditions=sft, noise_mode="const"
        )
        B, T_out = c_sel.shape[:2]
        uvi = v_sel["uvcoords_image"]
        out = self.generator.synthesis_withTexture(
            jnp.repeat(ws, T_out, axis=0),
            [jnp.repeat(f, T_out, axis=0) for f in texture_feats],
            c_sel.reshape(B * T_out, -1),
            {"uvcoords_image": uvi.reshape(B * T_out, *uvi.shape[2:])},
            static_feats=[jnp.repeat(f, T_out, axis=0) for f in static_feats],
            noise_mode="const",
        )
        return out

    def run_seq_multiT(self, vid_frames, vid_c, vid_v, vid_uv, frm_per_chunk: int = 6,
                       ws=None, return_idx=None, train: bool = False):
        """Chunked multi-T rollout (video_loss.py:289-357 run_G_seq_multiT).

        T = n_chunks * frm_per_chunk. Chunks 0..n-2 roll the GRU states forward
        under stop_gradient (the no-grad prefix, training_loop_video.py:424-429);
        only the last chunk's U-Net calls and the final renders carry gradients.
        `return_idx` ([B-shared index list/array of frm_per_chunk frames], the
        reference's random Ireal subset) renders only those frames; None renders
        all T with the final updated features.
        Returns {'image': [B, T_out, H, W, 3], 'e4e_image': last chunk's e4e}.

        Monolithic composition of the multiT_* building blocks — used by eval
        and equivalence tests; the training step executes the blocks as
        separate jitted programs (train/loop_inversion.py) so compile stays
        bounded (VERDICT r2 #1).
        """
        sg = jax.lax.stop_gradient
        B, T = vid_c.shape[:2]
        assert T % frm_per_chunk == 0, (T, frm_per_chunk)
        n_chunks = T // frm_per_chunk
        Tc = frm_per_chunk
        uvi = vid_v["uvcoords_image"]
        if ws is None:
            ws = self.encode(vid_frames[:, 0], train=train)
        ws = sg(ws)
        tex, static = self.backbone_feats(ws)
        tex = [sg(f) for f in tex]
        static = [sg(f) for f in static]

        def chunk(i):
            sl = slice(i * Tc, (i + 1) * Tc)
            return self.multiT_chunk_inputs(
                vid_frames[:, sl], vid_c[:, sl],
                {"uvcoords_image": uvi[:, sl]}, vid_uv[:, sl], ws, tex, static,
            )

        r_tex = r_tri = None
        for i in range(n_chunks - 1):
            uv_input, tri_input, _ = chunk(i)
            r_tex, r_tri = self.multiT_chunk_state(
                sg(uv_input), sg(tri_input), r_tex, r_tri, train=train
            )
            r_tex = jax.tree_util.tree_map(sg, r_tex)
            r_tri = jax.tree_util.tree_map(sg, r_tri)

        uv_input, tri_input, e4e_last = chunk(n_chunks - 1)
        uv_input, tri_input, e4e_last = sg(uv_input), sg(tri_input), sg(e4e_last)

        if return_idx is None:
            T_out = T
            c_sel = vid_c
            v_sel = {"uvcoords_image": uvi}
        else:
            return_idx = jnp.asarray(return_idx)
            T_out = return_idx.shape[0]
            c_sel = jnp.take(vid_c, return_idx, axis=1)
            v_sel = {"uvcoords_image": jnp.take(uvi, return_idx, axis=1)}
        out = self.multiT_final(
            uv_input, tri_input, r_tex, r_tri, ws, tex, static, c_sel, v_sel, train=train
        )
        return {
            "image": out["image"].reshape(B, T_out, *out["image"].shape[1:]),
            "e4e_image": e4e_last,
            "feature_image": out["feature_image"],
            "triplane": out["triplane"],
        }

    # ------------------------------------------------------------- streaming
    def ar_forward(self, x: Dict, vid_c, vid_v, ws, r_list, e4e_results: Optional[Dict] = None,
                   return_fake: bool = False, e4e_render_caches=None):
        """Incremental few-shot update over a T-frame chunk (uvnet.py:160-203).

        x: {'image': [T,256,256,3], 'uv': [T,256,256,6]}; r_list: [tex_r, tri_r]
        GRU-state pytrees carried across chunks (None on the first chunk).
        Returns (updated_e4e_results, new_r_list[, fakes]).

        `e4e_render_caches`: optional (raster_static_cache,
        texture_concat_cache) pair for this chunk's render, built from the
        SAME T-repeated feature lists as `e4e_results` (triplane.py
        precompute_* docs). Valid only while those lists are unchanged — the
        first absorb chunk renders the frozen e4e lists (cacheable from the
        feature-precompute program); later chunks refine the updated lists
        and must rebuild or skip the caches.
        """
        T = vid_c.shape[0]
        if ws is None:
            ws = self.encode(x["image"][0:1])
        if e4e_results is None:
            tex = self.generator.texture_backbone.synthesis(ws, return_list=True, noise_mode="const")
            static = self.generator.backbone.synthesis(ws, return_list=True, noise_mode="const")
        else:
            tex, static = e4e_results["texture"], e4e_results["static"]
        vid_ws = jnp.repeat(ws, T, axis=0)

        def rep(feats):
            return [jnp.repeat(f, T, axis=0) for f in feats]

        cache_kw = {}
        if e4e_render_caches is not None:
            cache_kw = {"raster_static_cache": e4e_render_caches[0],
                        "texture_concat_cache": e4e_render_caches[1]}
        y_hat = self.generator.synthesis_withTexture(
            vid_ws, rep(tex), vid_c, vid_v, static_feats=rep(static),
            noise_mode="const", evaluation=True,  # AR absorb is eval-only
            **cache_kw,
        )
        delta_x = y_hat["image"]
        if delta_x.shape[1] != x["image"].shape[1]:
            delta_x = resize_bilinear(delta_x, (256, 256), antialias=True)
        delta_x = delta_x - x["image"][..., :3]
        uv_input = self.get_unet_uvinput(x["uv"], delta_x)
        tri_input = jnp.concatenate([x["image"][..., :3], delta_x], axis=-1)

        dt = self.unet_eval_dtype
        if dt is not None:
            cast = lambda t: jax.tree_util.tree_map(lambda a: a.astype(dt), t)
            uv_input, tri_input = uv_input.astype(dt), tri_input.astype(dt)
            r_list = [None if r is None else cast(r) for r in r_list]
        tex_offsets, r_tex = self.unet_encoder.texture_unet(uv_input[None], r_list[0])
        sft, r_tri = self.unet_encoder.triplane_unet(tri_input[None], r_list[1])
        if dt is not None:
            f32 = lambda t: jax.tree_util.tree_map(
                lambda a: a.astype(jnp.float32), t)
            # offsets/SFT re-enter the fp32 generator feature path; GRU states
            # stay in dt (they only ever feed the next chunk's bf16 cells)
            tex_offsets, sft = f32(tex_offsets), f32(sft)
        texture_feats = [f + o for f, o in zip(tex, tex_offsets)] + list(tex[len(tex_offsets):])


        static_feats = self.generator.backbone.synthesis(
            ws, return_list=True, feat_conditions=sft, noise_mode="const"
        )

        updated = {"w": ws, "texture": texture_feats, "static": static_feats}
        if not return_fake:
            return updated, [r_tex, r_tri]
        fakes = self.generator.synthesis_withTexture(
            vid_ws, rep(texture_feats), vid_c, vid_v,
            static_feats=rep(static_feats), noise_mode="const", evaluation=True,
        )["image"]
        return updated, {"e4e": y_hat["image"], "image": fakes, "x_input": uv_input}, [r_tex, r_tri]
