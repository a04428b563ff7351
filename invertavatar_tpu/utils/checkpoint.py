"""Checkpoint import/export.

Import: reference `.pkl` (source-embedding pickle, legacy.py:24) → flax
variables + reconstructed module config, combining the torch-free unpickler
(`pkl_import`) with the layout converter (`torch_import`). The reference's
transplant idiom (`misc.copy_params_and_buffers` name matching,
training_loop.py:134-159 backbone→texture/face transplants) is expressed as
key-prefix rename rules.

Export: orbax checkpoints of the native param/buffer pytrees (optimizer state
included — unlike the reference, which drops Adam moments on resume).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from .pkl_import import get_init_kwargs, load_network_pkl
from .torch_import import convert_state_dict

# positional signature of the reference TriPlaneGenerator (triplane_v20.py:29-41)
_TRIPLANE_POS_ARGS = ["z_dim", "c_dim", "w_dim", "img_resolution", "img_channels"]


def triplane_config_from_init_kwargs(init_kwargs: Dict[str, Any]) -> Dict[str, Any]:
    """Map reference init kwargs onto invertavatar_tpu.models.triplane.TriPlaneGenerator."""
    kw = dict(init_kwargs)
    mapping_kwargs = kw.pop("mapping_kwargs", {}) or {}
    cfg = dict(
        z_dim=kw.pop("z_dim"),
        c_dim=kw.pop("c_dim"),
        w_dim=kw.pop("w_dim"),
        img_resolution=kw.pop("img_resolution"),
        img_channels=kw.pop("img_channels"),
        sr_num_fp16_res=kw.pop("sr_num_fp16_res", 0),
        rendering_kwargs=dict(kw.pop("rendering_kwargs", {}) or {}),
        channel_base=kw.pop("channel_base", 32768),
        channel_max=kw.pop("channel_max", 512),
        num_fp16_res=kw.pop("num_fp16_res", 0),
        conv_clamp=float(kw["conv_clamp"]) if kw.get("conv_clamp") is not None else None,
        map_num_layers=mapping_kwargs.get("num_layers", 8),
    )
    kw.pop("conv_clamp", None)
    kw.pop("sr_kwargs", None)
    kw.pop("topology_path", None)
    kw.pop("fused_modconv_default", None)
    return cfg


def load_triplane_from_pkl(path: str, key: str = "G_ema"):
    """Load a reference 3D-GAN checkpoint → (TriPlaneGenerator, variables)."""
    from ..models.triplane import TriPlaneGenerator

    data = load_network_pkl(path)
    entry = data[key]
    cfg = triplane_config_from_init_kwargs(entry["init_kwargs"])
    G = TriPlaneGenerator(**cfg)
    variables = convert_state_dict(entry["state_dict"])
    return G, jax.tree_util.tree_map(np.asarray, variables)


def save_orbax(path: str, tree) -> None:
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(path), tree)


def restore_orbax(path: str):
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(os.path.abspath(path))
