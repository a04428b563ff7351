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


def _stub_children(obj):
    """_modules dict of a stub module / persistent obj."""
    from .pkl_import import _PersistentObj

    if isinstance(obj, _PersistentObj):
        meta = obj.meta
        state = meta.get("state") if isinstance(meta, dict) else getattr(meta, "state", None)
        return (state or {}).get("_modules", {})
    d = getattr(obj, "__dict__", {})
    return d.get("_modules", {}) or {}


def load_inversion_from_pkl(path: str, key: str = "G"):
    """Load a reference inversion checkpoint (FSInvertAvatar.pkl) →
    (InversionNet, variables). The nested generator's init_kwargs reconstruct
    the TriPlaneGenerator config."""
    from ..models.encoders.uvnet import InversionNet
    from .pkl_import import get_init_kwargs, safe_load_pickle, state_dict_from_stub

    with open(path, "rb") as f:
        data = safe_load_pickle(f)
    obj = data[key]
    sd = state_dict_from_stub(obj)
    gen_stub = _stub_children(obj).get("generator")
    gen_kwargs = get_init_kwargs(gen_stub) if gen_stub is not None else {}
    if not gen_kwargs:
        raise ValueError("could not recover generator init kwargs from checkpoint")
    cfg = triplane_config_from_init_kwargs(gen_kwargs)
    net = InversionNet(generator_cfg=cfg)
    variables = convert_state_dict(sd)
    return net, jax.tree_util.tree_map(np.asarray, variables)


def save_orbax(path: str, tree) -> None:
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    # force=True: snapshot tags repeat across resumed runs ("snapshot-final",
    # same-nimg ticks) — overwrite is the snapshot semantics; without it a
    # resumed run's final save crashes with "Destination ... already exists"
    ckptr.save(os.path.abspath(path), tree, force=True)


def restore_orbax(path: str, template=None):
    """Restore a pytree; `template` (a matching pytree, e.g. a freshly built
    TrainState/opt-state) restores into the original container classes —
    orbax otherwise returns plain nested dicts, which breaks optax states."""
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    if template is None:
        return ckptr.restore(os.path.abspath(path))
    return ckptr.restore(os.path.abspath(path), item=template)
