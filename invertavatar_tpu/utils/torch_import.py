"""Import reference torch checkpoints into flax param/buffer pytrees.

The reference persists networks as source-embedding pickles
(`torch_utils/persistence.py:101-134`, loaded by `legacy.py:24`). Importing
them here is a two-step process:

  1. extract a flat `{dotted_name: np.ndarray}` state dict (host-side; see
     `load_network_pkl_state_dict` which unpickles without executing the
     embedded torch source), plus `init_kwargs` for rebuilding configs;
  2. `convert_state_dict` maps names/layouts onto this package's modules:
       * conv weights  OIHW  -> HWIO   (transpose 2,3,1,0)
       * fc weights    [out,in] -> [in,out]
       * synthesis const [C,H,W] -> [H,W,C]
       * `noise_const`, `w_avg` -> the 'buffers' collection
       * `resample_filter` buffers are dropped (recomputed statically)

The name key-space is the same as `misc.copy_params_and_buffers`
(torch_utils/misc.py:157-189) relies on, so transplant rules (e.g.
backbone -> texture/face backbone) can be expressed as key-prefix rewrites.
"""

from __future__ import annotations

import io
import pickle
import re
from typing import Any, Dict, Mapping, Tuple

import numpy as np

_BUFFER_LEAVES = {"noise_const", "w_avg", "latent_avg", "black_uv_bg", "fourier_coefs"}
_BATCH_STATS_LEAVES = {"running_mean", "running_var"}
_DROP_LEAVES = {"resample_filter", "num_batches_tracked"}

# torch nn.Sequential index names -> this package's named layers.
# OSGDecoder (triplane_v20.py:421-426): decoder.net.0 / .net.2 = the two FCs.
_DEFAULT_REGEX_RENAMES = [
    (re.compile(r"(^|\.)decoder\.net\.0\."), r"\1decoder.fc0."),
    (re.compile(r"(^|\.)decoder\.net\.2\."), r"\1decoder.fc1."),
]


def _to_numpy(t) -> np.ndarray:
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def convert_array(name: str, arr: np.ndarray) -> np.ndarray:
    """Convert one torch tensor to this package's layout."""
    leaf = name.split(".")[-2] if name.endswith((".weight", ".bias")) else name.split(".")[-1]
    if name.endswith(".weight"):
        if arr.ndim == 4:  # conv OIHW -> HWIO
            return np.ascontiguousarray(np.transpose(arr, (2, 3, 1, 0)))
        if arr.ndim == 2:  # fc [out, in] -> [in, out]
            return np.ascontiguousarray(arr.T)
        return arr
    if leaf == "const" or name.endswith(".const"):
        if arr.ndim == 3:  # [C, H, W] -> [H, W, C]
            return np.ascontiguousarray(np.transpose(arr, (1, 2, 0)))
    if leaf == "black_uv_bg" and arr.ndim == 4:  # NCHW image buffer -> NHWC
        return np.ascontiguousarray(np.transpose(arr, (0, 2, 3, 1)))
    return arr


def convert_state_dict(
    state_dict: Mapping[str, Any],
    rename: Mapping[str, str] | None = None,
) -> Dict[str, Dict]:
    """Map a flat torch state dict to `{'params': ..., 'buffers': ...}` nested pytrees.

    Args:
        state_dict: `{dotted_name: tensor/ndarray}`.
        rename: optional key-prefix rewrites applied first (transplant rules).
    """
    params: Dict[str, Any] = {}
    buffers: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}
    for name, tensor in state_dict.items():
        if rename:
            for src, dst in rename.items():
                if name.startswith(src):
                    name = dst + name[len(src):]
                    break
        for pat, repl in _DEFAULT_REGEX_RENAMES:
            name = pat.sub(repl, name)
        leaf = name.split(".")[-1]
        if leaf in _DROP_LEAVES:
            continue
        arr = convert_array(name, _to_numpy(tensor))
        if leaf in _BATCH_STATS_LEAVES:
            tree = batch_stats
        elif leaf in _BUFFER_LEAVES:
            tree = buffers
        else:
            tree = params
        node = tree
        parts = name.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = np.asarray(arr)
    out = {"params": params}
    if buffers:
        out["buffers"] = buffers
    if batch_stats:
        out["batch_stats"] = batch_stats
    return out


class _TorchTensorStub:
    """Minimal stand-in reconstructed from a torch pickle without importing torch."""

    def __init__(self, storage, storage_offset, size, stride):
        self.storage = storage
        self.size = size
        self.stride = stride
        self.storage_offset = storage_offset

    def to_numpy(self) -> np.ndarray:
        dtype, data = self.storage
        flat = np.frombuffer(data, dtype=dtype)
        return np.lib.stride_tricks.as_strided(
            flat[self.storage_offset:],
            shape=self.size,
            strides=[s * flat.itemsize for s in self.stride],
        ).copy()


def flatten_tree(tree: Mapping, prefix: str = "") -> Dict[str, Any]:
    out = {}
    for k, v in tree.items():
        name = f"{prefix}.{k}" if prefix else str(k)
        if isinstance(v, Mapping):
            out.update(flatten_tree(v, name))
        else:
            out[name] = v
    return out


def state_dict_from_torch_module(module) -> Dict[str, np.ndarray]:
    """Flat numpy state dict from a live torch module (test-oracle path)."""
    return {k: _to_numpy(v) for k, v in module.state_dict().items()}
