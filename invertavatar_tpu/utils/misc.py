"""Foundation utilities (TPU-native analogue of the reference's dnnlib/torch_utils.misc).

Reference parity notes:
  * EasyDict               — dnnlib/util.py:42-55
  * assert_shape           — torch_utils/misc.py:84-100 (static-shape checks; under jit all
                             shapes are static so this is a pure trace-time assert)
  * construct_class_by_name— dnnlib/util.py:238-306 (string -> class reflection)
"""

from __future__ import annotations

import importlib
import re
from typing import Any, Optional, Sequence


class EasyDict(dict):
    """Attribute-style dict; the universal config object."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __delattr__(self, name: str) -> None:
        del self[name]


def assert_shape(x, ref_shape: Sequence[Optional[int]]) -> None:
    """Assert that a (traced or concrete) array has the given shape.

    `None` entries match any size. Shapes are static under jit, so this check
    costs nothing at runtime.
    """
    if x.ndim != len(ref_shape):
        raise AssertionError(f"Wrong number of dimensions: got {x.ndim}, expected {len(ref_shape)}")
    for idx, (size, ref_size) in enumerate(zip(x.shape, ref_shape)):
        if ref_size is not None and size != ref_size:
            raise AssertionError(f"Wrong size for dimension {idx}: got {size}, expected {ref_size}")


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def get_obj_by_name(name: str) -> Any:
    """Resolve a dotted path to a python object (module.attr...)."""
    parts = name.split(".")
    for i in range(len(parts) - 1, 0, -1):
        try:
            module = importlib.import_module(".".join(parts[:i]))
            obj = module
            for attr in parts[i:]:
                obj = getattr(obj, attr)
            return obj
        except (ImportError, AttributeError):
            continue
    raise ImportError(f"Cannot resolve object by name: {name}")

# Map the reference's torch class names onto this package so configs carried in
# imported checkpoints resolve (legacy.py-style class_name strings).
_CLASS_NAME_ALIASES = {
    "training_avatar_texture.triplane_v20.TriPlaneGenerator": "invertavatar_tpu.models.triplane.TriPlaneGenerator",
    "training_avatar_texture.superresolution.SuperresolutionHybrid8XDC": "invertavatar_tpu.models.superresolution.SuperresolutionHybrid8XDC",
    "training_avatar_texture.dual_discriminator.DualDiscriminator": "invertavatar_tpu.models.discriminator.DualDiscriminator",
}


def construct_class_by_name(*args, class_name: str, **kwargs) -> Any:
    class_name = _CLASS_NAME_ALIASES.get(class_name, class_name)
    return get_obj_by_name(class_name)(*args, **kwargs)


def parse_scaling(scaling) -> tuple:
    if isinstance(scaling, int):
        scaling = [scaling, scaling]
    sx, sy = scaling
    assert sx >= 1 and sy >= 1
    return int(sx), int(sy)


def parse_padding(padding) -> tuple:
    if isinstance(padding, int):
        padding = [padding, padding]
    padding = list(padding)
    if len(padding) == 2:
        px, py = padding
        padding = [px, px, py, py]
    px0, px1, py0, py1 = padding
    return int(px0), int(px1), int(py0), int(py1)


_snake_re = re.compile(r"(?<!^)(?=[A-Z])")


def format_time(seconds: float) -> str:
    s = int(round(seconds))
    if s < 60:
        return f"{s}s"
    if s < 3600:
        return f"{s // 60}m {s % 60:02d}s"
    if s < 86400:
        return f"{s // 3600}h {(s // 60) % 60:02d}m"
    return f"{s // 86400}d {(s // 3600) % 24:02d}h"
