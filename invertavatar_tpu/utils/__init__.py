from .misc import EasyDict, assert_shape, cdiv  # noqa: F401
