from .layers import (  # noqa: F401
    Conv2dLayer,
    FullyConnectedLayer,
    SynthesisLayer,
    ToRGBLayer,
    modulated_conv2d,
)
from .mapping import MappingNetwork  # noqa: F401
from .synthesis import Generator, SynthesisBlock, SynthesisNetwork  # noqa: F401
