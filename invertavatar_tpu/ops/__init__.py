from .bias_act import bias_act, activation_funcs  # noqa: F401
from .upfirdn2d import (  # noqa: F401
    setup_filter,
    upfirdn2d,
    filter2d,
    upsample2d,
    downsample2d,
)
from .conv2d_resample import conv2d_resample  # noqa: F401
from .grid_sample import grid_sample  # noqa: F401
from .resize import resize_bilinear  # noqa: F401
