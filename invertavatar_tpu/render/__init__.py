from .ray_sampler import sample_rays  # noqa: F401
from .ray_marcher import mip_ray_march  # noqa: F401
from .renderer import ImportanceRenderer, sample_from_planes  # noqa: F401
from .mouth import fill_mouth  # noqa: F401
