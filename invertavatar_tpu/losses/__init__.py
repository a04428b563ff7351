from .lpips import LPIPS  # noqa: F401
from .id_loss import ArcFaceBackbone, id_loss  # noqa: F401
