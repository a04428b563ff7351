from .model import FaceVerseModel, load_faceverse_assets  # noqa: F401
from .manager import FaceverseManager  # noqa: F401
