from .projector import project_w_plus  # noqa: F401
