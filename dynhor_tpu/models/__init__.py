from . import dino  # noqa: F401
