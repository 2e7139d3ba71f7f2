from . import artifacts, config  # noqa: F401
