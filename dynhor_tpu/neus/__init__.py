from . import extract, fields, rendering, trainer  # noqa: F401
