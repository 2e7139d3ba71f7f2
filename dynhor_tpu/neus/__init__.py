from . import data, extract, fields, rendering, trainer  # noqa: F401
