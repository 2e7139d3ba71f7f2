from . import bbox, camera, geometry, masks  # noqa: F401
