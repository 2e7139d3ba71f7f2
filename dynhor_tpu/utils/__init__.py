from . import bbox, camera, constants, geometry, masks, objio, profiling  # noqa: F401
