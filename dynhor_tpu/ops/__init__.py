from . import rasterize, resize, roi_align, shading, silhouette  # noqa: F401
from .resize import resize_bicubic_align_corners, resize_nearest  # noqa: F401
from .roi_align import crop_and_resize  # noqa: F401
