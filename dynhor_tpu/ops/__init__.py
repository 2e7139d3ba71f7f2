from . import (  # noqa: F401
    rasterize,
    rasterize_tiled,
    resize,
    roi_align,
    shading,
    silhouette,
    silhouette_pallas,
)
from .resize import resize_bicubic_align_corners, resize_nearest  # noqa: F401
from .roi_align import crop_and_resize  # noqa: F401
