from wass_tpu.ops.sampling import (  # noqa: F401
    bilinear_sample,
    bicubic_sample,
    warp_homography,
    undistort_image,
    undistort_points,
    distort_points,
    resize,
)
from wass_tpu.ops.morphology import dilate_zero, erode_zero, median_filter  # noqa: F401
from wass_tpu.ops.components import biggest_component_mask, label_components  # noqa: F401
