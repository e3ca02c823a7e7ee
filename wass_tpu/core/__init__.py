from wass_tpu.core.geometry import (  # noqa: F401
    rodrigues,
    inv_rodrigues,
    invert_rt,
    rt_from_plane,
    quat_to_rot,
    rot_to_quat,
    skew,
)
from wass_tpu.core.triangulate import triangulate_normalized, triangulate_pixels  # noqa: F401
from wass_tpu.core.epipolar import epipolar_error_stats, structure_error_stats  # noqa: F401
