from wass_tpu.stereo.cost import census_transform, census_cost_volume  # noqa: F401
from wass_tpu.stereo.sgm import sgm_aggregate, sgm_disparity  # noqa: F401
from wass_tpu.stereo.plane import ransac_find_plane, refine_plane, plane_distance  # noqa: F401
