from wass_tpu.match.features import FeatureSet, detect_features  # noqa: F401
from wass_tpu.match.iidyn import iidyn  # noqa: F401
from wass_tpu.match.matcher import gt_match  # noqa: F401
from wass_tpu.match.ransac import essential_ransac, recover_pose  # noqa: F401
