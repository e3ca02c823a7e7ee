from wass_tpu.calib.ba import lm_refine_two_view, BAResult  # noqa: F401
from wass_tpu.calib.autocalibrate import autocalibrate_sequence, AutocalResult  # noqa: F401
