from wass_tpu.prepare.prepare import prepare_frame, PrepareConfig  # noqa: F401
from wass_tpu.prepare.clahe import clahe  # noqa: F401
from wass_tpu.prepare.polar import demosaic, polarimetric_process  # noqa: F401
