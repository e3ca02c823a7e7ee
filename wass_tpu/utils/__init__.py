from wass_tpu.utils.timer import StageTimer  # noqa: F401
from wass_tpu.utils.progress import progress  # noqa: F401
