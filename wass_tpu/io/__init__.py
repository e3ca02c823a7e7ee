from wass_tpu.io.matrices import load_matrix, save_matrix_xml, save_matrix_txt, load_matrix_txt  # noqa: F401
from wass_tpu.io.xyzc import save_xyz_compressed, load_camera_mesh  # noqa: F401
from wass_tpu.io.workdir import Workdir  # noqa: F401
