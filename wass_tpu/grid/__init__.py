from wass_tpu.grid.setup import grid_setup, GridSetup  # noqa: F401
from wass_tpu.grid.gridding import grid_frame, grid_sequence  # noqa: F401
from wass_tpu.grid.interpolators import dct_interpolate, idw_interpolate  # noqa: F401
