from wass_tpu.post.spectra import compute_spectrum, compute_3d_spectrum, spectrum_stats  # noqa: F401
from wass_tpu.post.filters import temporal_butterworth, spatial_butterworth_lowpass  # noqa: F401
from wass_tpu.post.geometry import compute_slope_and_normals, compute_occlusion_mask  # noqa: F401
