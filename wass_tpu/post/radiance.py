"""Sea-surface radiance analysis over the elevation grid.

Ports of the wasspost radiance family
(/root/reference/postproc/wasspost/wasspost.py:822-1145):

* radiance_frame: remap a camera image onto the sea grid through the
  normalized plane-projection matrix (jitted bilinear gather instead of
  cv::remap);
* bg_radiance: time-wise box filter of a radiance cube (the bgimage
  command, :1014-1074);
* radiance_threshold: background-subtracted binarization, optionally with
  the VATS automatic threshold (histogram max-distance knee, :1084-1145).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from wass_tpu.ops.sampling import bilinear_sample


@jax.jit
def _remap(img, mapx, mapy):
    return bilinear_sample(img, mapx, mapy)


def radiance_frame(
    img: np.ndarray,
    Z: np.ndarray,
    XX: np.ndarray,
    YY: np.ndarray,
    Pplane: np.ndarray,
) -> np.ndarray:
    """Grid-texture radiance of one frame: for every grid point (x, y,
    z(x,y)), sample the camera image at its projection.  Pplane is the
    normalized 4x4 projection (gridded.nc meta P{cam}plane); img intensity
    is returned in [0, 1]."""
    Ih, Iw = img.shape
    toNorm = np.array(
        [[2.0 / Iw, 0, -1, 0], [0, 2.0 / Ih, -1, 0], [0, 0, 1, 0], [0, 0, 0, 1]], float
    )
    Pcam = np.linalg.inv(toNorm) @ np.asarray(Pplane, float)
    p3d = np.stack([XX.ravel(), YY.ravel(), Z.ravel(), np.ones(XX.size)])
    p2d = Pcam @ p3d
    mapx = (p2d[0] / p2d[2]).reshape(Z.shape).astype(np.float32)
    mapy = (p2d[1] / p2d[2]).reshape(Z.shape).astype(np.float32)
    out = _remap(jnp.asarray(img, jnp.float32), jnp.asarray(mapx), jnp.asarray(mapy))
    return np.asarray(out) / 255.0


def bg_radiance(cube: np.ndarray, filtersize: int) -> np.ndarray:
    """Temporal box filter (uniform_filter1d along axis 0, reflect mode)."""
    from scipy.ndimage import uniform_filter1d

    return uniform_filter1d(np.asarray(cube, np.float32), size=filtersize, axis=0, mode="reflect")


def vats_threshold(values: np.ndarray, bins: int = 30) -> float:
    """VATS automatic threshold (wasspost.py:1119-1139): the histogram knee
    at maximum distance from the peak->tail chord."""
    h, bin_edges = np.histogram(values, bins=bins, density=True)
    xx = np.arange(h.shape[0])
    pts = np.concatenate([xx[None], h[None], np.ones((1, h.shape[0]))])
    peak_idx = int(np.argmax(h))
    l = np.cross(pts[:, peak_idx], pts[:, -1])
    distances = np.abs(l @ pts)
    threshold_idx = int(np.argmax(distances[peak_idx:])) + peak_idx
    return float(bin_edges[threshold_idx + 1])


def radiance_threshold(
    radiance: np.ndarray,
    bg: np.ndarray,
    threshold_val: float = 0.35,
    use_vats: bool = False,
) -> np.ndarray:
    """Per-frame background-subtracted binarization (:1126-1145)."""
    out = np.zeros(radiance.shape, np.uint8)
    for i in range(radiance.shape[0]):
        I = radiance[i]
        Ibg = bg[i]
        Isub = I - (Ibg - np.nanmin(Ibg))
        t = vats_threshold(Isub) if use_vats else threshold_val
        out[i] = (Isub > t).astype(np.uint8)
    return out
