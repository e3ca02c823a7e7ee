"""Polarimetric sea-surface analysis over the elevation grid.

Computational core of the wasspost `polarimetric_setup` command
(/root/reference/postproc/wasspost/wasspost.py:634-805): for each frame,
project every grid point into the camera, sample the Stokes components
(produced by the prepare stage's polarimetric path), compute per-point
viewing rays and incidence angles against the wave normals, and
accumulate the sequence averages (Stokes, normals, elevation, validity).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp

from wass_tpu.ops.sampling import bilinear_sample
from wass_tpu.post.geometry import compute_slope_and_normals


@dataclasses.dataclass
class PolarimetricAccumulator:
    S_avg: np.ndarray  # (H, W, 3) averaged Stokes
    N_avg: np.ndarray  # (H, W, 3) averaged normals
    Z_avg: np.ndarray  # (H, W)
    incidence_avg: np.ndarray  # (H, W) radians
    valid: np.ndarray  # (H, W) accumulation counts
    n_frames: int = 0

    @staticmethod
    def zeros(shape) -> "PolarimetricAccumulator":
        H, W = shape
        return PolarimetricAccumulator(
            S_avg=np.zeros((H, W, 3)),
            N_avg=np.zeros((H, W, 3)),
            Z_avg=np.zeros((H, W)),
            incidence_avg=np.zeros((H, W)),
            valid=np.zeros((H, W)),
        )

    def finalize(self):
        n = np.maximum(self.valid, 1)
        return (
            self.S_avg / n[..., None],
            self.N_avg / np.maximum(self.n_frames, 1),
            self.Z_avg / np.maximum(self.n_frames, 1),
            self.incidence_avg / n,
        )


def grid_projection_maps(Z: np.ndarray, XX: np.ndarray, YY: np.ndarray, Pplane: np.ndarray, image_size: Tuple[int, int]):
    """Per-grid-point image sampling maps + viewing rays (wasspost.py:666-700).

    Returns (mapx, mapy, rays_grid) with rays in the grid frame pointing
    from the camera toward each surface point.
    """
    Iw, Ih = image_size
    toNorm = np.array(
        [[2.0 / Iw, 0, -1, 0], [0, 2.0 / Ih, -1, 0], [0, 0, 1, 0], [0, 0, 0, 1]], float
    )
    Pcam = np.linalg.inv(toNorm) @ np.asarray(Pplane, float)
    p3d = np.stack([XX.ravel(), YY.ravel(), Z.ravel(), np.ones(XX.size)])
    p2d = Pcam @ p3d
    mapx = (p2d[0] / p2d[2]).reshape(Z.shape).astype(np.float32)
    mapy = (p2d[1] / p2d[2]).reshape(Z.shape).astype(np.float32)
    return mapx, mapy


def incidence_angles(Z, XX, YY, cam_origin_grid: np.ndarray):
    """Incidence angle between the camera ray and the wave normal at each
    grid point (wasspost.py:697-760 core)."""
    _, normals = compute_slope_and_normals(XX, YY, Z)
    rays = np.dstack([XX - cam_origin_grid[0], YY - cam_origin_grid[1], Z - cam_origin_grid[2]])
    rays = rays / np.linalg.norm(rays, axis=-1, keepdims=True)
    cosang = np.clip(-np.sum(rays * normals, axis=-1), -1.0, 1.0)
    return np.arccos(cosang), normals, rays


def accumulate_frame(
    acc: PolarimetricAccumulator,
    Z: np.ndarray,
    XX: np.ndarray,
    YY: np.ndarray,
    S0: np.ndarray,
    S1: np.ndarray,
    S2: np.ndarray,
    Pplane: np.ndarray,
    cam_origin_grid: np.ndarray,
) -> PolarimetricAccumulator:
    """Add one frame's grid-sampled Stokes + geometry to the accumulator."""
    Ih, Iw = S0.shape
    mapx, mapy = grid_projection_maps(Z, XX, YY, Pplane, (Iw, Ih))
    inb = (mapx >= 0) & (mapx < Iw - 1) & (mapy >= 0) & (mapy < Ih - 1) & np.isfinite(Z)
    mx = jnp.asarray(np.nan_to_num(mapx))
    my = jnp.asarray(np.nan_to_num(mapy))
    samp = lambda img: np.asarray(bilinear_sample(jnp.asarray(img, jnp.float32), mx, my))
    S = np.dstack([samp(S0), samp(S1), samp(S2)])

    ang, normals, _ = incidence_angles(np.nan_to_num(Z), XX, YY, cam_origin_grid)

    w = inb.astype(float)
    acc.S_avg += S * w[..., None]
    acc.N_avg += np.nan_to_num(normals)
    acc.Z_avg += np.nan_to_num(Z)
    acc.incidence_avg += ang * w
    acc.valid += w
    acc.n_frames += 1
    return acc
