"""Two-view linear-LSQ triangulation, batched over arbitrary leading dims.

The reference triangulates one pixel at a time with normal equations and a
3x3 LU solve (triangulate() in /root/reference/src/wass_lib/triangulate.hpp:26-72,
called per-pixel from wass_stereo.cpp:1345 and per-match from
wass_autocalibrate.cpp:262).  Here the same normal-equations form is built
directly as batched elementwise math + a closed-form 3x3 solve, so millions
of pixels triangulate as a handful of fused VPU ops.

Geometry: camera 0 at the origin, camera 1 with x1 = R x0 + T.  Inputs are
*normalized* image coordinates p (cam0) and q (cam1): p = K0^-1 [u,v,1].
"""

from __future__ import annotations

import jax.numpy as jnp

from wass_tpu.core.geometry import solve3x3


def triangulate_normalized(p: jnp.ndarray, q: jnp.ndarray, R: jnp.ndarray, T: jnp.ndarray) -> jnp.ndarray:
    """Triangulate normalized correspondences.

    Args:
      p: (..., 2) normalized coords in camera 0.
      q: (..., 2) normalized coords in camera 1.
      R: (3, 3) rotation, T: (3,) or (3, 1) translation of camera 1.

    Returns:
      (..., 3) points in camera-0 coordinates.

    This is the midpoint-style linear least squares of the reference: rows
      [-1, 0, px], [0, -1, py],
      [qx*R2 - R0], [qy*R2 - R1]
    with rhs [0, 0, T0 - T2*qx, T1 - T2*qy], solved via A^T A x = A^T b.
    """
    T = T.reshape(3)
    px, py = p[..., 0], p[..., 1]
    qx, qy = q[..., 0], q[..., 1]

    r0 = R[0]
    r1 = R[1]
    r2 = R[2]

    # Row 3 and 4 of Af (rows 1,2 are constant-sparse).
    a2 = qx[..., None] * r2 - r0  # (..., 3)
    a3 = qy[..., None] * r2 - r1  # (..., 3)
    b2 = T[0] - T[2] * qx
    b3 = T[1] - T[2] * qy

    # A = Af^T Af accumulated from the four rows; rows 1-2 contribute the
    # sparse pattern [[1,0,-px],[0,1,-py],[-px,-py,px^2+py^2]].
    A = jnp.einsum("...i,...j->...ij", a2, a2) + jnp.einsum("...i,...j->...ij", a3, a3)
    sparse = jnp.stack(
        [
            jnp.stack([jnp.ones_like(px), jnp.zeros_like(px), -px], axis=-1),
            jnp.stack([jnp.zeros_like(px), jnp.ones_like(px), -py], axis=-1),
            jnp.stack([-px, -py, px * px + py * py], axis=-1),
        ],
        axis=-2,
    )
    A = A + sparse

    b = a2 * b2[..., None] + a3 * b3[..., None]
    return solve3x3(A, b)


def triangulate_pixels(
    uv0: jnp.ndarray,
    uv1: jnp.ndarray,
    K0: jnp.ndarray,
    K1: jnp.ndarray,
    R: jnp.ndarray,
    T: jnp.ndarray,
) -> jnp.ndarray:
    """Pixel-coordinate front end (triangulate.hpp:149-154): normalize by K
    (fx, fy, cx, cy only — images are undistorted upstream) then triangulate."""
    p = jnp.stack(
        [(uv0[..., 0] - K0[0, 2]) / K0[0, 0], (uv0[..., 1] - K0[1, 2]) / K0[1, 1]],
        axis=-1,
    )
    q = jnp.stack(
        [(uv1[..., 0] - K1[0, 2]) / K1[0, 0], (uv1[..., 1] - K1[1, 2]) / K1[1, 1]],
        axis=-1,
    )
    return triangulate_normalized(p, q, R, T)
