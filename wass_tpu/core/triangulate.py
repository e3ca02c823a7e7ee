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

    # Rows 3 and 4 of Af, componentwise (rows 1-2 are constant-sparse).
    # Keeping every quantity as a separate (...,)-shaped array avoids the
    # (..., 3, 3) outer-product temporaries (3x memory traffic at 3 MP).
    a20 = qx * R[2, 0] - R[0, 0]
    a21 = qx * R[2, 1] - R[0, 1]
    a22 = qx * R[2, 2] - R[0, 2]
    a30 = qy * R[2, 0] - R[1, 0]
    a31 = qy * R[2, 1] - R[1, 1]
    a32 = qy * R[2, 2] - R[1, 2]
    b2 = T[0] - T[2] * qx
    b3 = T[1] - T[2] * qy

    # A = Af^T Af (symmetric; rows 1-2 contribute
    # [[1,0,-px],[0,1,-py],[-px,-py,px^2+py^2]]).
    A00 = a20 * a20 + a30 * a30 + 1.0
    A01 = a20 * a21 + a30 * a31
    A02 = a20 * a22 + a30 * a32 - px
    A11 = a21 * a21 + a31 * a31 + 1.0
    A12 = a21 * a22 + a31 * a32 - py
    A22 = a22 * a22 + a32 * a32 + px * px + py * py

    b0 = a20 * b2 + a30 * b3
    b1 = a21 * b2 + a31 * b3
    bb2 = a22 * b2 + a32 * b3

    # Closed-form symmetric 3x3 solve via the adjugate.
    c00 = A11 * A22 - A12 * A12
    c01 = A02 * A12 - A01 * A22
    c02 = A01 * A12 - A02 * A11
    c11 = A00 * A22 - A02 * A02
    c12 = A01 * A02 - A00 * A12
    c22 = A00 * A11 - A01 * A01
    det = A00 * c00 + A01 * c01 + A02 * c02
    inv_det = jnp.where(jnp.abs(det) > 1e-30, 1.0 / det, 0.0)
    x = jnp.stack(
        [
            (c00 * b0 + c01 * b1 + c02 * bb2) * inv_det,
            (c01 * b0 + c11 * b1 + c12 * bb2) * inv_det,
            (c02 * b0 + c12 * b1 + c22 * bb2) * inv_det,
        ],
        axis=-1,
    )
    return x


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
