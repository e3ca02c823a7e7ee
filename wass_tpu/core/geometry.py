"""Core 3D geometry primitives, pure jnp and fully batchable.

Replaces the scattered cv:: math of the reference (invert_RT in
/root/reference/src/wass_stereo/wass_stereo.cpp:184-199, quaternion utils in
/root/reference/src/wass_autocalibrate/sba_driver.cpp:37-278, plane-frame
construction in /root/reference/src/wass_stereo/PovMesh.cpp:1044-1074) with
a single functional module.  Everything is differentiable and vmappable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric cross-product matrix [v]_x. Batched over leading dims."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def rodrigues(rvec: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle vector -> rotation matrix (cv::Rodrigues forward).

    Written on the *unnormalized* vector, R = I + A [r]x + B [r]x^2 with
    A = sin(t)/t and B = (1-cos(t))/t^2, switching to Taylor series near
    t = 0 via the double-where trick — smooth and NaN-free under autodiff
    at the identity (the BA linearization point)."""
    t2 = jnp.sum(rvec * rvec, axis=-1)
    small = t2 < 1e-10
    safe_t2 = jnp.where(small, 1.0, t2)
    t = jnp.sqrt(safe_t2)
    A = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(t) / t)
    B = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(t)) / safe_t2)
    K = skew(rvec)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=rvec.dtype), K.shape)
    return eye + A[..., None, None] * K + B[..., None, None] * (K @ K)


def inv_rodrigues(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> axis-angle vector (cv::Rodrigues inverse).

    Uses the quaternion route, which is stable near theta = 0 and pi.
    """
    q = rot_to_quat(R)
    w = q[..., 0]
    v = q[..., 1:]
    sin_half = jnp.linalg.norm(v, axis=-1)
    half = jnp.arctan2(sin_half, w)
    scale = jnp.where(sin_half > 1e-12, 2.0 * half / jnp.where(sin_half > 1e-12, sin_half, 1.0), 2.0)
    return v * scale[..., None]


def invert_rt(R: jnp.ndarray, T: jnp.ndarray):
    """Invert the rigid transform x' = R x + T.

    Mirrors invert_RT (/root/reference/src/wass_stereo/wass_stereo.cpp:184-199).
    T may be (..., 3) or (..., 3, 1).
    """
    Rt = jnp.swapaxes(R, -1, -2)
    squeeze = T.shape[-1] == 1
    Tv = T[..., 0] if squeeze else T
    Tinv = -jnp.einsum("...ij,...j->...i", Rt, Tv)
    return Rt, (Tinv[..., None] if squeeze else Tinv)


def rt_from_plane(plane: jnp.ndarray):
    """Camera-frame -> sea-plane-frame transform from plane coeffs (a,b,c,d).

    Exactly the closed form of PovMesh::RT_from_plane
    (/root/reference/src/wass_stereo/PovMesh.cpp:1044-1070): R maps the plane
    normal onto +z, T = (0,0,d); returns (R, T, Rinv, Tinv) with
    Tinv = Rinv @ (-T).
    """
    a, b, c, d = plane[..., 0], plane[..., 1], plane[..., 2], plane[..., 3]
    q = (1.0 - c) / (a * a + b * b)
    R = jnp.stack(
        [
            jnp.stack([1.0 - a * a * q, -a * b * q, -a], axis=-1),
            jnp.stack([-a * b * q, 1.0 - b * b * q, -b], axis=-1),
            jnp.stack([a, b, c], axis=-1),
        ],
        axis=-2,
    )
    zero = jnp.zeros_like(d)
    T = jnp.stack([zero, zero, d], axis=-1)
    Rinv = jnp.swapaxes(R, -1, -2)
    Tinv = jnp.einsum("...ij,...j->...i", Rinv, -T)
    return R, T, Rinv, Tinv


def quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (w, x, y, z) -> rotation matrix. Batched."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], axis=-1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], axis=-1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], axis=-1),
        ],
        axis=-2,
    )


def rot_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> unit quaternion (w, x, y, z), w >= 0. Batched.

    Branch-free variant of the Shepperd method: computes all four
    candidate quaternions and selects the best-conditioned one with
    jnp.where, so it jits and vmaps cleanly.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, each scaled by 4*component^2 (all nonnegative).
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)

    # Pick the candidate whose pivot (diagonal term) is largest.
    pivots = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22], axis=-1)
    idx = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4 candidates, 4 comps)
    q = jnp.take_along_axis(cands, idx[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # Canonical sign: w >= 0.
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def normalize(v: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def solve3x3(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Closed-form 3x3 solve via the adjugate (batched, no LAPACK).

    Replaces the per-pixel cv::solve(DECOMP_LU) of the reference
    triangulator (/root/reference/src/wass_lib/triangulate.hpp:66-69) with a
    vectorized cofactor expansion that maps onto the VPU.
    """
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a10, a11, a12 = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    a20, a21, a22 = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    c00 = a11 * a22 - a12 * a21
    c01 = a02 * a21 - a01 * a22
    c02 = a01 * a12 - a02 * a11
    c10 = a12 * a20 - a10 * a22
    c11 = a00 * a22 - a02 * a20
    c12 = a02 * a10 - a00 * a12
    c20 = a10 * a21 - a11 * a20
    c21 = a01 * a20 - a00 * a21
    c22 = a00 * a11 - a01 * a10
    det = a00 * c00 + a01 * c10 + a02 * c20
    inv_det = jnp.where(jnp.abs(det) > 1e-30, 1.0 / det, 0.0)
    b0, b1, b2 = b[..., 0], b[..., 1], b[..., 2]
    x = jnp.stack(
        [
            (c00 * b0 + c01 * b1 + c02 * b2) * inv_det,
            (c10 * b0 + c11 * b1 + c12 * b2) * inv_det,
            (c20 * b0 + c21 * b1 + c22 * b2) * inv_det,
        ],
        axis=-1,
    )
    return x


def homogeneous_transform(H: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply a 3x3 homography to (..., 2) points with perspective divide."""
    x, y = pts[..., 0], pts[..., 1]
    w = H[..., 2, 0] * x + H[..., 2, 1] * y + H[..., 2, 2]
    u = H[..., 0, 0] * x + H[..., 0, 1] * y + H[..., 0, 2]
    v = H[..., 1, 0] * x + H[..., 1, 1] * y + H[..., 1, 2]
    w = jnp.where(jnp.abs(w) > 1e-20, w, 1e-20)
    return jnp.stack([u / w, v / w], axis=-1)
