"""Essential-matrix RANSAC + pose recovery, fully batched.

Replaces cv::findEssentialMat / cv::recoverPose / decomposeEssentialMat as
used by the matcher (/root/reference/src/wass_match/wass_match.cpp:280-330)
and autocalibrate (/root/reference/src/wass_autocalibrate/wass_autocalibrate.cpp:177-220):
instead of sequential RANSAC rounds, all minimal samples are drawn up
front, every hypothesis is solved with a batched 8-point SVD, and the best
model by Sampson-inlier count is refit on its inliers.  The 4-way E
decomposition with chirality voting mirrors the reference's explicit
alternative enumeration (:183-220, including the R00 tie-break).

All coordinates are *normalized* (K^-1 applied) like the reference's usage.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from wass_tpu.core.epipolar import sampson_distance
from wass_tpu.core.triangulate import triangulate_normalized


class EssentialResult(NamedTuple):
    E: jnp.ndarray  # (3, 3)
    inliers: jnp.ndarray  # (N,) bool
    n_inliers: jnp.ndarray


def _eight_point(p0: jnp.ndarray, p1: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Weighted 8-point estimate from (N, 2) correspondences; returns E with
    the essential constraint (two equal singular values, third zero)."""
    x0, y0 = p0[:, 0], p0[:, 1]
    x1, y1 = p1[:, 0], p1[:, 1]
    ones = jnp.ones_like(x0)
    A = jnp.stack([x1 * x0, x1 * y0, x1, y1 * x0, y1 * y0, y1, x0, y0, ones], axis=-1)
    A = A * w[:, None]
    # Null vector of A: smallest eigenvector of A^T A (9x9).
    M = A.T @ A
    _, V = jnp.linalg.eigh(M)
    e = V[:, 0]
    E = e.reshape(3, 3)
    # Project onto the essential manifold.
    U, S, Vt = jnp.linalg.svd(E)
    s = (S[0] + S[1]) / 2.0
    E = U @ jnp.diag(jnp.array([s, s, 0.0], E.dtype)) @ Vt
    return E


@partial(jax.jit, static_argnames=("n_hypotheses",))
def essential_ransac(
    p0: jnp.ndarray,
    p1: jnp.ndarray,
    valid: jnp.ndarray,
    key: jax.Array,
    threshold: float,
    n_hypotheses: int = 1024,
    refit_rounds: int = 2,
) -> EssentialResult:
    """RANSAC essential matrix on normalized correspondences.

    threshold: max Sampson distance in *normalized* units (the reference
    passes pixel_threshold / focal, wass_match.cpp:280).
    """
    N = p0.shape[0]
    keys = jax.random.split(key, n_hypotheses)

    # Sample with probability weighted toward valid entries: draw indices
    # uniformly then reject hypotheses containing invalid points.
    def hypothesis(k):
        idx = jax.random.randint(k, (8,), 0, N)
        ok = jnp.all(valid[idx])
        E = _eight_point(p0[idx], p1[idx], jnp.ones(8, p0.dtype))
        d = sampson_distance(E, p0, p1)
        inl = (d < threshold * threshold) & valid
        score = jnp.where(ok, jnp.sum(inl), -1)
        return score, E

    scores, Es = jax.vmap(hypothesis)(keys)
    best = jnp.argmax(scores)
    E = Es[best]

    # Iterative refit on inliers (weighted all-point 8-point).
    def refit(E, _):
        d = sampson_distance(E, p0, p1)
        inl = (d < threshold * threshold) & valid
        w = inl.astype(p0.dtype)
        E2 = _eight_point(p0, p1, w)
        return E2, None

    E, _ = jax.lax.scan(refit, E, None, length=refit_rounds)
    d = sampson_distance(E, p0, p1)
    inliers = (d < threshold * threshold) & valid
    return EssentialResult(E=E, inliers=inliers, n_inliers=jnp.sum(inliers))


class PoseResult(NamedTuple):
    R: jnp.ndarray  # (3, 3) with x1 = R x0 + T
    T: jnp.ndarray  # (3,), unit norm
    n_valid: jnp.ndarray  # chirality votes of the winner


def decompose_essential(E: jnp.ndarray):
    """E -> (R1, R2, t) (cv::decomposeEssentialMat semantics)."""
    U, _, Vt = jnp.linalg.svd(E)
    # Enforce proper rotations.
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    return R1, R2, t


@jax.jit
def recover_pose(E: jnp.ndarray, p0: jnp.ndarray, p1: jnp.ndarray, mask: jnp.ndarray) -> PoseResult:
    """Chirality vote over the 4 (R, T) alternatives
    (wass_autocalibrate.cpp:183-220 / count_valid_points :41-57): triangulate
    masked correspondences, count z > 1 in camera 0, tie-break on larger
    R[0,0]."""
    R1, R2, t = decompose_essential(E)
    alts_R = jnp.stack([R1, R1, R2, R2])
    alts_T = jnp.stack([t, -t, t, -t])

    def votes(R, T):
        pts = triangulate_normalized(p0, p1, R, T)
        return jnp.sum((pts[:, 2] > 1.0) & mask)

    v = jax.vmap(votes)(alts_R, alts_T)
    # Tie-break: prefer larger R00 among equal vote counts (:208).
    r00 = alts_R[:, 0, 0]
    order = v.astype(jnp.float32) + 1e-6 * r00
    best = jnp.argmax(order)
    return PoseResult(R=alts_R[best], T=alts_T[best], n_valid=v[best])
