"""Grid-organized point-cloud operations (PovMesh method equivalents).

Covers the remaining PovMesh surface ops not already in the dense
pipeline: Laplacian smoothing (PovMesh.cpp:990-1040) and rigid cropping
(crop, :263-289 via the bbox semantics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def laplacian_smooth(points: jnp.ndarray, valid: jnp.ndarray, steps: int = 1) -> jnp.ndarray:
    """Validity-aware Laplacian smoothing of a (H, W, 3) point grid:
    each valid point moves to the mean of its valid 4-neighbors
    (PovMesh::laplacian_smooth)."""

    def one(points):
        p = jnp.pad(points, ((1, 1), (1, 1), (0, 0)))
        v = jnp.pad(valid, ((1, 1), (1, 1)))
        H, W, _ = points.shape
        acc = jnp.zeros_like(points)
        cnt = jnp.zeros(points.shape[:2], points.dtype)
        for dy, dx in ((0, 1), (2, 1), (1, 0), (1, 2)):
            nb = p[dy : dy + H, dx : dx + W]
            nv = v[dy : dy + H, dx : dx + W].astype(points.dtype)
            acc = acc + nb * nv[..., None]
            cnt = cnt + nv
        mean = acc / jnp.maximum(cnt, 1.0)[..., None]
        ok = valid & (cnt > 0)
        return jnp.where(ok[..., None], mean, points)

    for _ in range(steps):
        points = one(points)
    return points


def crop_grid(valid: jnp.ndarray, top: int, left: int, bottom: int, right: int) -> jnp.ndarray:
    """Invalidate everything outside the [top:bottom, left:right] window of
    the grid (PovMesh::crop semantics)."""
    H, W = valid.shape
    yy = jnp.arange(H)[:, None]
    xx = jnp.arange(W)[None, :]
    inside = (yy >= top) & (yy < bottom) & (xx >= left) & (xx < right)
    return valid & inside


def measure_distance(p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    """Two-point distance (the wass_stereo --measure workflow,
    wass_stereo.cpp:1934-1973, without the interactive picker)."""
    return jnp.linalg.norm(jnp.asarray(p1) - jnp.asarray(p2))
