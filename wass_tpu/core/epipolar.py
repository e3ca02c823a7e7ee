"""Epipolar / reprojection error statistics.

Batched, mask-aware equivalents of WASS::epi::evaluate_epipolar_error and
evaluate_structure_error (/root/reference/src/wass_lib/epipolar.cpp:7-80).
Both are quality gates: the matcher reports them to matcher_stats.csv and
autocalibrate accepts the SBA result only if the average epipolar error
improves (/root/reference/src/wass_autocalibrate/wass_autocalibrate.cpp:363-382).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp


class ErrorStats(NamedTuple):
    avg: jnp.ndarray
    std: jnp.ndarray
    min: jnp.ndarray
    max: jnp.ndarray


def _masked_stats(errors: jnp.ndarray, mask: Optional[jnp.ndarray]) -> ErrorStats:
    if mask is None:
        n = errors.size
        avg = jnp.mean(errors)
        std = jnp.sqrt(jnp.mean((errors - avg) ** 2))
        return ErrorStats(avg, std, jnp.min(errors), jnp.max(errors))
    m = mask.astype(errors.dtype)
    n = jnp.maximum(jnp.sum(m), 1.0)
    avg = jnp.sum(errors * m) / n
    std = jnp.sqrt(jnp.sum(m * (errors - avg) ** 2) / n)
    big = jnp.asarray(jnp.finfo(errors.dtype).max, errors.dtype)
    mn = jnp.min(jnp.where(mask, errors, big))
    mx = jnp.max(jnp.where(mask, errors, -big))
    return ErrorStats(avg, std, mn, mx)


def symmetric_epipolar_distance(F: jnp.ndarray, p0: jnp.ndarray, p1: jnp.ndarray) -> jnp.ndarray:
    """Per-correspondence symmetric epipolar distance (epipolar.cpp:16-29).

    err = 0.5 * ( |r^T F l| / ||(F l)_{xy}||  +  |l^T F^T r| / ||(F^T r)_{xy}|| )
    """
    l = jnp.concatenate([p0, jnp.ones_like(p0[..., :1])], axis=-1)
    r = jnp.concatenate([p1, jnp.ones_like(p1[..., :1])], axis=-1)
    Fl = l @ F.T  # (..., 3) = F @ l
    Fr = r @ F  # (..., 3) = F^T @ r
    num = jnp.abs(jnp.sum(Fl * r, axis=-1))
    d0 = num / jnp.sqrt(Fl[..., 0] ** 2 + Fl[..., 1] ** 2 + 1e-30)
    d1 = num / jnp.sqrt(Fr[..., 0] ** 2 + Fr[..., 1] ** 2 + 1e-30)
    return 0.5 * (d0 + d1)


def sampson_distance(F: jnp.ndarray, p0: jnp.ndarray, p1: jnp.ndarray) -> jnp.ndarray:
    """First-order geometric (Sampson) distance — the RANSAC scoring metric."""
    l = jnp.concatenate([p0, jnp.ones_like(p0[..., :1])], axis=-1)
    r = jnp.concatenate([p1, jnp.ones_like(p1[..., :1])], axis=-1)
    Fl = l @ F.T
    Fr = r @ F
    num = jnp.sum(Fl * r, axis=-1) ** 2
    den = Fl[..., 0] ** 2 + Fl[..., 1] ** 2 + Fr[..., 0] ** 2 + Fr[..., 1] ** 2
    return num / jnp.maximum(den, 1e-30)


def epipolar_error_stats(
    F: jnp.ndarray, p0: jnp.ndarray, p1: jnp.ndarray, mask: Optional[jnp.ndarray] = None
) -> ErrorStats:
    return _masked_stats(symmetric_epipolar_distance(F, p0, p1), mask)


def structure_error_stats(
    pts3d: jnp.ndarray,
    p0: jnp.ndarray,
    p1: jnp.ndarray,
    R: jnp.ndarray,
    T: jnp.ndarray,
    K0: jnp.ndarray,
    K1: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> ErrorStats:
    """Mean reprojection error of triangulated structure (epipolar.cpp:42-80)."""
    rep0 = pts3d @ K0.T
    rep0 = rep0[..., :2] / rep0[..., 2:3]
    x1 = pts3d @ R.T + T.reshape(3)
    rep1 = x1 @ K1.T
    rep1 = rep1[..., :2] / rep1[..., 2:3]
    err = 0.5 * (
        jnp.linalg.norm(rep0 - p0, axis=-1) + jnp.linalg.norm(rep1 - p1, axis=-1)
    )
    return _masked_stats(err, mask)
