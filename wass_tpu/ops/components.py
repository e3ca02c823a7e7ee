"""Connected-component labeling as iterative label propagation.

The reference extracts connected components twice: cv::connectedComponents
on the disparity mask (/root/reference/src/wass_stereo/wass_stereo.cpp:966-986)
and a z-gap-gated flood fill over the grid-organized point cloud
(PovMesh::cluster_biggest_connected_component,
/root/reference/src/wass_stereo/PovMesh.cpp:929-987 with 4-neighborhood gating
in :147-188).  Flood fill is inherently sequential; on TPU we instead run
*min-label propagation*: initialize every valid pixel with its linear index
and repeatedly propagate the minimum label across valid edges.  Each
iteration uses segmented associative scans along rows and columns, which
propagate labels across an entire row/column segment in one scan, so
convergence needs only ~(number of "spiral arms") iterations rather than
~diameter.

Edges can be gated per-direction (the |dz| < zgap criterion) via edge_h /
edge_v masks.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_INF = jnp.int32(2**31 - 1)


def _seg_min_scan(labels: jnp.ndarray, connect: jnp.ndarray, axis: int, reverse: bool) -> jnp.ndarray:
    """Segmented running-min of labels along axis.

    connect[i] == True means element i is connected to its predecessor
    (element i-1 along the scan direction), i.e. the min may flow across.
    """

    def op(a, b):
        la, _ = a
        lb, cb = b
        return jnp.where(cb, jnp.minimum(la, lb), lb), a[1] & cb

    lbl, _ = jax.lax.associative_scan(op, (labels, connect), axis=axis, reverse=reverse)
    return lbl


def label_components(
    valid: jnp.ndarray,
    edge_h: Optional[jnp.ndarray] = None,
    edge_v: Optional[jnp.ndarray] = None,
    max_iters: int = 12,
    use_pallas: bool = False,
) -> jnp.ndarray:
    """Label 4-connected components of a validity mask.

    Args:
      valid: (H, W) bool mask.
      edge_h: (H, W-1) bool — edge between (y,x) and (y,x+1) is traversable.
      edge_v: (H-1, W) bool — edge between (y,x) and (y+1,x) is traversable.
      max_iters: propagation-iteration cap (while_loop exits early on
        convergence).

    Returns:
      (H, W) int32 labels; invalid pixels get INT32_MAX.  Labels are the
      minimum linear index of each component (not densified).
    """
    if use_pallas:
        from wass_tpu.ops.components_pallas import label_components_pallas

        return label_components_pallas(valid, edge_h, edge_v, max_iters)

    H, W = valid.shape
    idx = jnp.arange(H * W, dtype=jnp.int32).reshape(H, W)
    init = jnp.where(valid, idx, _INF)

    if edge_h is None:
        edge_h = jnp.ones((H, W - 1), bool)
    if edge_v is None:
        edge_v = jnp.ones((H - 1, W), bool)
    # Connectivity arrays aligned with scan element positions.
    conn_right = jnp.concatenate([jnp.zeros((H, 1), bool), edge_h & valid[:, :-1] & valid[:, 1:]], axis=1)
    conn_down = jnp.concatenate([jnp.zeros((1, W), bool), edge_v & valid[:-1, :] & valid[1:, :]], axis=0)
    # For reversed scans the "predecessor" is the next element.
    conn_left = jnp.concatenate([conn_right[:, 1:], jnp.zeros((H, 1), bool)], axis=1)
    conn_up = jnp.concatenate([conn_down[1:, :], jnp.zeros((1, W), bool)], axis=0)

    def one_round(lbl):
        lbl = _seg_min_scan(lbl, conn_right, axis=1, reverse=False)
        lbl = _seg_min_scan(lbl, conn_left, axis=1, reverse=True)
        lbl = _seg_min_scan(lbl, conn_down, axis=0, reverse=False)
        lbl = _seg_min_scan(lbl, conn_up, axis=0, reverse=True)
        return lbl

    # Fixed iteration count (fori_loop): a convergence check would cost a
    # full-array compare + a host-visible sync per round; each round's four
    # segmented scans propagate labels across entire row/column runs, so
    # max_iters rounds handle components whose shape needs that many
    # alternations (~2x the number of "spiral turns" — far beyond anything
    # a wave surface produces).
    labels = jax.lax.fori_loop(0, max_iters, lambda _, lbl: one_round(lbl), init)
    return jnp.where(valid, labels, _INF)


def component_sizes(labels: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel size of the component each pixel belongs to (exact;
    scatter-based — fine for small grids, prefer biggest_component_mask's
    sort-based path on large frames)."""
    H, W = labels.shape
    flat = labels.reshape(-1)
    counts = jnp.zeros((H * W + 1,), jnp.int32)
    safe = jnp.where(valid.reshape(-1), flat, H * W)
    counts = counts.at[safe].add(1)
    sizes = counts[jnp.clip(flat, 0, H * W - 1)]
    return jnp.where(valid, sizes.reshape(H, W), 0)


def _modal_label(labels: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Label of the largest component, scatter-free: sort the flat labels
    and find the longest run via a cumulative-max of run boundaries.
    Ties resolve to the smallest label (runs are sorted ascending).

    On large frames the vote runs on a stride-4 systematic subsample: TPU
    sorts are O(n log^2 n) bitonic and dominate at megapixel scale, and a
    1/16 sample ranks component sizes reliably (the surviving component is
    orders of magnitude larger than outlier blobs)."""
    if labels.size > (1 << 20):
        labels = labels[::4, ::4]
        valid = valid[::4, ::4]
    flat = jnp.where(valid, labels, _INF).reshape(-1)
    s = jnp.sort(flat)
    n = s.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    boundary = jnp.concatenate([jnp.ones(1, bool), s[1:] != s[:-1]])
    last_boundary = jax.lax.associative_scan(jnp.maximum, jnp.where(boundary, pos, -1))
    runlen = pos - last_boundary + 1
    runlen = jnp.where(s == _INF, 0, runlen)
    i_best = jnp.argmax(runlen)
    return s[i_best]


def biggest_component_mask(
    valid: jnp.ndarray,
    edge_h: Optional[jnp.ndarray] = None,
    edge_v: Optional[jnp.ndarray] = None,
    max_iters: int = 12,
    use_pallas: bool = False,
) -> jnp.ndarray:
    """Mask of the largest connected component of `valid`."""
    labels = label_components(valid, edge_h, edge_v, max_iters, use_pallas=use_pallas)
    best_label = _modal_label(labels, valid)
    return (labels == best_label) & valid


def zgap_component_mask(z: jnp.ndarray, valid: jnp.ndarray, max_zgap: jnp.ndarray, max_iters: int = 12, use_pallas: bool = False) -> jnp.ndarray:
    """Largest component where 4-neighbors connect only if |dz| < max_zgap.

    This is the TPU form of PovMesh::cluster_biggest_connected_component
    (PovMesh.cpp:929-987): the same edge criterion as
    get_non_visited_neighbours (:147-188).
    """
    edge_h = jnp.abs(z[:, :-1] - z[:, 1:]) < max_zgap
    edge_v = jnp.abs(z[:-1, :] - z[1:, :]) < max_zgap
    return biggest_component_mask(valid, edge_h, edge_v, max_iters, use_pallas=use_pallas)
