"""Semi-global matching cost aggregation + disparity extraction.

This replaces cv::StereoSGBM::compute — the hottest loop of the entire
reference pipeline (/root/reference/src/wass_stereo/wass_stereo.cpp:837,
SURVEY.md §3.4).  The SGM recurrence along a scan direction r is

    L_r(p, d) = C(p, d) + min( L_r(p-r, d),
                               L_r(p-r, d-1) + P1,
                               L_r(p-r, d+1) + P1,
                               min_k L_r(p-r, k) + P2 ) - min_k L_r(p-r, k)

TPU mapping: the recurrence is sequential along the scan direction but
dense over the two free axes, so each direction is a single lax.scan whose
carry is an (H, D) or (W, D) slab — hundreds of thousands of lanes per
step, which keeps the VPU saturated.  Opposite directions are fused into
one scan by flipping the cost volume (x2 state, half the scans); diagonal
directions reuse the row scan with a per-step lateral roll of the carry.

All aggregation is integer (int16): census costs are <= 64, so the
normalized per-direction bound is max_cost + P2 and an 8-direction sum
stays well inside int16.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

INVALID = jnp.float32(0.0)  # invalid disparity marker (reference uses 0)

_BIG = jnp.int16(32000)


def _sgm_step(prev: jnp.ndarray, cost: jnp.ndarray, P1: int, P2: int) -> jnp.ndarray:
    """One SGM update: prev, cost are (..., D) int16 -> (..., D) int16."""
    minprev = jnp.min(prev, axis=-1, keepdims=True)
    up = jnp.concatenate([prev[..., :1] * 0 + _BIG, prev[..., :-1]], axis=-1)
    dn = jnp.concatenate([prev[..., 1:], prev[..., :1] * 0 + _BIG], axis=-1)
    best = jnp.minimum(
        jnp.minimum(prev, minprev + jnp.int16(P2)),
        jnp.minimum(up, dn) + jnp.int16(P1),
    )
    return cost + best - minprev


def _scan_slabs(cost_sw: jnp.ndarray, P1: int, P2: int, shift: int = 0) -> jnp.ndarray:
    """Scan SGM along axis 0 of cost_sw with shape (S, ..., B, D): S
    sequential steps over slabs.  `shift` rolls the carry by that many
    positions along the B axis per step (for diagonal directions), with the
    entering boundary neutralized to a fresh start.
    """

    def step(carry, c):
        if shift != 0:
            carry = jnp.roll(carry, shift, axis=-2)
            # Pixels entering at the roll boundary must not inherit costs
            # from the opposite edge: neutralize to BIG (fresh start).
            if shift > 0:
                carry = carry.at[..., :shift, :].set(_BIG)
            else:
                carry = carry.at[..., shift:, :].set(_BIG)
        out = _sgm_step(carry, c.astype(jnp.int16), P1, P2)
        return out, out

    # BIG carry makes the first step reduce to L = C (fresh start).
    # Inputs stay uint8 in HBM; the int16 upcast happens per-slab in the
    # scan body, halving the resident cost-volume footprint.
    init = jnp.full(cost_sw.shape[1:], _BIG, jnp.int16)
    _, agg = jax.lax.scan(step, init, cost_sw)
    return agg


def sgm_aggregate(cost: jnp.ndarray, P1: int, P2: int, directions: int = 8) -> jnp.ndarray:
    """Aggregate an (H, W, D) uint8/int16 cost volume over SGM paths.

    directions: 4 (horizontal+vertical) or 8 (plus diagonals).
    Returns (H, W, D) int16 aggregated cost sum.
    """
    assert directions in (2, 4, 8)
    c = cost if cost.dtype == jnp.uint8 else cost.astype(jnp.uint8)
    H, W, D = c.shape

    # Horizontal pair: scan over x; state slab = rows.  Stack the
    # left-to-right volume and the flipped right-to-left volume so both
    # directions ride one scan.  Each pair's (S, ..., D) output is folded
    # into the running sum immediately so at most one direction-pair
    # volume is live beyond the accumulator.
    lr = jnp.transpose(c, (1, 0, 2))  # (W, H, D)
    h_in = jnp.concatenate([lr, lr[::-1]], axis=1)  # (W, 2H, D)
    h_out = _scan_slabs(h_in, P1, P2)
    agg = jnp.transpose(h_out[:, :H], (1, 0, 2)) + jnp.transpose(h_out[::-1, H:], (1, 0, 2))

    if directions >= 4:
        v_in = jnp.concatenate([c, c[::-1]], axis=1)  # (H, 2W, D): scan over y
        v_out = _scan_slabs(v_in, P1, P2)
        agg = agg + v_out[:, :W] + v_out[::-1, W:]

    if directions == 8:
        # Diagonals: scan over y with the carry rolled +-1 in x per step.
        # The two vertical orientations are stacked on a *separate* axis so
        # the lateral roll cannot leak across them.
        dd = jnp.stack([c, c[::-1]], axis=1)  # (H, 2, W, D)
        o1 = _scan_slabs(dd, P1, P2, shift=1)  # paths from up-left / down-left
        agg = agg + o1[:, 0] + o1[::-1, 1]
        o2 = _scan_slabs(dd, P1, P2, shift=-1)  # paths from up-right / down-right
        agg = agg + o2[:, 0] + o2[::-1, 1]

    return agg


def wta_disparity(
    agg: jnp.ndarray,
    min_disp: int,
    uniqueness_ratio: int = 1,
    lr_max_diff: int = -1,
) -> jnp.ndarray:
    """Winner-take-all + parabola subpixel + uniqueness + optional LR check.

    Mirrors the StereoSGBM post-steps configured by the reference
    (uniquenessRatio/disp12MaxDiff, wass_stereo.cpp:779-781).  Returns float
    disparity (in the base=right convention); 0 marks invalid.
    """
    H, W, D = agg.shape

    # Row-band processing keeps the int32 upcast and the (band, W, D)
    # uniqueness broadcast small; the full-resolution volume is only ever
    # resident as int16.
    band = max(1, min(H, (1 << 22) // max(W * D, 1)))  # ~4M elements/band
    n_bands = -(-H // band)
    pad_h = n_bands * band - H
    a16 = jnp.pad(agg, ((0, pad_h), (0, 0), (0, 0)), constant_values=_BIG)
    bands = a16.reshape(n_bands, band, W, D)

    def one_band(ab):
        a = ab.astype(jnp.int32)
        best = jnp.argmin(a, axis=-1)  # (band, W)
        dmin = jnp.min(a, axis=-1)
        # Uniqueness: any cost within ratio at |d - best| > 1 invalidates.
        didx = jnp.arange(D)[None, None, :]
        far = jnp.abs(didx - best[..., None]) > 1
        thresh = dmin * (100 + uniqueness_ratio) // 100
        bad_unique = jnp.any((a <= thresh[..., None]) & far, axis=-1)

        # Parabola subpixel around the winner.
        bm1 = jnp.clip(best - 1, 0, D - 1)
        bp1 = jnp.clip(best + 1, 0, D - 1)
        take = lambda idx: jnp.take_along_axis(a, idx[..., None], axis=-1)[..., 0]
        sm1 = take(bm1)
        sp1 = take(bp1)
        denom = jnp.maximum(sm1 + sp1 - 2 * dmin, 1)
        delta = jnp.clip((sm1 - sp1) / (2.0 * denom), -0.5, 0.5)
        interior = (best > 0) & (best < D - 1)
        disp = best + min_disp + jnp.where(interior, delta, 0.0)
        return disp.astype(jnp.float32), ~bad_unique, best.astype(jnp.int32)

    disp_b, valid_b, best_b = jax.lax.map(one_band, bands)
    disp = disp_b.reshape(-1, W)[:H]
    valid = valid_b.reshape(-1, W)[:H]
    best = best_b.reshape(-1, W)[:H]

    if lr_max_diff >= 0:
        # Left-base disparity from the same aggregated volume:
        # dispL(y, xl) = argmin_d agg(y, xl + d, d), as a running-min fold
        # over d to avoid materializing a second volume.
        def fold(carry, j):
            bc, bv = carry
            cols = (jnp.arange(W) + j + min_disp) % W  # traced-shift roll
            v = jnp.take(agg[:, :, j], cols, axis=1)
            better = v < bv
            return (jnp.where(better, j, bc), jnp.minimum(v, bv)), None

        init = (jnp.zeros((H, W), jnp.int32), jnp.full((H, W), _BIG, agg.dtype))
        (bestL, _), _ = jax.lax.scan(fold, init, jnp.arange(D))
        bestL = bestL + min_disp
        xr_pix = jnp.arange(W)[None, :]
        xl_pix = jnp.clip(xr_pix - (best + min_disp), 0, W - 1)
        dL = jnp.take_along_axis(bestL, xl_pix, axis=1)
        valid = valid & (jnp.abs((best + min_disp) - dL) <= lr_max_diff)

    return jnp.where(valid, disp, 0.0).astype(jnp.float32)


def sgm_disparity(
    base_img: jnp.ndarray,
    match_img: jnp.ndarray,
    num_disp: int,
    min_disp: int = 1,
    P1: int = 8,
    P2: int = 96,
    directions: int = 8,
    census_win: Tuple[int, int] = (7, 9),
    uniqueness_ratio: int = 1,
    lr_max_diff: int = -1,
) -> jnp.ndarray:
    """End-to-end dense disparity: census -> cost volume -> SGM -> WTA.

    base_img is the *right* rectified image (the reference's base,
    wass_stereo.cpp:837 passes (right, left)); match_img is the left.
    """
    from wass_tpu.stereo.cost import census_transform, census_cost_volume

    cb = census_transform(base_img, census_win)
    cm = census_transform(match_img, census_win)
    cost = census_cost_volume(cb, cm, num_disp, min_disp)
    agg = sgm_aggregate(cost, P1, P2, directions)
    return wta_disparity(agg, min_disp, uniqueness_ratio, lr_max_diff)
