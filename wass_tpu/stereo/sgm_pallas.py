"""Pallas TPU kernels for SGM cost aggregation.

The lax.scan implementation (wass_tpu/stereo/sgm.py) is correct but pays
XLA while-loop overhead per scan step (~6600 steps/frame at 3 MP), which
dominates the frame time.  These kernels exploit the TPU Pallas execution
model: the grid is executed *sequentially* on a core, and scratch VMEM
persists across grid steps — so each SGM direction pair becomes one
pallas_call whose grid walks the scan axis, the (slab, D) recurrence
state lives in VMEM scratch, and block loads/stores are hardware-
pipelined (double-buffered) by the Pallas runtime.  Step overhead drops
from ~200us (XLA while iteration) to ~1-2us.

Layout contract: cost volumes are uint8 with D innermost (lane axis).
Each direction pair (forward + backward) runs in one kernel via two
input BlockSpecs indexing the same volume from both ends, emitting two
uint8 output volumes (valid since the min-normalized per-direction cost
is bounded by C_max + P2 < 256).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 32000.0  # plain float: jnp scalars would be captured constants in the kernel

# Horizontal pair in image layout + in-register h-fold (kills both XLA
# transposes and the int16 h-sum HBM round-trip) — MEASURED SLOWER on
# TPU v5e (windowed aggregate 42.5 ms vs 29.7 ms, bench/
# _agg_fused_variants.py 2026-08-21): the pair kernel's scan axis is
# second-minor in image layout, so every per-column read/write is a
# sublane-sliced access whose Mosaic relayouts cost more than the
# ~1.2 GB/frame of HBM traffic the scheme saves.  Kept (bit-exact, of
# architectural record) behind the flag; default OFF.
_USE_H2 = False


def _to_f32(x):
    """uint8 cost block -> float32 (Mosaic has no direct u8->f32 cast)."""
    return x.astype(jnp.int32).astype(jnp.float32)


def _step(prev, cost_f32, P1, P2):
    """One SGM update on an (S, D) float32 slab.

    All quantities are small integers (bounded by C_max + 2*P2 << 2^24) so
    float math is bit-exact; float32 is used because Mosaic's *int32*
    lane-axis min reduction lowers ~6x slower than the float one
    (measured 57 -> 9.6 ms per tri-direction walk at 3 MP/128 lanes,
    bench/_agg_variants.py)."""
    minprev = jnp.min(prev, axis=-1, keepdims=True)
    up = jnp.concatenate([jnp.full_like(prev[:, :1], _BIG), prev[:, :-1]], axis=1)
    dn = jnp.concatenate([prev[:, 1:], jnp.full_like(prev[:, :1], _BIG)], axis=1)
    best = jnp.minimum(
        jnp.minimum(prev, minprev + P2),
        jnp.minimum(up, dn) + P1,
    )
    return cost_f32 + best - minprev


def _pair_kernel(cf_ref, cb_ref, of_ref, ob_ref, fwd, bwd, *, P1, P2, shift, G):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        fwd[...] = jnp.full_like(fwd, _BIG)
        bwd[...] = jnp.full_like(bwd, _BIG)

    f = fwd[...]
    b = bwd[...]
    # G scan steps per grid iteration: amortizes the per-step grid/IO
    # overhead (the dominant cost — each step's compute is ~1 us).
    for g in range(G):
        if shift != 0:
            B = f.shape[0]
            # pltpu.roll requires non-negative shifts; roll(-s) == roll(B-s).
            f = pltpu.roll(f, shift % B, axis=0)
            b = pltpu.roll(b, (-shift) % B, axis=0)
            # Boundary reset via select on a row iota (Mosaic has no scatter).
            rows = jax.lax.broadcasted_iota(jnp.int32, f.shape, 0)
            if shift > 0:
                f = jnp.where(rows < shift, _BIG, f)
                b = jnp.where(rows >= B - shift, _BIG, b)
            else:
                f = jnp.where(rows >= B + shift, _BIG, f)
                b = jnp.where(rows < -shift, _BIG, b)

        f = _step(f, _to_f32(cf_ref[g]), P1, P2)
        # The backward block is loaded in *forward* storage order; its g-th
        # scan step consumes the (G-1-g)-th row of the block.
        b = _step(b, _to_f32(cb_ref[G - 1 - g]), P1, P2)
        of_ref[g] = f.astype(jnp.int32).astype(jnp.uint8)
        ob_ref[G - 1 - g] = b.astype(jnp.int32).astype(jnp.uint8)
    fwd[...] = f
    bwd[...] = b


def _pick_G(S: int, B: int, D: int, n_block_bytes: int, budget: int = 72 * 1024 * 1024) -> int:
    """Scan steps per grid iteration: the sequential grid pays a fixed
    per-step sequencing/DMA cost, so amortize it over the largest G whose
    double-buffered blocks (+ scratch and _step int32 temps) fit VMEM."""
    fixed = 10 * B * D * 4  # carries + _step temporaries (int32)
    # G caps at 8: the kernel body unrolls G scan steps, and the remote
    # Mosaic compile time grows superlinearly with the unroll (G=16
    # exceeded a 10-minute compile budget at 3 MP).
    for G in (8, 4, 2, 1):
        if S % G == 0 and 2 * G * B * D * n_block_bytes + fixed <= budget:
            return G
    return 1


def _run_pair(cost: jnp.ndarray, P1: int, P2: int, shift: int = 0, interpret: bool = False):
    """cost: (S, B, D) uint8 -> (ys_fwd, ys_bwd) uint8, forward walking
    0..S-1 and backward walking S-1..0 (outputs stored at their true
    positions, so ys_bwd needs no flip)."""
    S, B, D = cost.shape
    # 2 input + 2 output uint8 blocks per step.
    G = _pick_G(S, B, D, 4)
    kernel = functools.partial(_pair_kernel, P1=P1, P2=P2, shift=shift, G=G)
    out_shape = [
        jax.ShapeDtypeStruct((S, B, D), jnp.uint8),
        jax.ShapeDtypeStruct((S, B, D), jnp.uint8),
    ]
    n_blocks = S // G
    grid = (n_blocks,)
    blk = (G, B, D)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(blk, lambda i: (i, 0, 0)),
            pl.BlockSpec(blk, lambda i: (n_blocks - 1 - i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec(blk, lambda i: (i, 0, 0)),
            pl.BlockSpec(blk, lambda i: (n_blocks - 1 - i, 0, 0)),
        ],
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((B, D), jnp.float32),
            pltpu.VMEM((B, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(cost, cost)


def _step_roll(prev, cost_f32, P1, P2):
    """_step with the +-1 disparity neighbors formed by lane rotates
    instead of concatenates.  Bit-identical math; used where the operands
    carry non-canonical vector layouts (sublane-sliced reads in the
    image-layout pair kernel) that Mosaic's concatenate rejects — roll
    materializes a fresh canonically-laid-out vector."""
    D = prev.shape[-1]
    minprev = jnp.min(prev, axis=-1, keepdims=True)
    lanes = jax.lax.broadcasted_iota(jnp.int32, prev.shape, prev.ndim - 1)
    up = jnp.where(lanes == 0, _BIG, pltpu.roll(prev, 1, axis=prev.ndim - 1))
    dn = jnp.where(
        lanes == D - 1, _BIG, pltpu.roll(prev, (-1) % D, axis=prev.ndim - 1)
    )
    best = jnp.minimum(
        jnp.minimum(prev, minprev + P2),
        jnp.minimum(up, dn) + P1,
    )
    return cost_f32 + best - minprev


def _pair_kernel_img(cf_ref, cb_ref, of_ref, ob_ref, fwd, bwd, *, P1, P2, G):
    """Horizontal SGM pair in IMAGE layout: blocks are (H, G, D) column
    slabs of the (H, W, D) volume, the grid walks the column axis, and
    the carries are (H, D) slabs.  Reading the volume directly — and
    emitting the per-direction costs back in image layout — removes both
    XLA transposes and the int16 h-sum round-trip of the transposed
    formulation (the downstream row-walk kernels fold the two uint8
    volumes in-register).  The column axis is second-minor, so the g
    slices are sublane-strided VMEM accesses; that relayout rides VMEM
    bandwidth, while the HBM DMAs stay full-block."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        fwd[...] = jnp.full_like(fwd, _BIG)
        bwd[...] = jnp.full_like(bwd, _BIG)

    f = fwd[...]
    b = bwd[...]
    fs, bs = [], [None] * G
    for g in range(G):
        f = _step_roll(f, _to_f32(cf_ref[:, g, :]), P1, P2)
        b = _step_roll(b, _to_f32(cb_ref[:, G - 1 - g, :]), P1, P2)
        fs.append(f)
        bs[G - 1 - g] = b
    # Whole-block stores: assembling the (H, G, D) blocks with one stack
    # keeps every value in the natural (0, 0) vector layout — per-column
    # stores at sublane offsets back-propagate offset layouts into the
    # recurrence and Mosaic rejects the resulting concatenates.
    of_ref[...] = jnp.stack(fs, axis=1).astype(jnp.int32).astype(jnp.uint8)
    ob_ref[...] = jnp.stack(bs, axis=1).astype(jnp.int32).astype(jnp.uint8)
    fwd[...] = f
    bwd[...] = b


def _run_pair_img(cost: jnp.ndarray, P1: int, P2: int, interpret: bool = False):
    """cost: (H, W, D) uint8 -> (hf, hb) uint8 in the SAME layout: the
    left-to-right and right-to-left horizontal direction costs."""
    H, W, D = cost.shape
    # 2 input + 2 output uint8 blocks per step (blocks span full H).
    G = _pick_G(W, H, D, 4)
    kernel = functools.partial(_pair_kernel_img, P1=P1, P2=P2, G=G)
    n_blocks = W // G
    blk = (H, G, D)
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(blk, lambda i: (0, i, 0)),
            pl.BlockSpec(blk, lambda i: (0, n_blocks - 1 - i, 0)),
        ],
        out_specs=[
            pl.BlockSpec(blk, lambda i: (0, i, 0)),
            pl.BlockSpec(blk, lambda i: (0, n_blocks - 1 - i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((H, W, D), jnp.uint8),
            jax.ShapeDtypeStruct((H, W, D), jnp.uint8),
        ],
        scratch_shapes=[
            pltpu.VMEM((H, D), jnp.float32),
            pltpu.VMEM((H, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(cost, cost)


def _roll_mask(x, shift, B):
    """Slab-axis roll + boundary reset for a diagonal state (the logic of
    the original per-pair shift, factored for reuse)."""
    if shift == 0:
        return x
    x = pltpu.roll(x, shift % B, axis=0)
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    if shift > 0:
        return jnp.where(rows < shift, _BIG, x)
    return jnp.where(rows >= B + shift, _BIG, x)


def _tri_dir_kernel(c_ref, out_ref, s_v, s_d1, s_d2, *, P1, P2, G, reverse):
    """Vertical + both diagonals of ONE walk direction in one scan: three
    float32 carries in VMEM, one cost block read per grid step, the three
    directions emitted pre-summed (int16).  Merging triples the per-step
    arithmetic, amortizing the sequential grid-step overhead that
    dominates the separate-pair version.  Carries are float32 (exact for
    these small integers) because the int32 lane-min reduce lowers ~6x
    slower (see _step); 255 is the no-predecessor init, for which _step
    degenerates to ret = cost exactly like the _BIG init (per-direction
    costs are min-normalized < 256 by construction)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        s_v[...] = jnp.full_like(s_v, 255)
        s_d1[...] = jnp.full_like(s_d1, 255)
        s_d2[...] = jnp.full_like(s_d2, 255)

    B = s_v.shape[0]
    sh = -1 if reverse else 1

    for g0 in range(G):
        g = G - 1 - g0 if reverse else g0
        cf = _to_f32(c_ref[g])
        v = _step(s_v[...], cf, P1, P2)
        s_v[...] = v
        acc = v
        d1 = _step(_roll_mask(s_d1[...], sh, B), cf, P1, P2)
        s_d1[...] = d1
        acc = acc + d1
        d2 = _step(_roll_mask(s_d2[...], -sh, B), cf, P1, P2)
        s_d2[...] = d2
        out_ref[g] = (acc + d2).astype(jnp.int16)


def _run_tri_dir(cost: jnp.ndarray, P1: int, P2: int, reverse: bool, interpret: bool = False):
    """cost: (S, B, D) uint8 -> int16 sum of the vertical + two diagonal
    directions walking forward (reverse=False) or backward."""
    S, B, D = cost.shape
    # 1 uint8 input + 1 int16 output block per step.
    G = _pick_G(S, B, D, 3)
    n_blocks = S // G
    kernel = functools.partial(_tri_dir_kernel, P1=P1, P2=P2, G=G, reverse=reverse)
    blk = (G, B, D)
    if reverse:
        idx = lambda i: (n_blocks - 1 - i, 0, 0)
    else:
        idx = lambda i: (i, 0, 0)
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(blk, idx)],
        out_specs=pl.BlockSpec(blk, idx),
        out_shape=jax.ShapeDtypeStruct((S, B, D), jnp.int16),
        scratch_shapes=[pltpu.VMEM((B, D), jnp.float32) for _ in range(3)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(cost)


def sgm_aggregate_pallas(cost: jnp.ndarray, P1: int, P2: int, directions: int = 8, interpret: bool = False) -> jnp.ndarray:
    """Drop-in replacement for sgm.sgm_aggregate using Pallas kernels.

    cost: (H, W, D) uint8; returns (H, W, D) int16 aggregated sums.
    """
    assert directions in (2, 4, 5, 8)
    assert 64 + P2 < 256, "P2 too large for uint8 direction emissions"
    c = cost if cost.dtype == jnp.uint8 else cost.astype(jnp.uint8)
    H, W, D = c.shape

    if _USE_H2:
        hf, hb = _run_pair_img(c, P1, P2, interpret=interpret)
        agg = hf.astype(jnp.int16) + hb.astype(jnp.int16)
    else:
        cT = jnp.transpose(c, (1, 0, 2))  # (W, H, D) for the horizontal pair
        hf, hb = _run_pair(cT, P1, P2, interpret=interpret)
        agg = (
            jnp.transpose(hf, (1, 0, 2)).astype(jnp.int16)
            + jnp.transpose(hb, (1, 0, 2)).astype(jnp.int16)
        )

    if directions == 5:
        # cv::StereoSGBM default path set (E, W, N, NW, NE): the
        # horizontal pair + the forward (top-down) tri-direction walk.
        return agg + _run_tri_dir(c, P1, P2, reverse=False, interpret=interpret)

    if directions == 8:
        tf = _run_tri_dir(c, P1, P2, reverse=False, interpret=interpret)
        tb = _run_tri_dir(c, P1, P2, reverse=True, interpret=interpret)
        return agg + tf + tb

    if directions >= 4:
        vf, vb = _run_pair(c, P1, P2, interpret=interpret)
        agg = agg + vf.astype(jnp.int16) + vb.astype(jnp.int16)

    return agg


# --------------------------------------------------------------------------
# Fused final-walk WTA
#
# The unfused 8-direction pipeline writes three int16 (H, W, D) volumes to
# HBM (horizontal sum, forward tri-walk, backward tri-walk), sums them in an
# XLA pass and re-streams the result several times through the masked-
# reduction WTA — ~12 GB of HBM traffic at 3 MP/D=256 that exists only to
# carry per-direction sums between kernels.  The fused path instead:
#   * forward tri-walk reads the horizontal int16 sum alongside the cost
#     block and emits partial = hsum + N + NW + NE (same write volume);
#   * the final walk (backward for 8 directions, the forward walk itself
#     for the reference's 5-path set) adds its three directions to the
#     partial IN REGISTERS and performs the whole WTA — first-argmin,
#     parabola subpixel, uniqueness gate (sgm.wta_disparity semantics,
#     bit-exact: all quantities are small integers in float32) — emitting
#     one (H, W) float32 disparity map instead of an int16 volume.
# --------------------------------------------------------------------------


def _wta_row(total, *, D, min_disp, uniq):
    """WTA on one (B, D) float32 row slab -> (B,) float32 disparity.

    Bit-exact port of sgm.wta_disparity's masked-reduction formulation
    (first-index argmin, +-1 neighbor costs, far-minimum uniqueness with
    the integer floor threshold, clipped parabola subpixel); 0 = invalid."""
    didx = jax.lax.broadcasted_iota(jnp.int32, total.shape, 1).astype(jnp.float32)
    dmin = jnp.min(total, axis=-1, keepdims=True)
    at_min = total == dmin
    best = jnp.min(jnp.where(at_min, didx, float(D)), axis=-1, keepdims=True)

    big = jnp.float32(_BIG)
    sm1 = jnp.min(jnp.where(didx == best - 1, total, big), axis=-1)
    sp1 = jnp.min(jnp.where(didx == best + 1, total, big), axis=-1)
    far_min = jnp.min(jnp.where(jnp.abs(didx - best) > 1, total, big), axis=-1)

    dminv = dmin[:, 0]
    bestv = best[:, 0]
    # Integer floor of dmin*(100+u)/100: the +0.5 absorbs the f32 division
    # rounding (numerator is an exact integer < 2^24).
    thresh = jnp.floor((dminv * (100.0 + uniq) + 0.5) / 100.0)
    valid = far_min > thresh

    interior = (bestv > 0) & (bestv < D - 1)
    sm1s = jnp.where(interior, sm1, dminv)
    sp1s = jnp.where(interior, sp1, dminv)
    denom = jnp.maximum(sm1s + sp1s - 2.0 * dminv, 1.0)
    delta = jnp.clip((sm1s - sp1s) / (2.0 * denom), -0.5, 0.5)
    disp = bestv + min_disp + jnp.where(interior, delta, 0.0)
    return jnp.where(valid, disp, 0.0)


def _tri_dir_partial_kernel(c_ref, h_ref, out_ref, s_v, s_d1, s_d2, *, P1, P2, G, reverse):
    """_tri_dir_kernel that also folds a pre-summed int16 volume (the
    horizontal pair sum) into its emission: out = h + v + d1 + d2."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        s_v[...] = jnp.full_like(s_v, 255)
        s_d1[...] = jnp.full_like(s_d1, 255)
        s_d2[...] = jnp.full_like(s_d2, 255)

    B = s_v.shape[0]
    sh = -1 if reverse else 1
    for g0 in range(G):
        g = G - 1 - g0 if reverse else g0
        cf = _to_f32(c_ref[g])
        v = _step(s_v[...], cf, P1, P2)
        s_v[...] = v
        d1 = _step(_roll_mask(s_d1[...], sh, B), cf, P1, P2)
        s_d1[...] = d1
        d2 = _step(_roll_mask(s_d2[...], -sh, B), cf, P1, P2)
        s_d2[...] = d2
        out_ref[g] = h_ref[g] + (v + d1 + d2).astype(jnp.int16)


def _tri_dir_wta_kernel(
    c_ref, p_ref, out_ref, s_v, s_d1, s_d2, *, P1, P2, G, reverse, min_disp, uniq
):
    """Final SGM walk + in-register WTA: adds this walk's three directions
    to the partial sum p_ref (int16) and emits the finished float32
    disparity row — no int16 volume leaves the kernel."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        s_v[...] = jnp.full_like(s_v, 255)
        s_d1[...] = jnp.full_like(s_d1, 255)
        s_d2[...] = jnp.full_like(s_d2, 255)

    B, D = s_v.shape
    sh = -1 if reverse else 1
    for g0 in range(G):
        g = G - 1 - g0 if reverse else g0
        cf = _to_f32(c_ref[g])
        v = _step(s_v[...], cf, P1, P2)
        s_v[...] = v
        d1 = _step(_roll_mask(s_d1[...], sh, B), cf, P1, P2)
        s_d1[...] = d1
        d2 = _step(_roll_mask(s_d2[...], -sh, B), cf, P1, P2)
        s_d2[...] = d2
        total = p_ref[g].astype(jnp.float32) + (v + d1 + d2)
        out_ref[g] = _wta_row(total, D=D, min_disp=min_disp, uniq=uniq)


def _h2_sum(hf_row, hb_row):
    """Fold the two uint8 horizontal direction rows -> int32 sum."""
    return hf_row.astype(jnp.int32) + hb_row.astype(jnp.int32)


def _tri_dir_partial_kernel_h2(
    c_ref, hf_ref, hb_ref, out_ref, s_v, s_d1, s_d2, *, P1, P2, G, reverse
):
    """_tri_dir_partial_kernel reading the horizontal pair as two uint8
    volumes (image layout, from _run_pair_img) and summing them
    in-register: out = hf + hb + v + d1 + d2.  Replaces the XLA
    transpose+add h-sum pass (3 full int16-volume HBM round-trips)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        s_v[...] = jnp.full_like(s_v, 255)
        s_d1[...] = jnp.full_like(s_d1, 255)
        s_d2[...] = jnp.full_like(s_d2, 255)

    B = s_v.shape[0]
    sh = -1 if reverse else 1
    for g0 in range(G):
        g = G - 1 - g0 if reverse else g0
        cf = _to_f32(c_ref[g])
        v = _step(s_v[...], cf, P1, P2)
        s_v[...] = v
        d1 = _step(_roll_mask(s_d1[...], sh, B), cf, P1, P2)
        s_d1[...] = d1
        d2 = _step(_roll_mask(s_d2[...], -sh, B), cf, P1, P2)
        s_d2[...] = d2
        h = _h2_sum(hf_ref[g], hb_ref[g])
        out_ref[g] = (h + (v + d1 + d2).astype(jnp.int32)).astype(jnp.int16)


def _tri_dir_wta_kernel_h2(
    c_ref, hf_ref, hb_ref, out_ref, s_v, s_d1, s_d2,
    *, P1, P2, G, reverse, min_disp, uniq
):
    """Final walk + WTA with the horizontal pair read as two uint8
    volumes and folded in-register (the 5-direction single-walk path)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        s_v[...] = jnp.full_like(s_v, 255)
        s_d1[...] = jnp.full_like(s_d1, 255)
        s_d2[...] = jnp.full_like(s_d2, 255)

    B, D = s_v.shape
    sh = -1 if reverse else 1
    for g0 in range(G):
        g = G - 1 - g0 if reverse else g0
        cf = _to_f32(c_ref[g])
        v = _step(s_v[...], cf, P1, P2)
        s_v[...] = v
        d1 = _step(_roll_mask(s_d1[...], sh, B), cf, P1, P2)
        s_d1[...] = d1
        d2 = _step(_roll_mask(s_d2[...], -sh, B), cf, P1, P2)
        s_d2[...] = d2
        total = _h2_sum(hf_ref[g], hb_ref[g]).astype(jnp.float32) + (v + d1 + d2)
        out_ref[g] = _wta_row(total, D=D, min_disp=min_disp, uniq=uniq)


def _run_tri_dir_partial_h2(cost, hf, hb, P1, P2, reverse, interpret=False):
    """cost/hf/hb (S, B, D) uint8 -> int16 hf + hb + one walk's three
    directions."""
    S, B, D = cost.shape
    G = _pick_G(S, B, D, 5)  # 3x u8 in + i16 out
    n_blocks = S // G
    kernel = functools.partial(
        _tri_dir_partial_kernel_h2, P1=P1, P2=P2, G=G, reverse=reverse
    )
    blk = (G, B, D)
    if reverse:
        idx = lambda i: (n_blocks - 1 - i, 0, 0)
    else:
        idx = lambda i: (i, 0, 0)
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(blk, idx)] * 3,
        out_specs=pl.BlockSpec(blk, idx),
        out_shape=jax.ShapeDtypeStruct((S, B, D), jnp.int16),
        scratch_shapes=[pltpu.VMEM((B, D), jnp.float32) for _ in range(3)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(cost, hf, hb)


def _run_tri_dir_wta_h2(
    cost, hf, hb, P1, P2, reverse, min_disp, uniq, interpret=False
):
    """cost/hf/hb (S, B, D) uint8 -> (S, B) float32 finished disparity."""
    S, B, D = cost.shape
    G = _pick_G(S, B, D, 3)
    n_blocks = S // G
    kernel = functools.partial(
        _tri_dir_wta_kernel_h2, P1=P1, P2=P2, G=G, reverse=reverse,
        min_disp=min_disp, uniq=uniq,
    )
    blk = (G, B, D)
    if reverse:
        idx = lambda i: (n_blocks - 1 - i, 0, 0)
        idx2 = lambda i: (n_blocks - 1 - i, 0)
    else:
        idx = lambda i: (i, 0, 0)
        idx2 = lambda i: (i, 0)
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(blk, idx)] * 3,
        out_specs=pl.BlockSpec((G, B), idx2),
        out_shape=jax.ShapeDtypeStruct((S, B), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, D), jnp.float32) for _ in range(3)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(cost, hf, hb)


def _run_tri_dir_partial(cost, hsum, P1, P2, reverse, interpret=False):
    """cost (S, B, D) uint8 + hsum (S, B, D) int16 -> int16 hsum + the
    three directions of one walk."""
    S, B, D = cost.shape
    G = _pick_G(S, B, D, 5)  # u8 in + i16 in + i16 out
    n_blocks = S // G
    kernel = functools.partial(
        _tri_dir_partial_kernel, P1=P1, P2=P2, G=G, reverse=reverse
    )
    blk = (G, B, D)
    if reverse:
        idx = lambda i: (n_blocks - 1 - i, 0, 0)
    else:
        idx = lambda i: (i, 0, 0)
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(blk, idx), pl.BlockSpec(blk, idx)],
        out_specs=pl.BlockSpec(blk, idx),
        out_shape=jax.ShapeDtypeStruct((S, B, D), jnp.int16),
        scratch_shapes=[pltpu.VMEM((B, D), jnp.float32) for _ in range(3)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(cost, hsum)


def _run_tri_dir_wta(
    cost, partial, P1, P2, reverse, min_disp, uniq, interpret=False
):
    """cost (S, B, D) uint8 + partial (S, B, D) int16 -> (S, B) float32
    disparity (the finished WTA of partial + this walk's directions)."""
    S, B, D = cost.shape
    G = _pick_G(S, B, D, 3)  # u8 in + i16 in (output rows are negligible)
    n_blocks = S // G
    kernel = functools.partial(
        _tri_dir_wta_kernel, P1=P1, P2=P2, G=G, reverse=reverse,
        min_disp=min_disp, uniq=uniq,
    )
    blk = (G, B, D)
    if reverse:
        idx = lambda i: (n_blocks - 1 - i, 0, 0)
        idx2 = lambda i: (n_blocks - 1 - i, 0)
    else:
        idx = lambda i: (i, 0, 0)
        idx2 = lambda i: (i, 0)
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(blk, idx), pl.BlockSpec(blk, idx)],
        out_specs=pl.BlockSpec((G, B), idx2),
        out_shape=jax.ShapeDtypeStruct((S, B), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, D), jnp.float32) for _ in range(3)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(cost, partial)


def sgm_wta_fused_pallas(
    cost: jnp.ndarray,
    P1: int,
    P2: int,
    directions: int,
    min_disp: int,
    uniqueness_ratio: int = 1,
    interpret: bool = False,
) -> jnp.ndarray:
    """Aggregation + WTA with the final walk fused: (H, W, D) uint8 cost ->
    (H, W) float32 disparity, bit-identical to
    wta_disparity(sgm_aggregate_pallas(cost, ...), min_disp, uniqueness_ratio)
    for directions in (5, 8) with lr_max_diff < 0."""
    assert directions in (5, 8)
    assert 64 + P2 < 256, "P2 too large for uint8 direction emissions"
    c = cost if cost.dtype == jnp.uint8 else cost.astype(jnp.uint8)

    if _USE_H2:
        hf, hb = _run_pair_img(c, P1, P2, interpret=interpret)
        if directions == 5:
            return _run_tri_dir_wta_h2(
                c, hf, hb, P1, P2, reverse=False, min_disp=min_disp,
                uniq=uniqueness_ratio, interpret=interpret,
            )
        partial = _run_tri_dir_partial_h2(
            c, hf, hb, P1, P2, reverse=False, interpret=interpret
        )
        return _run_tri_dir_wta(
            c, partial, P1, P2, reverse=True, min_disp=min_disp,
            uniq=uniqueness_ratio, interpret=interpret,
        )

    cT = jnp.transpose(c, (1, 0, 2))
    hf, hb = _run_pair(cT, P1, P2, interpret=interpret)
    hsum = (
        jnp.transpose(hf, (1, 0, 2)).astype(jnp.int16)
        + jnp.transpose(hb, (1, 0, 2)).astype(jnp.int16)
    )
    if directions == 5:
        return _run_tri_dir_wta(
            c, hsum, P1, P2, reverse=False, min_disp=min_disp,
            uniq=uniqueness_ratio, interpret=interpret,
        )
    partial = _run_tri_dir_partial(c, hsum, P1, P2, reverse=False, interpret=interpret)
    return _run_tri_dir_wta(
        c, partial, P1, P2, reverse=True, min_disp=min_disp,
        uniq=uniqueness_ratio, interpret=interpret,
    )


def _cost_kernel(refs_and_out, *, num_disp, min_disp, nw):
    """Census cost for one row tile.  Inputs are *plane-separated* census
    words — (rows, W) uint32 per word — so every xor/popcount runs at full
    lane width (the packed (rows, W, nw) layout used only nw of 128
    lanes).  Four disparities are packed per int32 output word (costs fit
    8 bits), because Mosaic supports neither 8-bit minor-dim stores nor
    cheap lane-column writes; the (D/4, rows, W) output block makes every
    store a clean 2-D tile."""
    cb = refs_and_out[:nw]
    cm = refs_and_out[nw : 2 * nw]
    out_ref = refs_and_out[2 * nw]
    b = [r[...] for r in cb]
    m = [r[...] for r in cm]
    rows, W = b[0].shape
    P = num_disp + min_disp

    for jw in range(num_disp // 4):
        word = None
        for k in range(4):
            d = min_disp + jw * 4 + k
            c = jax.lax.population_count(b[0] ^ m[0][:, P - d : P - d + W])
            for w in range(1, nw):
                c = c + jax.lax.population_count(b[w] ^ m[w][:, P - d : P - d + W])
            word = c if word is None else word | (c << (8 * k))
        out_ref[jw, :, :] = word


def census_cost_volume_pallas(
    census_base: jnp.ndarray,
    census_match: jnp.ndarray,
    num_disp: int,
    min_disp: int = 0,
    rows_per_tile: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pallas census cost volume: one grid step per row tile with the whole
    row pair in VMEM.  The census planes are read once per tile (the XLA
    build re-streams them once per disparity — ~30 GB at 3 MP/256 d)."""
    H, W, nw = census_base.shape
    assert H % rows_per_tile == 0, "pad image height to the tile size"
    assert num_disp % 4 == 0
    max_cost = min(32 * nw, 255)
    P = num_disp + min_disp
    planes_b = [census_base[:, :, w] for w in range(nw)]
    planes_m = [jnp.pad(census_match[:, :, w], ((0, 0), (P, 0))) for w in range(nw)]
    kernel = functools.partial(
        _cost_kernel_entry, num_disp=num_disp, min_disp=min_disp, nw=nw
    )
    grid = (H // rows_per_tile,)
    DW = num_disp // 4
    packed = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((rows_per_tile, W), lambda i: (i, 0)) for _ in range(nw)]
        + [pl.BlockSpec((rows_per_tile, W + P), lambda i: (i, 0)) for _ in range(nw)],
        out_specs=pl.BlockSpec((DW, rows_per_tile, W), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((DW, H, W), jnp.int32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*planes_b, *planes_m)
    u8 = jax.lax.bitcast_convert_type(packed, jnp.uint8)  # (DW, H, W, 4)
    vol = jnp.transpose(u8, (1, 2, 0, 3)).reshape(H, W, num_disp)
    # Patch the invalid left-border triangle (match x-coordinate < 0).
    xx = jnp.arange(W, dtype=jnp.int32)[None, :, None]
    dd = (jnp.arange(num_disp, dtype=jnp.int32) + min_disp)[None, None, :]
    return jnp.where(xx - dd >= 0, vol, jnp.uint8(max_cost))


def _cost_kernel_entry(*refs, num_disp, min_disp, nw):
    return _cost_kernel(refs, num_disp=num_disp, min_disp=min_disp, nw=nw)


# --------------------------------------------------------------------------
# Coarse-to-fine windowed kernels
#
# The reference searches a fixed global disparity range (MAX_DISPARITY=640
# default, /root/reference/src/wass_stereo/wass_stereo.cpp:742-744).  For an
# obliquely-viewed sea surface the disparity is almost a function of the
# image row, so a coarse full-range pass at 1/4 resolution bounds the
# per-row disparity to a narrow window and the full-resolution pass only
# evaluates win_disp (= 128) disparities around it.  Cost volume, SGM
# aggregation and WTA all shrink by D/win_disp; frame time becomes nearly
# independent of the search range.
#
# Window contract: the window start is constant within an 8-row tile
# (matching the cost kernel's row tiling).  Lane index j of the windowed
# volume means true disparity wstart[tile(y)] + j.  Scans along x need no
# change (each slab row keeps one offset); scans along y realign the carry
# with a dynamic lane roll when the window start changes between rows.
# --------------------------------------------------------------------------


def _cost_kernel_windowed(off_ref, *refs, win_disp, nw, P, WP):
    """Census cost for one row tile over a dynamic per-tile disparity
    window [off, off + win_disp).  Same packing as _cost_kernel; the match
    planes are dynamically pre-rotated once per tile so the inner disparity
    loop uses static lane slices."""
    i = pl.program_id(0)
    off = off_ref[i]
    cb = refs[:nw]
    cm = refs[nw : 2 * nw]
    out_ref = refs[2 * nw]
    b = [r[...] for r in cb]
    rows, W = b[0].shape
    # Rotate each padded plane so original column (P - off - Dw) lands at
    # lane 0 (Mosaic rejects dynamic-start unaligned vector loads, but a
    # dynamic full-row lane rotate is native — the plane width WP is padded
    # to the 128-lane granule); the j-th disparity is then the static
    # slice [Dw-j, Dw-j+W).  No wrap: off <= P - Dw by the window clip, so
    # the used region never crosses the rotation seam.
    start = P - off - win_disp
    m = [pltpu.roll(r[...], (-start) % WP, axis=1) for r in cm]

    for jw in range(win_disp // 4):
        word = None
        for k in range(4):
            j = jw * 4 + k
            s = win_disp - j
            c = jax.lax.population_count(b[0] ^ m[0][:, s : s + W])
            for w in range(1, nw):
                c = c + jax.lax.population_count(b[w] ^ m[w][:, s : s + W])
            word = c if word is None else word | (c << (8 * k))
        out_ref[jw, :, :] = word


def census_cost_volume_pallas_windowed(
    census_base: jnp.ndarray,
    census_match: jnp.ndarray,
    wstart_tiles: jnp.ndarray,
    win_disp: int,
    num_disp: int,
    min_disp: int = 0,
    rows_per_tile: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Windowed census cost volume: (H, W, win_disp) uint8 where lane j of
    row y is the cost at true disparity wstart_tiles[y // rows_per_tile] + j.
    wstart_tiles: (H // rows_per_tile,) int32 in [min_disp,
    min_disp + num_disp - win_disp]."""
    H, W, nw = census_base.shape
    assert H % rows_per_tile == 0, "pad image height to the tile size"
    assert win_disp % 4 == 0
    max_cost = min(32 * nw, 255)
    P = num_disp + min_disp
    # Lane-align the padded plane width (the kernel's dynamic rotate
    # requires a multiple of the 128-lane granule).
    pad_r = (-(W + P)) % 128
    WP = W + P + pad_r
    planes_b = [census_base[:, :, w] for w in range(nw)]
    planes_m = [
        jnp.pad(census_match[:, :, w], ((0, 0), (P, pad_r))) for w in range(nw)
    ]
    kernel = functools.partial(
        _cost_kernel_windowed, win_disp=win_disp, nw=nw, P=P, WP=WP
    )
    n_tiles = H // rows_per_tile
    DW = win_disp // 4
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((rows_per_tile, W), lambda i, off: (i, 0)) for _ in range(nw)
        ]
        + [
            pl.BlockSpec((rows_per_tile, WP), lambda i, off: (i, 0))
            for _ in range(nw)
        ],
        out_specs=pl.BlockSpec((DW, rows_per_tile, W), lambda i, off: (0, i, 0)),
    )
    packed = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((DW, H, W), jnp.int32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(wstart_tiles.astype(jnp.int32), *planes_b, *planes_m)
    u8 = jax.lax.bitcast_convert_type(packed, jnp.uint8)  # (DW, H, W, 4)
    vol = jnp.transpose(u8, (1, 2, 0, 3)).reshape(H, W, win_disp)
    # Patch the invalid left-border triangle (match x-coordinate < 0).
    off_rows = jnp.repeat(wstart_tiles.astype(jnp.int32), rows_per_tile)
    xx = jnp.arange(W, dtype=jnp.int32)[None, :, None]
    dd = jnp.arange(win_disp, dtype=jnp.int32)[None, None, :] + off_rows[:, None, None]
    return jnp.where(xx - dd >= 0, vol, jnp.uint8(max_cost))


def _tri_dir_kernel_windowed(
    off_ref, c_ref, out_ref, s_v, s_d1, s_d2, *, P1, P2, G, reverse
):
    """_tri_dir_kernel over a windowed volume.  One grid step processes one
    window tile (G = tile_rows rows), so the window start is constant
    inside a step and the carries need realigning (a dynamic lane roll,
    with entries leaving the window reset to the 255 no-predecessor init)
    exactly once per grid step — the G inner rows run at full speed."""
    i = pl.program_id(0)
    n = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        s_v[...] = jnp.full_like(s_v, 255)
        s_d1[...] = jnp.full_like(s_d1, 255)
        s_d2[...] = jnp.full_like(s_d2, 255)

    B, Dw = s_v.shape
    sh = -1 if reverse else 1

    tile = (n - 1 - i) if reverse else i
    prev_tile = jnp.clip(tile + (1 if reverse else -1), 0, n - 1)
    delta = jnp.where(i == 0, 0, off_ref[tile] - off_ref[prev_tile])

    @pl.when(delta != 0)
    def _():
        jj = jax.lax.broadcasted_iota(jnp.int32, (B, Dw), 1)
        keep = (jj + delta >= 0) & (jj + delta < Dw)
        for s in (s_v, s_d1, s_d2):
            r = pltpu.roll(s[...], (-delta) % Dw, axis=1)
            s[...] = jnp.where(keep, r, 255.0)

    for g0 in range(G):
        g = G - 1 - g0 if reverse else g0
        cf = _to_f32(c_ref[g])
        v = _step(s_v[...], cf, P1, P2)
        s_v[...] = v
        acc = v
        d1 = _step(_roll_mask(s_d1[...], sh, B), cf, P1, P2)
        s_d1[...] = d1
        acc = acc + d1
        d2 = _step(_roll_mask(s_d2[...], -sh, B), cf, P1, P2)
        s_d2[...] = d2
        out_ref[g] = (acc + d2).astype(jnp.int16)


def _run_tri_dir_windowed(
    cost: jnp.ndarray,
    wstart_tiles: jnp.ndarray,
    tile_rows: int,
    P1: int,
    P2: int,
    reverse: bool,
    interpret: bool = False,
):
    """cost: (H, W, Dw) windowed uint8 volume; wstart_tiles:
    (H // tile_rows,) int32 per-tile window starts.  Returns the int16 sum
    of the vertical + two diagonal directions of one walk."""
    S, B, D = cost.shape
    G = tile_rows
    assert S % G == 0
    n_blocks = S // G
    kernel = functools.partial(
        _tri_dir_kernel_windowed, P1=P1, P2=P2, G=G, reverse=reverse
    )
    blk = (G, B, D)
    if reverse:
        idx = lambda i, off: (n_blocks - 1 - i, 0, 0)
    else:
        idx = lambda i, off: (i, 0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(blk, idx)],
        out_specs=pl.BlockSpec(blk, idx),
        scratch_shapes=[pltpu.VMEM((B, D), jnp.float32) for _ in range(3)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, B, D), jnp.int16),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(wstart_tiles.astype(jnp.int32), cost)


def _windowed_realign(off_ref, scratches, *, i, n, reverse):
    """Carry realignment between window tiles (shared prologue of the
    windowed walk kernels): when the window start changes by delta between
    consecutive tiles, rotate the carries' lanes by -delta and reset the
    entries that left the window to the 255 no-predecessor init."""
    tile = (n - 1 - i) if reverse else i
    prev_tile = jnp.clip(tile + (1 if reverse else -1), 0, n - 1)
    delta = jnp.where(i == 0, 0, off_ref[tile] - off_ref[prev_tile])

    @pl.when(delta != 0)
    def _():
        B, Dw = scratches[0].shape
        jj = jax.lax.broadcasted_iota(jnp.int32, (B, Dw), 1)
        keep = (jj + delta >= 0) & (jj + delta < Dw)
        for s in scratches:
            r = pltpu.roll(s[...], (-delta) % Dw, axis=1)
            s[...] = jnp.where(keep, r, 255.0)


def _tri_dir_partial_kernel_windowed(
    off_ref, c_ref, h_ref, out_ref, s_v, s_d1, s_d2, *, P1, P2, G, reverse
):
    """Windowed _tri_dir_partial_kernel: out = h + v + d1 + d2 over a
    windowed volume with per-tile carry realignment."""
    i = pl.program_id(0)
    n = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        s_v[...] = jnp.full_like(s_v, 255)
        s_d1[...] = jnp.full_like(s_d1, 255)
        s_d2[...] = jnp.full_like(s_d2, 255)

    _windowed_realign(off_ref, (s_v, s_d1, s_d2), i=i, n=n, reverse=reverse)

    B = s_v.shape[0]
    sh = -1 if reverse else 1
    for g0 in range(G):
        g = G - 1 - g0 if reverse else g0
        cf = _to_f32(c_ref[g])
        v = _step(s_v[...], cf, P1, P2)
        s_v[...] = v
        d1 = _step(_roll_mask(s_d1[...], sh, B), cf, P1, P2)
        s_d1[...] = d1
        d2 = _step(_roll_mask(s_d2[...], -sh, B), cf, P1, P2)
        s_d2[...] = d2
        out_ref[g] = h_ref[g] + (v + d1 + d2).astype(jnp.int16)


def _tri_dir_wta_kernel_windowed(
    off_ref, c_ref, p_ref, out_ref, s_v, s_d1, s_d2, *, P1, P2, G, reverse, uniq
):
    """Windowed final walk + in-register WTA.  Emits the *window-local*
    disparity with the min_disp=1 sentinel of c2f.wta_disparity_windowed
    (0 = invalid; the caller shifts by the per-row window start)."""
    i = pl.program_id(0)
    n = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        s_v[...] = jnp.full_like(s_v, 255)
        s_d1[...] = jnp.full_like(s_d1, 255)
        s_d2[...] = jnp.full_like(s_d2, 255)

    _windowed_realign(off_ref, (s_v, s_d1, s_d2), i=i, n=n, reverse=reverse)

    B, D = s_v.shape
    sh = -1 if reverse else 1
    for g0 in range(G):
        g = G - 1 - g0 if reverse else g0
        cf = _to_f32(c_ref[g])
        v = _step(s_v[...], cf, P1, P2)
        s_v[...] = v
        d1 = _step(_roll_mask(s_d1[...], sh, B), cf, P1, P2)
        s_d1[...] = d1
        d2 = _step(_roll_mask(s_d2[...], -sh, B), cf, P1, P2)
        s_d2[...] = d2
        total = p_ref[g].astype(jnp.float32) + (v + d1 + d2)
        out_ref[g] = _wta_row(total, D=D, min_disp=1, uniq=uniq)


def _tri_dir_partial_kernel_windowed_h2(
    off_ref, c_ref, hf_ref, hb_ref, out_ref, s_v, s_d1, s_d2,
    *, P1, P2, G, reverse
):
    """Windowed _tri_dir_partial_kernel_h2: the horizontal pair arrives as
    two uint8 volumes (image layout) and is summed in-register."""
    i = pl.program_id(0)
    n = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        s_v[...] = jnp.full_like(s_v, 255)
        s_d1[...] = jnp.full_like(s_d1, 255)
        s_d2[...] = jnp.full_like(s_d2, 255)

    _windowed_realign(off_ref, (s_v, s_d1, s_d2), i=i, n=n, reverse=reverse)

    B = s_v.shape[0]
    sh = -1 if reverse else 1
    for g0 in range(G):
        g = G - 1 - g0 if reverse else g0
        cf = _to_f32(c_ref[g])
        v = _step(s_v[...], cf, P1, P2)
        s_v[...] = v
        d1 = _step(_roll_mask(s_d1[...], sh, B), cf, P1, P2)
        s_d1[...] = d1
        d2 = _step(_roll_mask(s_d2[...], -sh, B), cf, P1, P2)
        s_d2[...] = d2
        h = _h2_sum(hf_ref[g], hb_ref[g])
        out_ref[g] = (h + (v + d1 + d2).astype(jnp.int32)).astype(jnp.int16)


def _tri_dir_wta_kernel_windowed_h2(
    off_ref, c_ref, hf_ref, hb_ref, out_ref, s_v, s_d1, s_d2,
    *, P1, P2, G, reverse, uniq
):
    """Windowed final walk + WTA with the in-register horizontal fold
    (the 5-direction single-walk path)."""
    i = pl.program_id(0)
    n = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        s_v[...] = jnp.full_like(s_v, 255)
        s_d1[...] = jnp.full_like(s_d1, 255)
        s_d2[...] = jnp.full_like(s_d2, 255)

    _windowed_realign(off_ref, (s_v, s_d1, s_d2), i=i, n=n, reverse=reverse)

    B, D = s_v.shape
    sh = -1 if reverse else 1
    for g0 in range(G):
        g = G - 1 - g0 if reverse else g0
        cf = _to_f32(c_ref[g])
        v = _step(s_v[...], cf, P1, P2)
        s_v[...] = v
        d1 = _step(_roll_mask(s_d1[...], sh, B), cf, P1, P2)
        s_d1[...] = d1
        d2 = _step(_roll_mask(s_d2[...], -sh, B), cf, P1, P2)
        s_d2[...] = d2
        total = _h2_sum(hf_ref[g], hb_ref[g]).astype(jnp.float32) + (v + d1 + d2)
        out_ref[g] = _wta_row(total, D=D, min_disp=1, uniq=uniq)


def _run_tri_dir_partial_windowed_h2(
    cost, hf, hb, wstart_tiles, tile_rows, P1, P2, reverse, interpret=False
):
    S, B, D = cost.shape
    G = tile_rows
    assert S % G == 0
    n_blocks = S // G
    kernel = functools.partial(
        _tri_dir_partial_kernel_windowed_h2, P1=P1, P2=P2, G=G, reverse=reverse
    )
    blk = (G, B, D)
    if reverse:
        idx = lambda i, off: (n_blocks - 1 - i, 0, 0)
    else:
        idx = lambda i, off: (i, 0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(blk, idx)] * 3,
        out_specs=pl.BlockSpec(blk, idx),
        scratch_shapes=[pltpu.VMEM((B, D), jnp.float32) for _ in range(3)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, B, D), jnp.int16),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(wstart_tiles.astype(jnp.int32), cost, hf, hb)


def _run_tri_dir_wta_windowed_h2(
    cost, hf, hb, wstart_tiles, tile_rows, P1, P2, reverse, uniq, interpret=False
):
    S, B, D = cost.shape
    G = tile_rows
    assert S % G == 0
    n_blocks = S // G
    kernel = functools.partial(
        _tri_dir_wta_kernel_windowed_h2, P1=P1, P2=P2, G=G, reverse=reverse,
        uniq=uniq,
    )
    blk = (G, B, D)
    if reverse:
        idx = lambda i, off: (n_blocks - 1 - i, 0, 0)
        idx2 = lambda i, off: (n_blocks - 1 - i, 0)
    else:
        idx = lambda i, off: (i, 0, 0)
        idx2 = lambda i, off: (i, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(blk, idx)] * 3,
        out_specs=pl.BlockSpec((G, B), idx2),
        scratch_shapes=[pltpu.VMEM((B, D), jnp.float32) for _ in range(3)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, B), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(wstart_tiles.astype(jnp.int32), cost, hf, hb)


def _run_tri_dir_partial_windowed(
    cost, hsum, wstart_tiles, tile_rows, P1, P2, reverse, interpret=False
):
    S, B, D = cost.shape
    G = tile_rows
    assert S % G == 0
    n_blocks = S // G
    kernel = functools.partial(
        _tri_dir_partial_kernel_windowed, P1=P1, P2=P2, G=G, reverse=reverse
    )
    blk = (G, B, D)
    if reverse:
        idx = lambda i, off: (n_blocks - 1 - i, 0, 0)
    else:
        idx = lambda i, off: (i, 0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(blk, idx), pl.BlockSpec(blk, idx)],
        out_specs=pl.BlockSpec(blk, idx),
        scratch_shapes=[pltpu.VMEM((B, D), jnp.float32) for _ in range(3)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, B, D), jnp.int16),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(wstart_tiles.astype(jnp.int32), cost, hsum)


def _run_tri_dir_wta_windowed(
    cost, partial, wstart_tiles, tile_rows, P1, P2, reverse, uniq, interpret=False
):
    S, B, D = cost.shape
    G = tile_rows
    assert S % G == 0
    n_blocks = S // G
    kernel = functools.partial(
        _tri_dir_wta_kernel_windowed, P1=P1, P2=P2, G=G, reverse=reverse, uniq=uniq
    )
    blk = (G, B, D)
    if reverse:
        idx = lambda i, off: (n_blocks - 1 - i, 0, 0)
        idx2 = lambda i, off: (n_blocks - 1 - i, 0)
    else:
        idx = lambda i, off: (i, 0, 0)
        idx2 = lambda i, off: (i, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(blk, idx), pl.BlockSpec(blk, idx)],
        out_specs=pl.BlockSpec((G, B), idx2),
        scratch_shapes=[pltpu.VMEM((B, D), jnp.float32) for _ in range(3)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, B), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(wstart_tiles.astype(jnp.int32), cost, partial)


def sgm_wta_fused_pallas_windowed(
    cost: jnp.ndarray,
    wstart_tiles: jnp.ndarray,
    P1: int,
    P2: int,
    directions: int,
    uniqueness_ratio: int = 1,
    tile_rows: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused aggregation + WTA over a windowed volume: (H, W, Dw) uint8 ->
    (H, W) float32 *window-local* disparity (min_disp=1 sentinel, 0 =
    invalid), bit-identical to wta_disparity_windowed's local stage applied
    to sgm_aggregate_pallas_windowed.  Caller applies the off_rows shift."""
    assert directions in (5, 8)
    c = cost if cost.dtype == jnp.uint8 else cost.astype(jnp.uint8)

    if _USE_H2:
        hf, hb = _run_pair_img(c, P1, P2, interpret=interpret)
        if directions == 5:
            return _run_tri_dir_wta_windowed_h2(
                c, hf, hb, wstart_tiles, tile_rows, P1, P2, reverse=False,
                uniq=uniqueness_ratio, interpret=interpret,
            )
        partial = _run_tri_dir_partial_windowed_h2(
            c, hf, hb, wstart_tiles, tile_rows, P1, P2, reverse=False,
            interpret=interpret,
        )
        return _run_tri_dir_wta_windowed(
            c, partial, wstart_tiles, tile_rows, P1, P2, reverse=True,
            uniq=uniqueness_ratio, interpret=interpret,
        )

    cT = jnp.transpose(c, (1, 0, 2))
    hf, hb = _run_pair(cT, P1, P2, interpret=interpret)
    hsum = (
        jnp.transpose(hf, (1, 0, 2)).astype(jnp.int16)
        + jnp.transpose(hb, (1, 0, 2)).astype(jnp.int16)
    )
    if directions == 5:
        return _run_tri_dir_wta_windowed(
            c, hsum, wstart_tiles, tile_rows, P1, P2, reverse=False,
            uniq=uniqueness_ratio, interpret=interpret,
        )
    partial = _run_tri_dir_partial_windowed(
        c, hsum, wstart_tiles, tile_rows, P1, P2, reverse=False, interpret=interpret
    )
    return _run_tri_dir_wta_windowed(
        c, partial, wstart_tiles, tile_rows, P1, P2, reverse=True,
        uniq=uniqueness_ratio, interpret=interpret,
    )


def sgm_aggregate_pallas_windowed(
    cost: jnp.ndarray,
    wstart_tiles: jnp.ndarray,
    P1: int,
    P2: int,
    directions: int = 8,
    tile_rows: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """sgm_aggregate_pallas over a windowed (H, W, Dw) volume with
    per-tile window starts wstart_tiles (H // tile_rows,).

    Horizontal scans keep one window per slab row, so the plain pair
    kernel applies unchanged; row-walking scans use the realigning
    windowed tri-direction kernel.  directions=4 is folded into the
    tri-direction walks (vertical realignment needs the windowed kernel),
    so only 2/5/8 are offered."""
    assert directions in (2, 5, 8)
    c = cost if cost.dtype == jnp.uint8 else cost.astype(jnp.uint8)

    if _USE_H2:
        hf, hb = _run_pair_img(c, P1, P2, interpret=interpret)
        agg = hf.astype(jnp.int16) + hb.astype(jnp.int16)
    else:
        cT = jnp.transpose(c, (1, 0, 2))
        hf, hb = _run_pair(cT, P1, P2, interpret=interpret)
        agg = (
            jnp.transpose(hf, (1, 0, 2)).astype(jnp.int16)
            + jnp.transpose(hb, (1, 0, 2)).astype(jnp.int16)
        )
    if directions == 2:
        return agg
    tf = _run_tri_dir_windowed(
        c, wstart_tiles, tile_rows, P1, P2, reverse=False, interpret=interpret
    )
    if directions == 5:
        return agg + tf
    tb = _run_tri_dir_windowed(
        c, wstart_tiles, tile_rows, P1, P2, reverse=True, interpret=interpret
    )
    return agg + tf + tb
