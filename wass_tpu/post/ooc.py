"""Out-of-core streaming over gridded HDF5 cubes.

The reference processes hour-long cubes (a 20 Hz x 30 min x 512^2 f32
cube is ~38 GB) without loading them in RAM: dask spatial chunks carrying
the full time axis for the temporal filter (filter_fast,
/root/reference/postproc/wasspost/wasspost.py:157-251), h5py chunk
iteration for zeromean (:965-1005), map_overlap box filtering for bgimage
(:1014-1074), and batched thread pools for visibilitymap (:502-621).

Equivalents here stream either spatial column blocks (T, by, bx) — for
time-axis operators that need the whole series per point — or time slabs
(bt, H, W) — for frame-wise operators — under an explicit memory budget
(WASS_POST_MEMORY_MB, default 512; set it tiny in tests to prove the
streaming path)."""

from __future__ import annotations

import os
from typing import Callable, Iterator, Tuple

import numpy as np


def memory_budget_bytes() -> int:
    mb = float(os.environ.get("WASS_POST_MEMORY_MB", "512"))
    return int(mb * 1024 * 1024)


def iter_col_blocks(shape, itemsize: int, n_buffers: int = 3) -> Iterator[Tuple[slice, slice]]:
    """Spatial blocks (full time axis): yields (ys, xs) such that
    n_buffers copies of (T, by, bx) fit the budget."""
    T, H, W = shape
    budget = memory_budget_bytes()
    per_col = max(T * itemsize * n_buffers, 1)
    cols = max(budget // per_col, 1)
    # Prefer full-width row bands; fall back to column tiles of one row band.
    by = max(min(int(cols // W), H), 1)
    bx = W if by >= 1 and cols >= W else max(int(cols), 1)
    if cols < W:
        by = 1
    for y0 in range(0, H, by):
        ys = slice(y0, min(y0 + by, H))
        for x0 in range(0, W, bx):
            yield ys, slice(x0, min(x0 + bx, W))


def iter_time_slabs(shape, itemsize: int, n_buffers: int = 3) -> Iterator[slice]:
    """Time slabs (full spatial extent): yields slices such that n_buffers
    copies of (bt, H, W) fit the budget."""
    T, H, W = shape
    budget = memory_budget_bytes()
    per_frame = max(H * W * itemsize * n_buffers, 1)
    bt = max(min(budget // per_frame, T), 1)
    for t0 in range(0, T, bt):
        yield slice(t0, min(t0 + bt, T))


def clamp_chunks(chunks, shape):
    """h5py rejects chunk dims larger than the dataset (writers may have
    declared e.g. 64-frame chunks on a short cube)."""
    if chunks is None:
        return None
    return tuple(min(c, s) for c, s in zip(chunks, shape))


def _make_like(f, src, name: str, dtype=None):
    if name in f:
        del f[name]
    return f.create_dataset(
        name,
        shape=src.shape,
        dtype=dtype or src.dtype,
        chunks=clamp_chunks(src.chunks, src.shape),
        compression=src.compression,
    )


def apply_timewise(f, src_name: str, dst_name: str, fn: Callable, dtype=None):
    """dst[:, ys, xs] = fn(src[:, ys, xs]) streamed over spatial blocks,
    full time axis per block (the filter_fast chunking contract:
    'crucial to chunk count = -1', wasspost.py:189-191)."""
    src = f[src_name]
    inplace = src_name == dst_name
    dst = src if inplace else _make_like(f, src, dst_name, dtype)
    for ys, xs in iter_col_blocks(src.shape, src.dtype.itemsize):
        dst[:, ys, xs] = fn(np.asarray(src[:, ys, xs]))
    return dst


def apply_framewise(f, src_name: str, dst_name: str, fn: Callable, dtype=None):
    """dst[ts] = fn(src[ts]) streamed over time slabs."""
    src = f[src_name]
    inplace = src_name == dst_name
    dst = src if inplace else _make_like(f, src, dst_name, dtype)
    for ts in iter_time_slabs(src.shape, src.dtype.itemsize):
        dst[ts] = fn(np.asarray(src[ts]))
    return dst


def streaming_time_mean(dset) -> np.ndarray:
    """NaN-aware per-point temporal mean, accumulated over time slabs
    (the first pass of the chunked zeromean, wasspost.py:965-1005)."""
    T, H, W = dset.shape
    s = np.zeros((H, W), np.float64)
    n = np.zeros((H, W), np.int64)
    for ts in iter_time_slabs(dset.shape, dset.dtype.itemsize):
        x = np.asarray(dset[ts], np.float64)
        m = np.isfinite(x)
        s += np.where(m, x, 0.0).sum(axis=0)
        n += m.sum(axis=0)
    return s / np.maximum(n, 1)
