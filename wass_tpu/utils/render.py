"""Debug-image rendering (render.hpp + the matcher/stereo debug imagery).

Host-side numpy/imageio equivalents of the reference's diagnostic outputs:
normalized disparity PNGs (render_disparity_float, render.hpp:55-87),
side-by-side / stacked stereo composites with scanlines (:89-173),
match visualizations (wass_match.cpp:70-95), and disparity-coverage
overlays (wass_stereo.cpp:1006-1025).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np


def _save(path, img):
    import imageio.v3 as iio

    iio.imwrite(Path(path), np.clip(img, 0, 255).astype(np.uint8))


def render_disparity(path, disp: np.ndarray) -> None:
    """Normalized disparity visualization; invalid (0) stays black."""
    d = np.asarray(disp, np.float64)
    m = d > 0
    if m.any():
        lo, hi = d[m].min(), d[m].max()
        vis = np.where(m, (d - lo) / max(hi - lo, 1e-9) * 235 + 20, 0)
    else:
        vis = np.zeros_like(d)
    _save(path, vis)


def render_stereo(path, left: np.ndarray, right: np.ndarray, vertical: bool = False, n_lines: int = 20) -> None:
    """Stereo composite with epipolar scanlines for rectification checks
    (the stereo.jpg output, wass_stereo.cpp:1910-1926)."""
    L = np.asarray(left, np.float64)
    R = np.asarray(right, np.float64)
    comp = np.concatenate([L, R], axis=0 if vertical else 1)
    comp = np.stack([comp] * 3, axis=-1)
    H = comp.shape[0]
    steps = max(H // (n_lines + 1), 1)
    for y in range(steps, H, steps):
        comp[y, :, 0] = 255
        comp[y, :, 1:] *= 0.4
    _save(path, comp)


def render_matches(path, img0: np.ndarray, img1: np.ndarray, uv0: np.ndarray, uv1: np.ndarray) -> None:
    """Side-by-side match plot (render_matches, wass_match.cpp:70-95),
    drawn with cheap numpy line rasterization."""
    L = np.asarray(img0, np.float64)
    R = np.asarray(img1, np.float64)
    comp = np.concatenate([L, R], axis=1)
    comp = np.stack([comp] * 3, axis=-1)
    W0 = L.shape[1]
    for (x0, y0), (x1, y1) in zip(np.asarray(uv0), np.asarray(uv1)):
        x1s = x1 + W0
        n = int(max(abs(x1s - x0), abs(y1 - y0), 1))
        xs = np.linspace(x0, x1s, n).astype(int)
        ys = np.linspace(y0, y1, n).astype(int)
        ok = (xs >= 0) & (xs < comp.shape[1]) & (ys >= 0) & (ys < comp.shape[0])
        comp[ys[ok], xs[ok]] = [255, 255, 0]
    _save(path, comp)


def render_coverage(path, img: np.ndarray, disp: np.ndarray, roi=None) -> None:
    """Green-tint disparity coverage over the rectified base image
    (disparity_coverage.jpg, wass_stereo.cpp:1006-1025)."""
    I = np.asarray(img, np.float64)
    vis = np.stack([I] * 3, axis=-1)
    covered = np.asarray(disp) > 1
    vis[..., 1] = np.where(covered, np.maximum(vis[..., 1], 100), vis[..., 1])
    if roi is not None:
        x, y, w, h = roi
        vis[y : y + h, [x, min(x + w - 1, vis.shape[1] - 1)], 0] = 255
        vis[[y, min(y + h - 1, vis.shape[0] - 1)], x : x + w, 0] = 255
    _save(path, vis)
