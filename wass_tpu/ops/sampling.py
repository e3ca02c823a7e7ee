"""Batched image sampling / warping / undistortion kernels.

TPU-native replacements for the cv::remap / cv::undistort /
cv::warpPerspective / cv::resize calls on the reference's hot paths
(undistort at /root/reference/src/wass_prepare/wass_prepare.cpp:268, rectify
warps at /root/reference/src/wass_stereo/wass_stereo.cpp:522-528,605-607,
resizes at :785-797,895-928).  All functions are pure jnp gathers +
elementwise math: they jit, vmap over frame batches, and differentiate.

Convention: images are (H, W) or (..., H, W) float arrays; coordinates are
(x, y) pixel positions with (0, 0) at the center of the top-left pixel
(OpenCV convention).  Out-of-bounds samples return `fill`.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp


def _gather2d(img: jnp.ndarray, yi: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
    """Clamped integer gather from the last two axes of img."""
    H, W = img.shape[-2], img.shape[-1]
    yi = jnp.clip(yi, 0, H - 1)
    xi = jnp.clip(xi, 0, W - 1)
    return img[..., yi, xi]


def bilinear_sample(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray, fill: float = 0.0) -> jnp.ndarray:
    """Bilinear sampling of img at float coords (x, y)."""
    H, W = img.shape[-2], img.shape[-1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    v00 = _gather2d(img, y0i, x0i)
    v01 = _gather2d(img, y0i, x0i + 1)
    v10 = _gather2d(img, y0i + 1, x0i)
    v11 = _gather2d(img, y0i + 1, x0i + 1)

    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    out = top * (1 - fy) + bot * fy

    valid = (x >= 0) & (x <= W - 1) & (y >= 0) & (y <= H - 1)
    return jnp.where(valid, out, fill)


def bicubic_sample(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray, fill: float = 0.0) -> jnp.ndarray:
    """Bicubic (Catmull-Rom style, a=-0.75) sampling at float coords."""
    H, W = img.shape[-2], img.shape[-1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    wx = _cubic_kernel_weights(fx)
    wy = _cubic_kernel_weights(fy)

    out = jnp.zeros(jnp.broadcast_shapes(x.shape, y.shape), img.dtype)
    rows = []
    for j in range(4):
        row = jnp.zeros_like(out)
        for i in range(4):
            row = row + wx[i] * _gather2d(img, y0i + j - 1, x0i + i - 1)
        rows.append(row)
    for j in range(4):
        out = out + wy[j] * rows[j]

    valid = (x >= 0) & (x <= W - 1) & (y >= 0) & (y <= H - 1)
    return jnp.where(valid, out, fill)


def _cubic_kernel_weights(f: jnp.ndarray, a: float = -0.75):
    """Weights for samples at integer offsets (-1, 0, 1, 2) around f in [0,1)."""
    # BiCubic kernel W(x) with A=a evaluated at distances (1+f, f, 1-f, 2-f).
    def k(x):
        ax = jnp.abs(x)
        ax2 = ax * ax
        ax3 = ax2 * ax
        return jnp.where(
            ax <= 1.0,
            (a + 2) * ax3 - (a + 3) * ax2 + 1,
            jnp.where(ax < 2.0, a * ax3 - 5 * a * ax2 + 8 * a * ax - 4 * a, 0.0),
        )

    return k(1.0 + f), k(f), k(1.0 - f), k(2.0 - f)


def warp_homography(
    img: jnp.ndarray,
    H: jnp.ndarray,
    out_shape,
    interp: str = "linear",
    fill: float = 0.0,
) -> jnp.ndarray:
    """Warp img by homography H: out(u, v) = img(H^-1 (u, v)).

    Matches cv::warpPerspective(img, out, H, size): H maps source -> dest,
    so sampling uses the inverse map.
    """
    Hi = jnp.linalg.inv(H)
    h, w = out_shape
    u = jnp.arange(w, dtype=img.dtype)
    v = jnp.arange(h, dtype=img.dtype)
    uu, vv = jnp.meshgrid(u, v)
    ww = Hi[2, 0] * uu + Hi[2, 1] * vv + Hi[2, 2]
    ww = jnp.where(jnp.abs(ww) > 1e-20, ww, 1e-20)
    sx = (Hi[0, 0] * uu + Hi[0, 1] * vv + Hi[0, 2]) / ww
    sy = (Hi[1, 0] * uu + Hi[1, 1] * vv + Hi[1, 2]) / ww
    sampler = bilinear_sample if interp == "linear" else bicubic_sample
    return sampler(img, sx, sy, fill=fill)


def warp_homography_twopass(
    img: jnp.ndarray,
    H_np: "np.ndarray",
    out_shape,
    fill: float = 0.0,
) -> jnp.ndarray:
    """Gather-free homography warp (bilinear) for compile-time-static H.

    TPU gathers cost ~150 ms per 3 MP warp; this replaces them with a
    Catmull-Smith two-pass resample expressed as shift-select sums:
    rectification displacements are small and smooth (tens of px for
    stereo rigs), so each 1-D pass is a sum over the static integer-shift
    range [kmin, kmax] of `where(floor-index == k) * rolled-image` terms
    — pure elementwise ops + static rolls that XLA fuses into a few
    streaming passes (~2 ms/warp).

    H is host numpy and becomes a compile-time constant: one compilation
    per rectification geometry (fixed per sequence — the reference also
    computes one rectification per sequence).  Two-pass linear resampling
    differs from direct bilinear only by a sub-pixel vertical offset
    between adjacent columns (|dH| * 1 px), far below the sensor noise.

    Passes (Catmull-Smith, vertical first):
      A[y, u] = I(sy_t(y, u), u)   with sy_t(y, u) = sy(x*(u, y), y),
                x* solving sx(x*, y) = u;
      O[y, x] = A(y, sx(x, y)).
    """
    import numpy as np

    Hi = np.linalg.inv(np.asarray(H_np, np.float64))
    a, b, c = Hi[0]
    d, e, f_ = Hi[1]
    g, h, i_ = Hi[2]
    Hs, Ws = img.shape
    Ho, Wo = out_shape

    def _safe_den(den, lib):
        """Pass-1 column inversion divides by (u*g - a); if the line
        u = a/g crosses the image width the denominator vanishes there.
        Clamp its magnitude: the affected columns map outside the image
        after the [-1, Hs] clip and are removed by the validity gate."""
        tiny = 1e-9
        sgn = lib.where(den >= 0, 1.0, -1.0)
        return lib.where(lib.abs(den) < tiny, sgn * tiny, den)

    # ---- host: static shift ranges from a stride-4 grid (+2 margin) -----
    ug = np.arange(0, Ws, 4, dtype=np.float64)
    yg = np.arange(0, Ho, 4, dtype=np.float64)
    UU, YY = np.meshgrid(ug, yg)
    xs = (b * YY + c - UU * (h * YY + i_)) / _safe_den(UU * g - a, np)
    syt_h = (d * xs + e * YY + f_) / (g * xs + h * YY + i_)
    syt_h = np.clip(syt_h, -1.0, Hs)
    k1min = int(np.floor(syt_h - YY).min()) - 2
    k1max = int(np.floor(syt_h - YY).max()) + 2

    xg = np.arange(0, Wo, 4, dtype=np.float64)
    XX, YY2 = np.meshgrid(xg, yg)
    den = g * XX + h * YY2 + i_
    sx_h = np.clip((a * XX + b * YY2 + c) / den, -1.0, Ws)
    k2min = int(np.floor(sx_h - XX).min()) - 2
    k2max = int(np.floor(sx_h - XX).max()) + 2

    # ---- device: pass 1 (vertical resample per source column) -----------
    dt = img.dtype
    uu = jnp.arange(Ws, dtype=dt)[None, :]
    yy = jnp.arange(Ho, dtype=dt)[:, None]
    xs_d = (b * yy + c - uu * (h * yy + i_)) / _safe_den(uu * g - a, jnp)
    syt = (d * xs_d + e * yy + f_) / (g * xs_d + h * yy + i_)
    syt = jnp.clip(syt, -1.0, float(Hs))
    p0 = jnp.floor(syt)
    fr1 = syt - p0
    k1 = p0.astype(jnp.int32) - jnp.arange(Ho, dtype=jnp.int32)[:, None]

    # Edge-replicated source (top+bottom rows) so shifts never wrap data
    # into the interior; out-of-image samples are edge clones and the
    # final validity gate removes them.
    Iv = jnp.concatenate([img[:1], img, img[-1:]], axis=0)

    pad_top = max(0, -(k1min + 1))
    pad_bot = max(0, k1max + 2 + Ho - (Hs + 2))
    Iv_pad = jnp.pad(Iv, ((pad_top, pad_bot), (0, 0)), mode="edge")
    A = jnp.zeros((Ho, Ws), dt)
    for kk in range(k1min, k1max + 2):
        w = jnp.where(k1 == kk, 1.0 - fr1, 0.0) + jnp.where(k1 == kk - 1, fr1, 0.0)
        # source row y + kk  ->  padded row index y + kk + 1 + pad_top
        sl = jax.lax.dynamic_slice_in_dim(Iv_pad, kk + 1 + pad_top, Ho, axis=0)
        A = A + w * sl

    # ---- device: pass 2 (horizontal resample per output row) ------------
    xx = jnp.arange(Wo, dtype=dt)[None, :]
    yy2 = jnp.arange(Ho, dtype=dt)[:, None]
    den_d = g * xx + h * yy2 + i_
    sx = (a * xx + b * yy2 + c) / den_d
    sy = (d * xx + e * yy2 + f_) / den_d
    sx_cl = jnp.clip(sx, -1.0, float(Ws))
    q0 = jnp.floor(sx_cl)
    fr2 = sx_cl - q0
    k2 = q0.astype(jnp.int32) - jnp.arange(Wo, dtype=jnp.int32)[None, :]

    Ah = jnp.concatenate([A[:, :1], A, A[:, -1:]], axis=1)
    O = jnp.zeros((Ho, Wo), dt)
    Ah_pad = jnp.pad(
        Ah, ((0, 0), (max(0, -(k2min + 1)), max(0, k2max + 2 + Wo - (Ws + 2)))), mode="edge"
    )
    for kk in range(k2min, k2max + 2):
        w = jnp.where(k2 == kk, 1.0 - fr2, 0.0) + jnp.where(k2 == kk - 1, fr2, 0.0)
        sl = jax.lax.dynamic_slice_in_dim(
            Ah_pad, kk + 1 + max(0, -(k2min + 1)), Wo, axis=1
        )
        O = O + w * sl

    valid = (sx >= 0) & (sx <= Ws - 1) & (sy >= 0) & (sy <= Hs - 1)
    return jnp.where(valid, O, fill)


@lru_cache(maxsize=64)
def _twopass_jitted(H_bytes: bytes, out_shape, dtype_str: str):
    import numpy as np

    H_np = np.frombuffer(H_bytes, np.float64).reshape(3, 3)
    return jax.jit(
        lambda img: warp_homography_twopass(img, H_np, out_shape)
    )


def warp_homography_twopass_cached(img, H_np, out_shape):
    """jit-cached entry for the static-H two-pass warp (one compiled
    executable per (H, shape) pair — H is fixed per sequence)."""
    import numpy as np

    key = np.ascontiguousarray(np.asarray(H_np, np.float64)).tobytes()
    return _twopass_jitted(key, tuple(out_shape), str(img.dtype))(img)


def distort_points(pts: jnp.ndarray, K: jnp.ndarray, dist: jnp.ndarray) -> jnp.ndarray:
    """Apply the OpenCV rational+tangential distortion model to ideal pixel
    points: ideal (undistorted) pixel coords -> distorted pixel coords.

    dist = (k1, k2, p1, p2[, k3[, k4, k5, k6]]) as in cv::undistort
    (/root/reference/src/wass_prepare/wass_prepare.cpp:268 uses 5-term).
    """
    d = jnp.zeros((8,), pts.dtype).at[: dist.shape[0]].set(dist.reshape(-1))
    k1, k2, p1, p2, k3, k4, k5, k6 = [d[i] for i in range(8)]
    x = (pts[..., 0] - K[0, 2]) / K[0, 0]
    y = (pts[..., 1] - K[1, 2]) / K[1, 1]
    r2 = x * x + y * y
    radial = (1 + k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2) / (
        1 + k4 * r2 + k5 * r2 * r2 + k6 * r2 * r2 * r2
    )
    xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yd = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    return jnp.stack([xd * K[0, 0] + K[0, 2], yd * K[1, 1] + K[1, 2]], axis=-1)


def undistort_points(pts: jnp.ndarray, K: jnp.ndarray, dist: jnp.ndarray, iters: int = 8) -> jnp.ndarray:
    """Inverse of distort_points by fixed-point iteration (cv::undistortPoints)."""
    d = jnp.zeros((8,), pts.dtype).at[: dist.shape[0]].set(dist.reshape(-1))
    k1, k2, p1, p2, k3, k4, k5, k6 = [d[i] for i in range(8)]
    xd = (pts[..., 0] - K[0, 2]) / K[0, 0]
    yd = (pts[..., 1] - K[1, 2]) / K[1, 1]

    def body(_, xy):
        x, y = xy
        r2 = x * x + y * y
        radial = (1 + k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2) / (
            1 + k4 * r2 + k5 * r2 * r2 + k6 * r2 * r2 * r2
        )
        dx = 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
        dy = p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
        return ((xd - dx) / radial, (yd - dy) / radial)

    x, y = jax.lax.fori_loop(0, iters, body, (xd, yd))
    return jnp.stack([x * K[0, 0] + K[0, 2], y * K[1, 1] + K[1, 2]], axis=-1)


def undistort_image(img: jnp.ndarray, K: jnp.ndarray, dist: jnp.ndarray, interp: str = "linear") -> jnp.ndarray:
    """cv::undistort equivalent: for each undistorted output pixel, sample the
    source image at its distorted position (same K for input and output)."""
    H, W = img.shape[-2], img.shape[-1]
    u = jnp.arange(W, dtype=img.dtype)
    v = jnp.arange(H, dtype=img.dtype)
    uu, vv = jnp.meshgrid(u, v)
    src = distort_points(jnp.stack([uu, vv], axis=-1), K, dist)
    sampler = bilinear_sample if interp == "linear" else bicubic_sample
    return sampler(img, src[..., 0], src[..., 1])


def resize(img: jnp.ndarray, out_shape, interp: str = "cubic", fill: float = 0.0) -> jnp.ndarray:
    """cv::resize-compatible resampling (pixel-center aligned scaling).

    interp: "nearest" | "linear" | "cubic".  Matches OpenCV's coordinate
    mapping src_x = (dst_x + 0.5) * sx - 0.5.
    """
    H, W = img.shape[-2], img.shape[-1]
    h, w = out_shape
    sx = W / w
    sy = H / h
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) * sx - 0.5
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) * sy - 0.5
    xx, yy = jnp.meshgrid(xs, ys)
    if interp == "nearest":
        xi = jnp.clip(jnp.floor(xx + 0.5).astype(jnp.int32), 0, W - 1)
        yi = jnp.clip(jnp.floor(yy + 0.5).astype(jnp.int32), 0, H - 1)
        return _gather2d(img, yi, xi)
    xx = jnp.clip(xx, 0.0, W - 1.0)
    yy = jnp.clip(yy, 0.0, H - 1.0)
    sampler = bilinear_sample if interp == "linear" else bicubic_sample
    return sampler(img, xx.astype(img.dtype), yy.astype(img.dtype), fill=fill)
