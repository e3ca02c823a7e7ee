"""Temporal and spatial filtering of gridded elevation cubes.

Equivalents of the wasspost `filter` / `filter_fast` / `spatial_lowpass`
commands (/root/reference/postproc/wasspost/wasspost.py:149-371):

* temporal_butterworth: zero-phase Butterworth (filtfilt) along the time
  axis of a (T, H, W) cube — scipy designs the SOS, the filtering is
  applied vectorized over all grid columns at once (the reference loops
  rows / dask-chunks);
* spatial_butterworth_lowpass: the radially-symmetric frequency-domain
  2D Butterworth (Spatial2DButterworth, spectra.py:176-202) applied per
  frame with batched jnp FFTs.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def temporal_butterworth(
    data: np.ndarray,
    fps: float,
    cutoff_hz: float = 1.0,
    order: int = 8,
    kind: str = "lowpass",
) -> np.ndarray:
    """Zero-phase temporal Butterworth over a (T, H, W) cube (NaN-safe:
    NaNs are mean-filled before filtering and restored after)."""
    from scipy import signal

    T = data.shape[0]
    flat = np.asarray(data, np.float64).reshape(T, -1)
    nanmask = np.isnan(flat)
    colmean = np.nanmean(np.where(nanmask, np.nan, flat), axis=0)
    colmean = np.nan_to_num(colmean)
    filled = np.where(nanmask, colmean[None, :], flat)
    sos = signal.butter(order, cutoff_hz, btype="low" if kind == "lowpass" else "high", fs=fps, output="sos")
    out = signal.sosfiltfilt(sos, filled, axis=0)
    out = np.where(nanmask, np.nan, out)
    return out.reshape(data.shape)


def spatial_butterworth_kernel(H: int, W: int, du: float, cutoff: float, order: int = 4) -> np.ndarray:
    fx = np.fft.fftshift(np.fft.fftfreq(W, d=du))
    fy = np.fft.fftshift(np.fft.fftfreq(H, d=du))
    FX, FY = np.meshgrid(fx, fy)
    R = np.sqrt(FX**2 + FY**2)
    return 1.0 / np.sqrt(1.0 + (R / cutoff) ** (2 * order))


def spatial_butterworth_lowpass(
    frames: np.ndarray,
    du: float,
    cutoff: float,
    order: int = 4,
) -> np.ndarray:
    """Apply the 2D radial Butterworth to (T, H, W) or (H, W) data."""
    single = frames.ndim == 2
    cube = frames[None] if single else frames
    T, H, W = cube.shape
    filt = jnp.asarray(np.fft.ifftshift(spatial_butterworth_kernel(H, W, du, cutoff, order)))
    x = jnp.asarray(np.nan_to_num(cube), jnp.float32)
    F = jnp.fft.fft2(x, axes=(-2, -1))
    out = jnp.real(jnp.fft.ifft2(F * filt[None], axes=(-2, -1)))
    out = np.asarray(out)
    out = np.where(np.isnan(cube), np.nan, out)
    return out[0] if single else out


def zero_mean(data: np.ndarray) -> np.ndarray:
    """Per-grid-point temporal zero-mean (wasspost `zeromean`,
    wasspost.py:965-1005)."""
    m = np.nanmean(data, axis=0, keepdims=True)
    return data - m
