"""Wave spectra: Welch frequency spectrum + 3D wavenumber-frequency cube.

Functional ports of /root/reference/postproc/wasspost/spectra.py:

* compute_spectrum (:9-49): Welch auto-spectral density of the elevation
  time series averaged over a (2*rangespan+1)^2 patch of grid centers —
  here the patch of time series is batched (one rfft over a stacked
  segment tensor) instead of a python double loop;
* compute_3d_spectrum (:53-171): Hann-windowed 3D FFT Welch segments with
  window power correction;
* spectrum_stats: integral wave parameters (Hm0, Tm01, peak) as reported
  by the wasspost `spectrum` command (wasspost.py:415-433).

FFTs run in jnp (device), orchestration stays host-side numpy.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np
import jax.numpy as jnp


def _hann(n: int) -> np.ndarray:
    # scipy.signal.windows.hann (symmetric) to match the reference.
    if n == 1:
        return np.ones(1)
    k = np.arange(n)
    return 0.5 - 0.5 * np.cos(2 * np.pi * k / (n - 1))


def compute_spectrum(
    data: np.ndarray,
    dt: float,
    nperseg: int = 512,
    rangespan: int = 5,
    scale: float = 1.0,
):
    """Averaged Welch PSD over the central (2*rangespan+1)^2 grid points.

    data: (T, H, W) elevation cube (may contain NaN; series are mean-filled).
    Returns (f, S, center_timeseries), one-sided density (Welch/CSD
    convention: Hann window, 50% overlap, density scaling).
    """
    T, H, W = data.shape
    ci, cj = H // 2, W // 2
    sl_i = slice(ci - rangespan, ci + rangespan + 1)
    sl_j = slice(cj - rangespan, cj + rangespan + 1)
    series = np.asarray(data[:, sl_i, sl_j], np.float64) * scale  # (T, P, P)
    series = series.reshape(T, -1)
    series = np.where(np.isnan(series), np.nanmean(series, axis=0, keepdims=True), series)
    series = series - series.mean(axis=0, keepdims=True)

    nperseg = min(nperseg, T)
    noverlap = nperseg // 2
    step = nperseg - noverlap
    nseg = max((T - noverlap) // step, 1)
    win = _hann(nperseg)
    wnorm = (win**2).sum()

    segs = np.stack([series[k * step : k * step + nperseg] for k in range(nseg)], axis=0)  # (nseg, nperseg, M)
    segs = segs - segs.mean(axis=1, keepdims=True)
    segs = segs * win[None, :, None]
    F = jnp.fft.rfft(jnp.asarray(segs), axis=1)
    psd = (jnp.abs(F) ** 2) * (dt / wnorm)
    # One-sided correction (all bins except DC/Nyquist doubled).
    nf = psd.shape[1]
    fac = jnp.ones(nf).at[1:].set(2.0)
    if nperseg % 2 == 0:
        fac = fac.at[-1].set(1.0)
    psd = psd * fac[None, :, None]
    S_all = jnp.mean(psd, axis=0)  # (nf, M) mean over segments
    # The reference averages the center + all patch series, the center
    # effectively counted once more (csd of the center first, then +=).
    center_idx = (series.shape[1]) // 2
    S = (jnp.sum(S_all, axis=1) + S_all[:, center_idx]) / (series.shape[1] + 1)
    f = np.fft.rfftfreq(nperseg, d=dt)
    return f, np.asarray(S), series[:, center_idx]


class SpectrumStats(NamedTuple):
    hm0: float
    tm01: float
    fp: float
    tp: float


def spectrum_stats(f: np.ndarray, S: np.ndarray) -> SpectrumStats:
    """Integral parameters (wasspost.py:415-433): Hm0 = 4 sqrt(m0),
    Tm01 = m0/m1, peak from the PSD maximum."""
    df = f[1] - f[0]
    m0 = float(np.sum(S) * df)
    m1 = float(np.sum(f * S) * df)
    ip = int(np.argmax(S))
    fp = float(f[ip])
    return SpectrumStats(
        hm0=4.0 * np.sqrt(m0),
        tm01=m0 / m1 if m1 > 0 else np.inf,
        fp=fp,
        tp=1.0 / fp if fp > 0 else np.inf,
    )


def compute_3d_spectrum(
    data: np.ndarray,
    du: float,
    dt: float,
    segments: int = 10,
    datascale: float = 1.0,
):
    """3D wavenumber-frequency Welch spectrum (spectra.py:53-171).

    Returns (S_welch (Nt, Nx, Ny), KX, KY, f).
    """
    N = data.shape[1] * 2 // 3
    T = data.shape[0]
    Nt = int(T / segments)
    if Nt % 2 > 0:
        Nt += 1
    seg_shift = Nt // 2

    mr = data.shape[1] // 2
    mc = data.shape[2] // 2
    r_start, r_end = mr - N // 2 - 20, mr + N // 2 - 20 + 1
    c_start, c_end = mc - N // 2, mc + N // 2 + 1
    r_start = max(r_start, 0)
    c_start = max(c_start, 0)
    Nx = r_end - r_start
    Ny = c_end - c_start

    kx_max = (2.0 * np.pi / du) / 2.0
    f_max = (1.0 / dt) / 2.0
    dkx = 2.0 * np.pi / (du * np.floor(Nx / 2.0) * 2.0)
    dky = 2.0 * np.pi / (du * np.floor(Ny / 2.0) * 2.0)
    df = 1.0 / (dt * np.floor(Nt / 2.0) * 2.0)

    kx = np.arange(-kx_max, kx_max + dkx, dkx)[:Nx]
    ky = np.arange(-kx_max, kx_max + dky, dky)[:Ny]
    f = np.arange(-f_max, f_max, df)[:Nt]
    # Row-major grids matching S's spatial axes (rows = kx, cols = ky).
    KX, KY = np.meshgrid(kx, ky, indexing="ij")

    hx = _hann(Nx)
    hy = _hann(Ny)
    ht = _hann(Nt)
    win3d = ht[:, None, None] * (hx[:, None] * hy[None, :])[None, :, :]
    wc = (1.0 / np.mean(hx**2)) * (1.0 / np.mean(hy**2)) * (1.0 / np.mean(ht**2))

    S_welch = np.zeros((Nt, Nx, Ny))
    n = 0
    for ii in range(segments * 2):
        t0 = ii * seg_shift
        cube = np.asarray(data[t0 : t0 + Nt, r_start:r_end, c_start:c_end], np.float64) * datascale
        if cube.shape[0] != Nt:
            break
        cube = np.where(np.isnan(cube), np.nanmean(cube, axis=0, keepdims=True), cube)
        w = (cube - cube.mean()) * win3d
        S = jnp.fft.fftshift(jnp.fft.fftn(jnp.asarray(w), norm="ortho"))
        S = S / (Nt * Nx * Ny)
        S = jnp.abs(S) ** 2 / (dkx * dky * df) * wc
        S_welch += np.asarray(S)
        n += 1
    if n:
        S_welch /= n
    return S_welch, KX, KY, f
