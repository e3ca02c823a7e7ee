"""Surface-infill interpolators for gridded elevations.

JAX re-implementations of the reference's two inpainting schemes:

* DCT: inverse-problem inpainting — optimize an Nfreqs x Nfreqs block of
  DCT coefficients so the reconstruction matches the observed cells,
  L1-regularized (DCTInterpolator,
  /root/reference/gridding/wassgridsurface/DCTInterpolator.py:27-121; torch
  Rprop -> a jitted Rprop loop on jax.grad);
* IDW: iterated inverse-distance-weighted convolution infill with a
  morphological-close validity mask (IDWInterpolator.py:23-58; the
  convolutions are XLA stencils).

Both take Z grids with NaN holes and return (filled, mask).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-III matrix matching scipy.fft.dct(np.eye(n), type=3,
    norm='ortho') as used by the reference."""
    from scipy.fft import dct

    return dct(np.eye(n), type=3, norm="ortho")


@partial(jax.jit, static_argnames=("nfreqs", "max_iters"))
def _dct_optimize(I, mask, Dc_h, Dc_w, key, nfreqs: int, max_iters: int, alpha: float, lr: float):
    H, W = I.shape

    def reconstruct(x):
        full = jnp.zeros((H, W), I.dtype).at[:nfreqs, :nfreqs].set(x)
        return Dc_h.T @ full @ Dc_w

    msum = jnp.maximum(jnp.sum(mask), 1.0)

    def loss_fn(x):
        Irec = reconstruct(x)
        data = jnp.sum((Irec - I) ** 2 * mask) / msum
        reg = jnp.sum(jnp.abs(x))
        return data + alpha * reg

    grad = jax.grad(loss_fn)

    # Rprop (resilient backprop): per-parameter step sizes adapted by
    # gradient-sign agreement — the same optimizer family as the torch
    # reference (lr=5.0, eta+=1.2, eta-=0.5, like torch defaults).
    x0 = jax.random.uniform(key, (nfreqs, nfreqs), I.dtype)
    step0 = jnp.full((nfreqs, nfreqs), lr, I.dtype)

    def body(_, state):
        x, step, gprev = state
        g = grad(x)
        agree = jnp.sign(g) * jnp.sign(gprev)
        step = jnp.where(agree > 0, jnp.minimum(step * 1.2, 50.0), step)
        step = jnp.where(agree < 0, jnp.maximum(step * 0.5, 1e-6), step)
        g_eff = jnp.where(agree < 0, 0.0, g)
        x = x - jnp.sign(g_eff) * step
        return x, step, g_eff

    x, _, _ = jax.lax.fori_loop(0, max_iters, body, (x0, step0, jnp.zeros_like(x0)))
    return reconstruct(x)


def dct_interpolate(
    Z: np.ndarray,
    nfreqs: int = 150,
    max_iters: int = 500,
    alpha: float = 8e-7,
    lr: float = 5.0,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Fill NaN holes of Z with the truncated-DCT optimization."""
    H, W = Z.shape
    nfreqs = min(nfreqs, H, W)
    mask = ~np.isnan(Z)
    I = np.nan_to_num(Z).astype(np.float32)
    Dc_h = jnp.asarray(_dct_matrix(H), jnp.float32)
    Dc_w = jnp.asarray(_dct_matrix(W), jnp.float32)
    out = _dct_optimize(
        jnp.asarray(I), jnp.asarray(mask, jnp.float32), Dc_h, Dc_w,
        jax.random.PRNGKey(seed), nfreqs, max_iters, alpha, lr,
    )
    return np.asarray(out), np.ones_like(mask, dtype=np.float32)


def _conv2_same(x: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    return jax.scipy.signal.convolve2d(x, k, mode="same")


@partial(jax.jit, static_argnames=("ksize", "reps"))
def _idw_device(I, valid, ksize: int, exp: float, reps: int):
    kd = jnp.arange(ksize, dtype=jnp.float32) - ksize // 2
    kx = jnp.tile(kd, (ksize, 1))
    ky = kx.T
    dist = jnp.sqrt(kx**2 + ky**2)
    K = jnp.where(dist > 0, 1.0 / jnp.power(jnp.maximum(dist, 1e-9), exp), 0.0)

    mask = valid.astype(jnp.float32)
    Iinit = I * mask
    cur = Iinit
    m = mask
    for _ in range(reps):
        I2 = _conv2_same(cur, K)
        m2 = _conv2_same(m, K)
        I2 = I2 / (m2 + 1e-9)
        m = jnp.sign(m2)
        cur = mask * Iinit + (1 - mask) * I2

    # Morphological close of the validity mask (reps iterations).
    ones = jnp.ones((ksize, ksize), jnp.float32)
    d = valid.astype(jnp.float32)
    for _ in range(reps):
        d = jnp.sign(_conv2_same(d, ones))
    for _ in range(reps):
        d = 1.0 - jnp.sign(_conv2_same(1.0 - d, ones))
    return cur, d


def idw_interpolate(Z: np.ndarray, ksize: int = 5, exp: float = 2.4, reps: int = 3):
    valid = ~np.isnan(Z)
    I = np.nan_to_num(Z).astype(np.float32)
    out, final_mask = _idw_device(jnp.asarray(I), jnp.asarray(valid), ksize, exp, reps)
    out = np.asarray(out).copy()
    fm = np.asarray(final_mask)
    out[fm == 0] = np.nan
    return out, fm
