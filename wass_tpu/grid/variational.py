"""Differentiable photo-consistency surface refinement (JAX).

Functional counterpart of the reference's experimental
TFVariationalRefinement
(/root/reference/gridding/wassgridsurface/TFVariationalRefinement.py:18-133;
its call-site is commented out in wassgridsurface.py:382-435 — here the
path is functional and wired behind GridConfig.variational, off by
default to match the reference's shipping behavior).

Semantics mirror the reference: the gridded surface Z is optimized with
Adam at half resolution; the loss is the photometric MSE between the two
undistorted camera images sampled through the surface's projections
(data term, :73-97) plus alpha * mean |grad Z|^2 computed with
derivative-of-Gaussian kernels (smoothness, :38-40,66-71); the result is
bilinearly upsampled and masked (:99-133).

Conventions (ours, matching grid/gridding.grid_frame): Z is the gridded
elevation in METERS on the setup's XY grid with the z-flip applied, so a
grid node (XX, YY, Z) maps to the camera frame as
    p_cam = Rpl^T ((XX, YY, -Z) / baseline - Tpl).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from wass_tpu.ops.sampling import bilinear_sample


def _dog_kernels(n: int = 7, sigma: float = 0.8):
    """Derivative-of-Gaussian x/y kernels (reference :9-15)."""
    x = np.exp(-0.5 * ((np.arange(n) - n // 2) / sigma) ** 2)
    w = np.outer(x, x)
    dx = np.gradient(w, axis=1)
    dy = np.gradient(w, axis=0)
    return jnp.asarray(dx, jnp.float32), jnp.asarray(dy, jnp.float32)


def _conv2(img, k):
    return jax.lax.conv_general_dilated(
        img[None, None], k[None, None],
        window_strides=(1, 1), padding="SAME",
    )[0, 0]


@partial(jax.jit, static_argnames=("max_iters", "coarse_factor"))
def variational_refine(
    Z,
    I0,
    I1,
    P0cam,
    P1cam,
    Rpl,
    Tpl,
    XX,
    YY,
    baseline,
    mask,
    max_iters: int = 400,
    alpha: float = 10.0,
    lr: float = 1e-3,
    coarse_factor: int = 2,
):
    """Refine the gridded surface Z (meters) by photo-consistency.

    Args:
      Z: (H, W) gridded elevation (NaNs allowed outside mask).
      I0, I1: undistorted camera images (float, 0..255).
      P0cam, P1cam: 3x4 camera projection matrices (cam0 frame,
        baseline-normalized — the workdir P0cam.txt/P1cam.txt contract).
      Rpl, Tpl: the sea-plane alignment of grid/setup (mesh_aligned =
        Rpl @ mesh + Tpl, z flipped, scaled by baseline).
      mask: (H, W) {0,1} validity of the gridded surface.

    Returns (H, W) refined Z with NaNs outside the mask.
    """
    H, W = Z.shape
    Zf = jnp.nan_to_num(jnp.asarray(Z, jnp.float32))
    m = jnp.asarray(mask, jnp.float32)
    kx, ky = _dog_kernels()

    # plane-frame (baseline units) grid coordinates; z enters as -Z/b.
    Xp = jnp.asarray(XX, jnp.float32) / baseline
    Yp = jnp.asarray(YY, jnp.float32) / baseline
    R_c = jnp.asarray(Rpl, jnp.float32).T  # plane -> cam
    T_c = -R_c @ jnp.asarray(Tpl, jnp.float32).reshape(3)
    P0 = jnp.asarray(P0cam, jnp.float32)
    P1 = jnp.asarray(P1cam, jnp.float32)
    I0j = jnp.asarray(I0, jnp.float32)
    I1j = jnp.asarray(I1, jnp.float32)

    def sample(img, P, pc):
        uvw = P[:, :3] @ pc + P[:, 3:4]
        uv = uvw[:2] / jnp.maximum(uvw[2], 1e-6)
        return bilinear_sample(img, uv[0].reshape(H, W), uv[1].reshape(H, W))

    def loss(Zc):
        Zfull = jax.image.resize(Zc, (H, W), "bilinear")
        p_plane = jnp.stack(
            [Xp.ravel(), Yp.ravel(), -Zfull.ravel() / baseline]
        )
        pc = R_c @ p_plane + T_c[:, None]
        s0 = sample(I0j, P0, pc) * m / 255.0
        s1 = sample(I1j, P1, pc) * m / 255.0
        data = jnp.mean(jnp.square(s0 - s1))
        zdx = _conv2(Zfull, kx)
        zdy = _conv2(Zfull, ky)
        smooth = jnp.mean(jnp.square(zdx) + jnp.square(zdy))
        return data + alpha * smooth

    Zc0 = jax.image.resize(Zf, (H // coarse_factor, W // coarse_factor), "bilinear")
    grad_fn = jax.grad(loss)

    # In-module Adam (same update rule/eps as the reference's
    # tf.keras Adam; no external optimizer dependency).
    b1, b2, eps = 0.9, 0.999, 1e-7

    def step(i, carry):
        Zc, mu, nu = carry
        g = grad_fn(Zc)
        mu = b1 * mu + (1.0 - b1) * g
        nu = b2 * nu + (1.0 - b2) * g * g
        t = (i + 1).astype(jnp.float32)
        mhat = mu / (1.0 - jnp.power(b1, t))
        nhat = nu / (1.0 - jnp.power(b2, t))
        return (Zc - lr * mhat / (jnp.sqrt(nhat) + eps), mu, nu)

    Zc, _, _ = jax.lax.fori_loop(
        0, max_iters, step, (Zc0, jnp.zeros_like(Zc0), jnp.zeros_like(Zc0))
    )
    Zfull = jax.image.resize(Zc, (H, W), "bilinear")
    return jnp.where(m > 0, Zfull, jnp.nan)
