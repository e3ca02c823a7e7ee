"""Subpixel match refinement by inverse-compositional Lucas-Kanade.

The reference leans on KAZE's subpixel keypoint localization for its
<= 0.5 px epipolar-error gate (/root/reference/test/verify_matcher.m:6);
our grid-NMS detector is coarser, so matched pairs are polished here: for
each correspondence, a translational LK alignment of a small window of
image 0 onto image 1 (2x2 normal equations from gradient sums, vmapped
over matches — a few thousand tiny systems, ideal VPU work).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from wass_tpu.ops.sampling import bilinear_sample


@partial(jax.jit, static_argnames=("win", "iters"))
def refine_matches_lk(
    img0: jnp.ndarray,
    img1: jnp.ndarray,
    uv0: jnp.ndarray,
    uv1: jnp.ndarray,
    win: int = 7,
    iters: int = 10,
) -> jnp.ndarray:
    """Refine uv1 so that img1(uv1') best aligns with img0 around uv0.

    Args:
      img0, img1: (H, W) float images.
      uv0, uv1: (M, 2) initial correspondence coordinates.
      win: half-window radius.
      iters: Gauss-Newton iterations.

    Returns:
      (M, 2) refined uv1.
    """
    offs = jnp.arange(-win, win + 1, dtype=jnp.float32)
    oy, ox = jnp.meshgrid(offs, offs, indexing="ij")

    def one(p0, p1):
        tx = p0[0] + ox
        ty = p0[1] + oy
        template = bilinear_sample(img0, tx, ty)
        # Template gradients (inverse-compositional: computed once).
        gx = 0.5 * (bilinear_sample(img0, tx + 1, ty) - bilinear_sample(img0, tx - 1, ty))
        gy = 0.5 * (bilinear_sample(img0, tx, ty + 1) - bilinear_sample(img0, tx, ty - 1))
        a = jnp.sum(gx * gx)
        b = jnp.sum(gx * gy)
        c = jnp.sum(gy * gy)
        det = a * c - b * b
        inv = jnp.where(jnp.abs(det) > 1e-8, 1.0 / jnp.maximum(jnp.abs(det), 1e-8), 0.0) * jnp.sign(det)

        def step(_, p):
            cur = bilinear_sample(img1, p[0] + ox, p[1] + oy)
            e = cur - template
            jx = jnp.sum(gx * e)
            jy = jnp.sum(gy * e)
            dx = (c * jx - b * jy) * inv
            dy = (a * jy - b * jx) * inv
            d = jnp.stack([dx, dy])
            d = jnp.clip(d, -1.0, 1.0)
            return p - d

        p = jax.lax.fori_loop(0, iters, step, p1)
        # Reject divergence: fall back to the initial estimate.
        moved = jnp.linalg.norm(p - p1)
        return jnp.where(moved < win, p, p1)

    return jax.vmap(one)(uv0, uv1)
