"""Surface geometry analytics: slopes/normals and occlusion masks.

Ports of /root/reference/postproc/wasspost/geometry.py:

* compute_slope_and_normals (:5-17): np.gradient slopes + upward normals;
* compute_occlusion_mask (:21-100): per-grid-point ray marching over the
  elevation field.  The reference steps a shrinking seed list; on TPU the
  march is a fixed-bound lax.while_loop over the *full* ray batch with
  an active mask (dead rays simply stop contributing), keeping shapes
  static.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


def compute_slope_and_normals(XX: np.ndarray, YY: np.ndarray, ZZ: np.ndarray):
    dx = XX[0, 1] - XX[0, 0]
    dy = YY[1, 0] - YY[0, 0]
    slope_y, slope_x = np.gradient(ZZ, dy, dx)
    slope = np.dstack([slope_x, slope_y])
    normals = np.dstack([slope_x, slope_y, -np.ones_like(ZZ)])
    normals = -normals / np.linalg.norm(normals, axis=-1, keepdims=True)
    return slope, normals


@partial(jax.jit, static_argnames=("max_steps",))
def _occlusion_device(ZZ: jnp.ndarray, ray_d: jnp.ndarray, max_steps: int):
    H, W = ZZ.shape
    maxz = jnp.max(ZZ)

    # Normalize so the dominant horizontal component steps one cell.
    denom = jnp.maximum(jnp.max(jnp.abs(ray_d[..., :2]), axis=-1, keepdims=True), 1e-12)
    d = (ray_d / denom).reshape(-1, 3)

    xx, yy = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32), jnp.arange(H, dtype=jnp.float32))
    px = xx.reshape(-1)
    py = yy.reshape(-1)
    pz = ZZ.reshape(-1)

    def cond(state):
        i, px, py, pz, occ, active = state
        return (i < max_steps) & jnp.any(active)

    def body(state):
        i, px, py, pz, occ, active = state
        px = px + d[:, 0]
        py = py + d[:, 1]
        pz = pz + d[:, 2]
        xi = jnp.round(px).astype(jnp.int32)
        yi = jnp.round(py).astype(jnp.int32)
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H) & (pz <= maxz)
        active = active & inb
        z = ZZ[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]
        hit = active & (z >= pz)
        occ = occ | hit
        active = active & ~hit
        return i + 1, px, py, pz, occ, active

    n = H * W
    occ0 = jnp.zeros(n, bool)
    active0 = jnp.ones(n, bool)
    _, _, _, _, occ, _ = jax.lax.while_loop(cond, body, (0, px, py, pz, occ0, active0))
    return occ.reshape(H, W)


def compute_occlusion_mask(ZZ: np.ndarray, ray_d: np.ndarray, invert_y_axis: bool = False) -> np.ndarray:
    """Occlusion mask: 1 where the ray from each surface point intersects
    the surface again (point is occluded along that direction)."""
    assert ray_d.shape == ZZ.shape + (3,)
    assert np.nanmin(ray_d[..., 2]) > 0, "rays must go upward"
    rd = np.array(ray_d, np.float64)
    if invert_y_axis:
        rd[..., 1] *= -1
    max_steps = int(2 * max(ZZ.shape))
    occ = _occlusion_device(jnp.asarray(ZZ, jnp.float32), jnp.asarray(rd, jnp.float32), max_steps)
    return np.asarray(occ).astype(np.uint8)
