"""Unit tests for wass_tpu.core geometry primitives.

The reference has no unit tests (SURVEY.md §4); we test each kernel against
closed-form identities and cv2 as an independent oracle.
"""

import cv2
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wass_tpu.core import (
    rodrigues,
    inv_rodrigues,
    invert_rt,
    rt_from_plane,
    quat_to_rot,
    rot_to_quat,
    triangulate_normalized,
    triangulate_pixels,
    epipolar_error_stats,
    structure_error_stats,
)
from wass_tpu.core.geometry import solve3x3, skew


def random_rotation(rng):
    rvec = rng.standard_normal(3)
    R, _ = cv2.Rodrigues(rvec)
    return R, rvec


class TestRotations:
    def test_rodrigues_matches_cv2(self, rng):
        for _ in range(10):
            rvec = rng.standard_normal(3) * 2
            R_cv, _ = cv2.Rodrigues(rvec)
            R = rodrigues(jnp.asarray(rvec, jnp.float64) if jax.config.jax_enable_x64 else jnp.asarray(rvec, jnp.float32))
            np.testing.assert_allclose(np.asarray(R), R_cv, atol=1e-5)

    def test_rodrigues_roundtrip(self, rng):
        for _ in range(10):
            rvec = rng.standard_normal(3)
            R = rodrigues(jnp.asarray(rvec, jnp.float32))
            back = inv_rodrigues(R)
            np.testing.assert_allclose(np.asarray(back), rvec, atol=1e-4)

    def test_rodrigues_zero(self):
        R = rodrigues(jnp.zeros(3))
        np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-7)

    def test_quat_roundtrip(self, rng):
        for _ in range(10):
            R_cv, _ = random_rotation(rng)
            q = rot_to_quat(jnp.asarray(R_cv, jnp.float32))
            R2 = quat_to_rot(q)
            np.testing.assert_allclose(np.asarray(R2), R_cv, atol=1e-5)

    def test_quat_batched(self, rng):
        Rs = np.stack([random_rotation(rng)[0] for _ in range(16)])
        qs = rot_to_quat(jnp.asarray(Rs, jnp.float32))
        back = quat_to_rot(qs)
        np.testing.assert_allclose(np.asarray(back), Rs, atol=1e-5)

    def test_invert_rt(self, rng):
        R, _ = random_rotation(rng)
        T = rng.standard_normal(3)
        Ri, Ti = invert_rt(jnp.asarray(R), jnp.asarray(T))
        x = rng.standard_normal(3)
        y = R @ x + T
        np.testing.assert_allclose(np.asarray(Ri) @ y + np.asarray(Ti), x, atol=1e-5)


class TestPlaneRT:
    def test_plane_frame_maps_normal_to_z(self, rng):
        n = rng.standard_normal(3)
        n = n / np.linalg.norm(n)
        if n[2] < 0:
            n = -n
        d = rng.standard_normal()
        plane = jnp.asarray([n[0], n[1], n[2], d], jnp.float32)
        R, T, Rinv, Tinv = rt_from_plane(plane)
        R = np.asarray(R)
        # R should be a rotation mapping n to +z.
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        np.testing.assert_allclose(R @ n, [0, 0, 1], atol=1e-5)
        # A point on the plane maps to z=0.
        p = rng.standard_normal(3)
        p = p - (n @ p + d) * n  # project onto plane
        q = R @ p + np.asarray(T)
        assert abs(q[2]) < 1e-4
        # Inverse consistency.
        back = np.asarray(Rinv) @ q + np.asarray(Tinv)
        np.testing.assert_allclose(back, p, atol=1e-5)


class TestSolve3x3:
    def test_matches_linalg(self, rng):
        A = rng.standard_normal((64, 3, 3)) + 3 * np.eye(3)
        b = rng.standard_normal((64, 3))
        x = solve3x3(jnp.asarray(A, jnp.float32), jnp.asarray(b, jnp.float32))
        ref = np.linalg.solve(A, b[..., None])[..., 0]
        np.testing.assert_allclose(np.asarray(x), ref, atol=1e-4)


class TestTriangulation:
    def _setup(self, rng, n=500):
        # Camera rig looking down at a wavy surface ~ 10 baseline units away.
        R, _ = cv2.Rodrigues(np.array([0.02, -0.3, 0.01]))
        T = np.array([-1.0, 0.03, 0.05])
        pts = np.stack(
            [
                rng.uniform(-5, 5, n),
                rng.uniform(-5, 5, n),
                rng.uniform(8, 20, n),
            ],
            axis=1,
        )
        p = pts[:, :2] / pts[:, 2:3]
        x1 = pts @ R.T + T
        q = x1[:, :2] / x1[:, 2:3]
        return R, T, pts, p, q

    def test_exact_recovery(self, rng):
        R, T, pts, p, q = self._setup(rng)
        rec = triangulate_normalized(
            jnp.asarray(p, jnp.float32), jnp.asarray(q, jnp.float32), jnp.asarray(R, jnp.float32), jnp.asarray(T, jnp.float32)
        )
        np.testing.assert_allclose(np.asarray(rec), pts, rtol=2e-3, atol=2e-3)

    def test_matches_reference_algorithm(self, rng):
        """Against a direct numpy transcription of triangulate.hpp:26-72."""
        R, T, pts, p, q = self._setup(rng, n=50)

        def ref_triangulate(p, q, R, T):
            Af = np.zeros((4, 3))
            Bf = np.zeros(4)
            Af[0] = [-1, 0, p[0]]
            Af[1] = [0, -1, p[1]]
            Af[2] = q[0] * R[2] - R[0]
            Af[3] = q[1] * R[2] - R[1]
            Bf[2] = T[0] - T[2] * q[0]
            Bf[3] = T[1] - T[2] * q[1]
            return np.linalg.solve(Af.T @ Af, Af.T @ Bf)

        noisy_q = q + rng.standard_normal(q.shape) * 2e-4
        rec = triangulate_normalized(
            jnp.asarray(p, jnp.float64 if jax.config.jax_enable_x64 else jnp.float32),
            jnp.asarray(noisy_q, jnp.float32),
            jnp.asarray(R, jnp.float32),
            jnp.asarray(T, jnp.float32),
        )
        ref = np.stack([ref_triangulate(pi, qi, R, T) for pi, qi in zip(p, noisy_q)])
        np.testing.assert_allclose(np.asarray(rec), ref, rtol=5e-3, atol=5e-3)

    def test_pixel_frontend(self, rng):
        R, T, pts, p, q = self._setup(rng, n=20)
        K0 = np.array([[1500.0, 0, 960], [0, 1500, 540], [0, 0, 1]])
        K1 = np.array([[1480.0, 0, 950], [0, 1480, 545], [0, 0, 1]])
        uv0 = p * [K0[0, 0], K0[1, 1]] + [K0[0, 2], K0[1, 2]]
        uv1 = q * [K1[0, 0], K1[1, 1]] + [K1[0, 2], K1[1, 2]]
        rec = triangulate_pixels(
            jnp.asarray(uv0, jnp.float32), jnp.asarray(uv1, jnp.float32),
            jnp.asarray(K0, jnp.float32), jnp.asarray(K1, jnp.float32),
            jnp.asarray(R, jnp.float32), jnp.asarray(T, jnp.float32),
        )
        np.testing.assert_allclose(np.asarray(rec), pts, rtol=5e-3, atol=5e-3)


class TestEpipolarStats:
    def test_zero_error_for_perfect_matches(self, rng):
        R, _ = cv2.Rodrigues(np.array([0.05, -0.2, 0.03]))
        T = np.array([-1.0, 0.02, 0.1])
        K = np.array([[1000.0, 0, 640], [0, 1000, 480], [0, 0, 1]])
        pts = np.stack([rng.uniform(-3, 3, 100), rng.uniform(-3, 3, 100), rng.uniform(5, 15, 100)], 1)
        uv0 = (pts / pts[:, 2:3]) @ K.T
        x1 = pts @ R.T + T
        uv1 = (x1 / x1[:, 2:3]) @ K.T
        E = skew(jnp.asarray(T, jnp.float32)) @ jnp.asarray(R, jnp.float32)
        Ki = np.linalg.inv(K)
        F = jnp.asarray(Ki.T, jnp.float32) @ E @ jnp.asarray(Ki, jnp.float32)
        stats = epipolar_error_stats(F, jnp.asarray(uv0[:, :2], jnp.float32), jnp.asarray(uv1[:, :2], jnp.float32))
        assert float(stats.avg) < 1e-2
        assert float(stats.max) < 0.1

    def test_structure_error(self, rng):
        R, _ = cv2.Rodrigues(np.array([0.05, -0.2, 0.03]))
        T = np.array([-1.0, 0.02, 0.1])
        K = np.array([[1000.0, 0, 640], [0, 1000, 480], [0, 0, 1]])
        pts = np.stack([rng.uniform(-3, 3, 64), rng.uniform(-3, 3, 64), rng.uniform(5, 15, 64)], 1)
        uv0 = (pts / pts[:, 2:3]) @ K.T
        x1 = pts @ R.T + T
        uv1 = (x1 / x1[:, 2:3]) @ K.T
        stats = structure_error_stats(
            jnp.asarray(pts, jnp.float32), jnp.asarray(uv0[:, :2], jnp.float32), jnp.asarray(uv1[:, :2], jnp.float32),
            jnp.asarray(R, jnp.float32), jnp.asarray(T, jnp.float32), jnp.asarray(K, jnp.float32), jnp.asarray(K, jnp.float32),
        )
        assert float(stats.avg) < 1e-2
