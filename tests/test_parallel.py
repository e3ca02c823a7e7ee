"""Multi-device tests on the 8-device virtual CPU mesh: frame sharding and
the distributed Schur-complement BA (sharded result must match the
single-device solver)."""

import cv2
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wass_tpu.parallel.mesh import make_frame_mesh, frame_sharding
from wass_tpu.parallel.distba import lm_refine_two_view_sharded, pad_points_for_mesh
from wass_tpu.calib.ba import lm_refine_two_view


def _ba_problem(rng, n=512):
    R, _ = cv2.Rodrigues(np.array([0.02, -0.25, 0.015]))
    T = np.array([-1.0, 0.02, 0.06])
    T /= np.linalg.norm(T)
    pts = np.stack([rng.uniform(-4, 4, n), rng.uniform(-4, 4, n), rng.uniform(8, 25, n)], 1)
    p0 = pts[:, :2] / pts[:, 2:]
    x1 = pts @ R.T + T
    p1 = x1[:, :2] / x1[:, 2:]
    p0 = p0 + rng.standard_normal(p0.shape) * 2e-4
    p1 = p1 + rng.standard_normal(p1.shape) * 2e-4
    Rp, _ = cv2.Rodrigues(cv2.Rodrigues(R)[0].ravel() + np.array([2e-3, -1.5e-3, 1e-3]))
    Tp = T + np.array([3e-3, -2e-3, 1e-3])
    Xp = pts + rng.standard_normal(pts.shape) * 0.05
    return R, T, Rp, Tp, Xp, p0, p1


class TestDistributedBA:
    def test_matches_single_device(self, rng):
        assert jax.device_count() >= 8
        mesh = make_frame_mesh(8)
        R, T, Rp, Tp, Xp, p0, p1 = _ba_problem(rng)
        mask = np.ones(len(Xp), bool)
        mask[500:] = False

        args32 = [jnp.asarray(a, jnp.float32) for a in (Rp, Tp, Xp, p0, p1)]
        single = lm_refine_two_view(*args32, jnp.asarray(mask), max_iters=40)
        shard = lm_refine_two_view_sharded(
            mesh, *args32, jnp.asarray(mask), max_iters=40
        )
        # Same math, same reductions => near-identical camera solution.
        np.testing.assert_allclose(np.array(shard.R), np.array(single.R), atol=5e-5)
        np.testing.assert_allclose(np.array(shard.T), np.array(single.T), atol=5e-5)
        # And both recover the ground truth.
        Tr = np.array(shard.T)
        Tr /= np.linalg.norm(Tr)
        assert np.abs(np.array(shard.R) - R).max() < 1e-3
        assert np.abs(Tr - T).max() < 5e-3

    def test_padding_helper(self, rng):
        arrs = [np.ones((13, 3)), np.ones((13, 2))]
        mask = np.ones(13, bool)
        (a, b), m = pad_points_for_mesh(arrs, mask, 8)
        assert a.shape[0] == 16 and b.shape[0] == 16
        assert m.sum() == 13


class TestShardedRunner:
    def test_sharded_matches_single_device(self, rng):
        """One shard_map step over 8 virtual devices must reproduce the
        single-device pipeline per frame (plane + point count) and return
        the rectified images for the debug artifact set."""
        from wass_tpu.ops.sampling import warp_homography
        from wass_tpu.parallel.runner import ShardedDenseRunner
        from wass_tpu.stereo.dense import (
            DenseStereoConfig, build_geom_pack, dense_stereo_device,
            prepare_frame_geometry,
        )
        from wass_tpu.testing import make_scene

        h, w, F = 64, 96, 8
        sc = make_scene(seed=3, width=w, height=h, wave_amplitude=0.25)
        rig = sc.rig
        cfg = DenseStereoConfig(
            num_disp=16, min_disp=1, plane_ransac_rounds=64,
            plane_ransac_threshold=0.1, plane_max_distance=0.3,
        )
        geom = prepare_frame_geometry(rig.K0, rig.K1, rig.R, rig.T, (w, h))
        gp = build_geom_pack(geom, (h, w))
        b_img, m_img = (sc.img0, sc.img1) if geom.base_is_cam0 else (sc.img1, sc.img0)
        stack = lambda x: np.broadcast_to(np.asarray(x, np.float32), (F, h, w)).copy()

        runner = ShardedDenseRunner(make_frame_mesh(F), cfg)
        res, rects, info, mean_plane = runner.run_batch(
            stack(b_img), stack(m_img), [gp] * F
        )
        assert np.asarray(rects[0]).shape == (F, h, w)
        assert info["fallback_frames"] == []

        b1 = jnp.asarray(b_img, jnp.float32)
        m1 = jnp.asarray(m_img, jnp.float32)
        br = warp_homography(b1, gp["H_base"], (h, w))
        mr = warp_homography(m1, gp["H_match"], (h, w))
        one = dense_stereo_device(br, mr, b1, m1, gp, cfg)
        for k in range(F):
            np.testing.assert_allclose(
                np.asarray(res.plane)[k], np.asarray(one.plane), atol=5e-4
            )
            assert abs(int(np.asarray(res.n_points)[k]) - int(one.n_points)) <= 16
        np.testing.assert_allclose(
            np.asarray(mean_plane), np.asarray(one.plane), atol=5e-4
        )


class TestFallbackGranularity:
    def test_only_tripped_frames_rerun(self, rng):
        """When one frame of a batch trips the c2f fallback, ONLY that
        frame is recomputed (single-frame full-range program); the other
        frames' shard buffers are reused bit-for-bit."""
        from wass_tpu.parallel.runner import ShardedDenseRunner
        from wass_tpu.stereo.dense import DenseStereoConfig
        from wass_tpu.testing import make_scene
        from wass_tpu.stereo.dense import build_geom_pack, prepare_frame_geometry

        h, w, F = 64, 96, 8
        sc = make_scene(seed=5, width=w, height=h, wave_amplitude=0.25)
        rig = sc.rig
        cfg = DenseStereoConfig(
            num_disp=16, min_disp=1, plane_ransac_rounds=64,
            plane_ransac_threshold=0.1, plane_max_distance=0.3,
        )
        geom = prepare_frame_geometry(rig.K0, rig.K1, rig.R, rig.T, (w, h))
        gp = build_geom_pack(geom, (h, w))
        b_img, m_img = (sc.img0, sc.img1) if geom.base_is_cam0 else (sc.img1, sc.img0)
        stack = lambda x: np.broadcast_to(np.asarray(x, np.float32), (F, h, w)).copy()
        bb, mb = stack(b_img), stack(m_img)

        # Control: no fallback.
        control = ShardedDenseRunner(make_frame_mesh(F), cfg)
        res0, rects0, info0, _ = control.run_batch(bb, mb, [gp] * F)
        assert info0["fallback_frames"] == [] and control.n_fallback_reruns == 0

        # Trip frame 3 only (c2f is inactive on the CPU mesh, so drive the
        # selection hook directly — the mechanics under test are the
        # re-run granularity and the shard splice, not the c2f metric).
        runner = ShardedDenseRunner(make_frame_mesh(F), cfg)
        runner._select_fallback = lambda cov, offb, shape: [3]
        res, rects, info, mean_plane = runner.run_batch(bb, mb, [gp] * F)
        assert info["fallback_frames"] == [3]
        assert runner.n_fallback_reruns == 1

        # Non-tripped frames: identical buffers (reused, not recomputed).
        for k in range(F):
            if k == 3:
                continue
            np.testing.assert_array_equal(
                np.asarray(res.points)[k], np.asarray(res0.points)[k]
            )
            np.testing.assert_array_equal(
                np.asarray(res.disparity)[k], np.asarray(res0.disparity)[k]
            )
        # The re-run frame agrees with the full-range result (identical
        # math, different program partitioning -> allclose not equality).
        np.testing.assert_allclose(
            np.asarray(res.plane)[3], np.asarray(res0.plane)[3], atol=5e-4
        )
        assert abs(int(np.asarray(res.n_points)[3]) - int(np.asarray(res0.n_points)[3])) <= 16
        assert np.all(np.isfinite(np.asarray(mean_plane)))


class TestFrameSharding:
    def test_sharded_batch_reduction(self):
        mesh = make_frame_mesh(8)
        fsh = frame_sharding(mesh)
        x = jax.device_put(np.arange(8 * 4, dtype=np.float32).reshape(8, 4), fsh)

        @jax.jit
        def mean_over_frames(x):
            return jnp.mean(x, axis=0)

        out = mean_over_frames(x)
        np.testing.assert_allclose(np.array(out), np.arange(8 * 4).reshape(8, 4).mean(0))
