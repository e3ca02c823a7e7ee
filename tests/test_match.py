"""Matching-stage tests: features, iidyn, GT matcher, E-RANSAC, pose, and
the verify_matcher-style gates on a synthetic scene
(/root/reference/test/verify_matcher.m: >=400 matches, avg epi err <=0.5 px,
|dT| <= 2e-2, |dR| <= 5e-3 — thresholds scaled for test resolution)."""

import cv2
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wass_tpu.core.geometry import skew
from wass_tpu.match.features import detect_features
from wass_tpu.match.iidyn import iidyn, initial_population
from wass_tpu.match.matcher import generate_candidates, payoff_matrix, gt_match
from wass_tpu.match.ransac import essential_ransac, recover_pose
from wass_tpu.match.pipeline import match_frame, MatchConfig
from wass_tpu.testing import make_scene


class TestFeatures:
    def test_detect_on_textured_image(self, rng):
        img = (rng.random((192, 256)) * 255).astype(np.float32)
        img = cv2.GaussianBlur(img, (0, 0), 2) * 4
        f = detect_features(jnp.asarray(img), max_features=256)
        assert int(f.valid.sum()) > 50
        xy = np.asarray(f.xy)[np.asarray(f.valid)]
        assert (xy[:, 0] >= 0).all() and (xy[:, 0] < 256).all()
        d = np.asarray(f.desc)[np.asarray(f.valid)]
        np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-4)

    def test_descriptors_match_under_translation(self, rng):
        """The same texture shifted by an integer offset must produce
        nearest-neighbor-consistent descriptors."""
        big = cv2.GaussianBlur((rng.random((260, 330)) * 255).astype(np.float32), (0, 0), 1.5) * 4
        a = big[:192, :256]
        b = big[40:232, 50:306]
        fa = detect_features(jnp.asarray(a), max_features=200)
        fb = detect_features(jnp.asarray(b), max_features=200)
        cand = generate_candidates(fa, fb)
        sel = np.asarray(cand.nndr_best & cand.valid)
        if sel.sum() < 5:
            pytest.skip("not enough NNDR matches on this texture")
        src = np.asarray(cand.src)[sel]
        dst = np.asarray(cand.dst)[sel]
        uva = np.asarray(fa.xy)[src]
        uvb = np.asarray(fb.xy)[dst]
        pred = uva - [50, 40]
        err = np.linalg.norm(pred - uvb, axis=1)
        assert np.median(err) < 1.5


class TestIIDyn:
    def test_finds_dominant_clique(self, rng):
        """Payoff = block matrix with a strong mutually-consistent group:
        the equilibrium support must be that group."""
        n, g = 40, 12
        A = rng.random((n, n)) * 0.05
        A[:g, :g] = 0.95 + rng.random((g, g)) * 0.05
        A = (A + A.T) / 2
        np.fill_diagonal(A, 0)
        x0 = initial_population(jax.random.PRNGKey(0), n)
        x, iters, err = iidyn(jnp.asarray(A, jnp.float32), x0, max_iters=5000)
        x = np.asarray(x)
        assert x[:g].sum() > 0.95
        assert int(iters) < 5000

    def test_mask_excludes_entries(self, rng):
        n, g = 30, 8
        A = rng.random((n, n)) * 0.05
        A[:g, :g] = 0.9
        A = (A + A.T) / 2
        np.fill_diagonal(A, 0)
        mask = np.ones(n, bool)
        mask[:4] = False  # exclude half the clique
        x0 = initial_population(jax.random.PRNGKey(0), n, jnp.asarray(mask))
        x, _, _ = iidyn(jnp.asarray(A, jnp.float32), x0, mask=jnp.asarray(mask), max_iters=5000)
        assert np.asarray(x)[:4].sum() == 0


class TestRansacPose:
    def _correspondences(self, rng, n=200, outliers=50):
        R, _ = cv2.Rodrigues(np.array([0.03, -0.28, 0.02]))
        T = np.array([-1.0, 0.01, 0.05])
        T = T / np.linalg.norm(T)
        pts = np.stack([rng.uniform(-4, 4, n), rng.uniform(-4, 4, n), rng.uniform(8, 25, n)], 1)
        p0 = pts[:, :2] / pts[:, 2:]
        x1 = pts @ R.T + T
        p1 = x1[:, :2] / x1[:, 2:]
        p1[:outliers] = rng.uniform(-0.4, 0.4, (outliers, 2))
        return R, T, p0, p1, outliers

    def test_essential_ransac_and_pose(self, rng):
        R, T, p0, p1, n_out = self._correspondences(rng)
        er = essential_ransac(
            jnp.asarray(p0, jnp.float32), jnp.asarray(p1, jnp.float32),
            jnp.ones(len(p0), bool), jax.random.PRNGKey(1), threshold=2.0 / 1000.0,
        )
        assert int(er.n_inliers) > len(p0) - n_out - 15
        pose = recover_pose(er.E, jnp.asarray(p0, jnp.float32), jnp.asarray(p1, jnp.float32), er.inliers)
        assert np.abs(np.array(pose.R) - R).max() < 5e-3
        assert np.abs(np.array(pose.T) - T).max() < 2e-2


@pytest.mark.slow
class TestMatchStage:
    def test_synthetic_scene_gates(self):
        sc = make_scene(seed=3, width=512, height=384, wave_amplitude=0.25)
        rig = sc.rig
        cfg = MatchConfig(num_features=1500, iidyn_iters=8000, max_rounds=10, hessian_threshold=3e-5, feature_grid_cell=8)
        res = match_frame(sc.img0, sc.img1, rig.K0, rig.K1, cfg)
        assert res is not None
        # Matches scale with resolution; the reference gate is 400 at 3 MP.
        assert res.n_matches >= 60
        assert res.epi_avg <= 0.6
        Tg = rig.T / np.linalg.norm(rig.T)
        # Pose gates (verify_matcher.m:7-8), relaxed ~3x for resolution.
        assert np.abs(res.R - rig.R).max() < 2e-2
        assert np.abs(res.T.ravel() - Tg).max() < 5e-2

    def test_degraded_imagery_gates(self):
        """Matcher robustness on degraded frames: JPEG compression (the
        reference's own robustness study, test/jpeg_compression_test.m:31-40)
        plus additive sensor noise on top.  Gates as above, relaxed ~2x —
        a matcher that needs pristine floats is useless on real camera data.
        The full-resolution sweep is bench/robustness.py."""
        sc = make_scene(seed=3, width=512, height=384, wave_amplitude=0.25)
        rig = sc.rig
        deg = []
        rng = np.random.default_rng(7)
        for img, nseed in ((sc.img0, 1), (sc.img1, 2)):
            noisy = np.clip(
                np.asarray(img, np.float64)
                + np.random.default_rng(nseed).standard_normal(img.shape) * 3.0,
                0, 255,
            ).astype(np.uint8)
            ok, buf = cv2.imencode(".jpg", noisy, [cv2.IMWRITE_JPEG_QUALITY, 80])
            assert ok
            deg.append(cv2.imdecode(buf, cv2.IMREAD_GRAYSCALE).astype(np.float32))
        cfg = MatchConfig(num_features=1500, iidyn_iters=8000, max_rounds=10, hessian_threshold=3e-5, feature_grid_cell=8)
        res = match_frame(deg[0], deg[1], rig.K0, rig.K1, cfg)
        assert res is not None
        assert res.n_matches >= 40
        assert res.epi_avg <= 1.0
        Tg = rig.T / np.linalg.norm(rig.T)
        assert np.abs(res.R - rig.R).max() < 4e-2
        assert np.abs(res.T.ravel() - Tg).max() < 1e-1
