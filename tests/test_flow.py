"""Optical-flow reconstruction path tests (the reference's optional
WASS_ENABLE_OPTFLOW stage, wass_stereo.cpp:1391-1775): coarse flow from
the rectified disparity, variational refinement convergence, and the
end-to-end flow point cloud on a synthetic scene."""

import numpy as np
import jax.numpy as jnp
import pytest

from wass_tpu.stereo.dense import DenseStereoConfig, dense_stereo_frame
from wass_tpu.stereo.flow import (
    FlowConfig,
    binary_dilate,
    binary_erode,
    coarse_flow_from_disparity,
    flow_correspondence_gates,
    flow_reconstruct_frame,
    idw_fill,
    variational_refine,
)
from wass_tpu.testing import make_scene


def _translate(img, dx, dy):
    """Sample img at (x + dx, y + dy) with wrap-free bilinear shift."""
    from wass_tpu.ops.sampling import bilinear_sample

    h, w = img.shape
    xx = jnp.arange(w, dtype=jnp.float32)[None, :].repeat(h, 0)
    yy = jnp.arange(h, dtype=jnp.float32)[:, None].repeat(w, 1)
    return bilinear_sample(jnp.asarray(img), xx + dx, yy + dy, fill=0.0)


class TestCoarseFlow:
    def test_identity_homographies_pure_disparity(self):
        """With identity rectification the flow must be exactly (-d, 0)."""
        h, w = 40, 64
        d = 5.0
        disp = jnp.full((h, w), d, jnp.float32)
        I3 = jnp.eye(3, dtype=jnp.float32)
        flow, valid = coarse_flow_from_disparity(disp, I3, I3, (h, w), 1.0)
        v = np.asarray(valid)
        f = np.asarray(flow)
        assert v[5:-5, 8:-8].all()
        np.testing.assert_allclose(f[v][:, 0], -d, atol=1e-4)
        np.testing.assert_allclose(f[v][:, 1], 0.0, atol=1e-4)

    def test_idw_fill_fills_holes(self, rng):
        h, w = 32, 32
        flow = jnp.stack(
            [jnp.full((h, w), 3.0), jnp.full((h, w), -2.0)], -1
        )
        valid = jnp.asarray(rng.random((h, w)) > 0.7)
        filled = np.asarray(idw_fill(flow, valid, reps=16))
        np.testing.assert_allclose(filled[..., 0], 3.0, atol=1e-3)
        np.testing.assert_allclose(filled[..., 1], -2.0, atol=1e-3)

    def test_mask_opening(self):
        m = jnp.zeros((16, 16), jnp.float32).at[8, 8].set(1.0)
        d = binary_dilate(m, 1)
        assert float(d.sum()) == 9.0
        e = binary_erode(d, 1)
        assert float(e.sum()) == 1.0
        # An isolated pixel disappears under erode-then-dilate ordering
        # used for speckles (dilate=1, erode=2 kills it).
        assert float(binary_erode(d, 2).sum()) == 0.0


class TestVariationalRefinement:
    def test_recovers_small_translation(self, rng):
        h, w = 64, 96
        import cv2

        tex = rng.random((h, w)).astype(np.float32)
        tex = cv2.GaussianBlur(tex, (0, 0), 2.0) * 255.0
        true = (1.3, -0.8)
        I0 = _translate(tex, *true)  # I0(p) = I1(p + w_true)
        I1 = jnp.asarray(tex)
        init = jnp.zeros((h, w, 2), jnp.float32)
        out = variational_refine(I0, I1, init, alpha=30.0, delta=100.0, outer=12, inner=25)
        f = np.asarray(out)[8:-8, 8:-8]
        err = np.hypot(f[..., 0] - true[0], f[..., 1] - true[1])
        assert np.median(err) < 0.25

    def test_reduces_photometric_error(self, rng):
        import cv2

        h, w = 48, 64
        tex = rng.random((h, w)).astype(np.float32)
        tex = cv2.GaussianBlur(tex, (0, 0), 1.5) * 255.0
        I0 = _translate(tex, 2.0, 0.0)
        I1 = jnp.asarray(tex)
        init = jnp.zeros((h, w, 2), jnp.float32)
        before = np.abs(np.asarray(I1 - I0))[6:-6, 6:-6].mean()
        out = variational_refine(I0, I1, init, alpha=30.0, delta=100.0, outer=8, inner=25)
        w_I1 = _translate(
            tex,
            0.0,
            0.0,
        )
        from wass_tpu.ops.sampling import bilinear_sample

        xx = jnp.arange(w, dtype=jnp.float32)[None, :].repeat(h, 0)
        yy = jnp.arange(h, dtype=jnp.float32)[:, None].repeat(w, 1)
        I1w = bilinear_sample(I1, xx + out[..., 0], yy + out[..., 1], fill=0.0)
        after = np.abs(np.asarray(I1w - I0))[6:-6, 6:-6].mean()
        assert after < before * 0.35


class TestFlowGates:
    def test_gates(self):
        h, w = 24, 40
        I = jnp.full((h, w), 100.0)
        flow = jnp.zeros((h, w, 2), jnp.float32).at[..., 0].add(2.0)
        mask = jnp.ones((h, w), jnp.float32)
        ok = np.asarray(flow_correspondence_gates(flow, mask, I, I))
        assert ok[5:-5, 5:-5].all()
        # Magnitude gate: |flow| >= W/2 rejected.
        big = flow.at[..., 0].set(float(w))
        assert not np.asarray(flow_correspondence_gates(big, mask, I, I)).any()
        # Zero-intensity base pixels rejected.
        ok2 = np.asarray(
            flow_correspondence_gates(flow, mask, I.at[3, 3].set(0.0), I)
        )
        assert not ok2[3, 3]


class TestFlowEndToEnd:
    @pytest.fixture(scope="class")
    def scene(self):
        return make_scene(seed=7, width=256, height=192, wave_amplitude=0.25)

    def test_flow_reconstruction_quality(self, scene):
        cfg = DenseStereoConfig(
            num_disp=96, min_disp=1, plane_ransac_rounds=128, min_triangulated=50
        )
        res, geom = dense_stereo_frame(
            scene.img0, scene.img1, scene.rig.K0, scene.rig.K1,
            scene.rig.R, scene.rig.T, cfg,
        )
        assert int(res.n_points) > 1000

        b_img = scene.img0 if geom.base_is_cam0 else scene.img1
        m_img = scene.img1 if geom.base_is_cam0 else scene.img0
        fcfg = FlowConfig(lowres_iterations=400, fullres_iterations=100)
        fr = flow_reconstruct_frame(
            res.disparity, b_img, m_img, geom, fcfg,
            min_disp=float(cfg.min_disp), valid_rect=res.valid,
        )
        n = int(fr.valid.sum())
        assert n > 5000, f"too few flow points: {n}"

        pts = fr.points[fr.valid]
        plane = np.asarray(res.plane, np.float64)
        err = scene.elevation_error(pts, plane)
        err = err[np.isfinite(err)]
        # Trim the worst 0.1% like verify_meshes.m:26-30; the flow path is
        # a secondary reconstruction — hold it to a looser 0.05 bound
        # (stereo path: 0.02).
        err = np.sort(err)[: int(len(err) * 0.999)]
        assert err.mean() < 0.05, f"flow elevation error {err.mean():.4f}"

    def test_flow_render(self, tmp_path, scene):
        from wass_tpu.utils.render import render_flow

        flow = np.zeros((32, 48, 2), np.float32)
        flow[..., 0] = 3.0
        render_flow(tmp_path / "flow.png", flow)
        assert (tmp_path / "flow.png").exists()
