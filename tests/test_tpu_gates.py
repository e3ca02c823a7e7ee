"""Strict-gate tier on the REAL TPU: the reference's actual quality gates
at bench scale, as in-repo tests rather than hand-run bench artifacts.

Gates (the verify harness of the reference):
* dense elevation: trimmed-mean plane-aligned error < 0.02 baseline
  units (/root/reference/test/verify_meshes.m:26-30);
* matcher: >= 400 matches and <= 0.5 px mean epipolar error at full
  resolution (/root/reference/test/verify_matcher.m:5-8,18-25);
* pose: |dR| <= 5e-3, |dT| <= 2e-2 against ground truth
  (verify_matcher.m:7-8).

Run: WASS_TPU_TESTS=1 python -m pytest tests -m tpu -q
(skipped entirely on the CPU tier — see conftest.py).  Scene renders are
disk-cached in /tmp; a cold cache adds ~3 min/scene of host ray-tracing.
"""

import sys

import numpy as np
import pytest

pytestmark = pytest.mark.tpu


def _scene(W, H, seed, time_s=0.0, rig=None):
    sys.path.insert(0, "/root/repo")
    from bench import _load_or_make_scene

    return _load_or_make_scene(W, H, seed, time_s=time_s, rig=rig)


@pytest.fixture(scope="module")
def bench_scene_3mp():
    return _scene(2048, 1536, 7)


def test_dense_gate_3mp(bench_scene_3mp):
    """One 3 MP frame, GT extrinsics, reference-default D=640: elevation
    gate with margin and a sanity floor on density."""
    from wass_tpu.stereo.dense import DenseStereoConfig, dense_stereo_frame

    img0, img1, points0, rig = bench_scene_3mp
    W, H = 2048, 1536
    cfg = DenseStereoConfig(
        num_disp=640, min_disp=1,
        plane_ransac_threshold=0.1, plane_max_distance=0.3,
    )
    out, _ = dense_stereo_frame(
        img0.astype(np.float32), img1.astype(np.float32),
        rig.K0, rig.K1, rig.R, rig.T, cfg,
    )
    valid = np.asarray(out.valid)
    pts = np.asarray(out.points)[valid]
    plane = np.asarray(out.plane, np.float64)
    assert np.all(np.isfinite(plane)) and bool(out.plane_ok)
    assert len(pts) > 0.3 * W * H, f"density collapsed: {len(pts)}"

    uv = pts @ np.asarray(rig.K0).T
    uv = uv[:, :2] / uv[:, 2:3]
    xi = np.clip(uv[:, 0].astype(int), 0, W - 1)
    yi = np.clip(uv[:, 1].astype(int), 0, H - 1)
    gt = points0[yi, xi] / rig.baseline
    err = np.abs((pts @ plane[:3]) - (gt @ plane[:3]))
    ae = np.sort(err[np.isfinite(err)])
    trimmed = float(ae[: int(len(ae) * 0.999)].mean())
    assert trimmed < 0.02, f"elevation {trimmed:.4f} over the gate"


def test_matcher_gates_fullres(bench_scene_3mp):
    """Full-resolution matcher gates: >= 400 matches, <= 0.5 px f64 epi
    error, single-pair pose inside the calibration gates."""
    from wass_tpu.match.pipeline import MatchConfig, match_frame

    img0, img1, _, rig = bench_scene_3mp
    res = match_frame(
        img0.astype(np.float64), img1.astype(np.float64),
        rig.K0, rig.K1, MatchConfig(),
    )
    assert res is not None
    assert res.n_matches >= 400, f"matches {res.n_matches} < 400"
    assert res.epi_avg <= 0.5, f"epi {res.epi_avg:.3f} px > 0.5"
    Tg = rig.T / np.linalg.norm(rig.T)
    assert float(np.abs(res.R - rig.R).max()) <= 5e-3
    assert float(np.abs(res.T.ravel() - Tg).max()) <= 2e-2


@pytest.mark.slow
def test_calibrated_loop_gates():
    """The no-ground-truth loop at 3 MP-class scale: match 8 frames ->
    pooled autocalibration -> dense stereo with the RECOVERED extrinsics;
    pose and elevation gates asserted end-to-end."""
    import shutil
    from pathlib import Path

    from wass_tpu.cli.pipeline import SequenceConfig, SequencePipeline
    from wass_tpu.io.xyzc import load_camera_mesh
    from wass_tpu.match.pipeline import MatchConfig
    from wass_tpu.stereo.dense import DenseStereoConfig
    from wass_tpu.testing import make_rig

    W, H, n_frames = 1536, 1152, 8
    rig = make_rig(width=W, height=H)
    frames, gts = [], []
    for i in range(n_frames):
        img0, img1, points0, rig = _scene(W, H, 900 + i, time_s=i * 0.2, rig=rig)
        frames.append((img0, img1))
        gts.append(points0)

    root = Path("/tmp/wass_tpu_gate_loop")
    shutil.rmtree(root, ignore_errors=True)
    cfg = SequenceConfig(
        match=MatchConfig(),
        stereo=DenseStereoConfig(num_disp=640, min_disp=1,
                                 plane_ransac_threshold=0.1,
                                 plane_max_distance=0.3),
        debug_renders=False,
    )
    pipe = SequencePipeline(root, cfg)
    pipe.prepare(frames, rig.K0, np.zeros(5), rig.K1, np.zeros(5))
    assert pipe.match() >= 6
    res = pipe.autocalibrate()
    assert res is not None
    Tg = rig.T / np.linalg.norm(rig.T)
    assert float(np.abs(res.R - rig.R).max()) <= 5e-3
    assert float(np.abs(res.T.ravel() - Tg).max()) <= 2e-2

    wds = pipe.workdirs()[:2]
    pipe.stereo(wds)
    for i, wd in enumerate(wds):
        mesh_cam = load_camera_mesh(wd.path / "mesh_cam.xyzC")
        plane = wd.load_plane()
        uv = (rig.K0 @ mesh_cam).T
        uv = uv[:, :2] / uv[:, 2:3]
        xi = np.clip(np.round(uv[:, 0]).astype(int), 0, W - 1)
        yi = np.clip(np.round(uv[:, 1]).astype(int), 0, H - 1)
        gt = gts[i][yi, xi] / rig.baseline
        err = np.abs(mesh_cam.T @ plane[:3] - gt @ plane[:3])
        ae = np.sort(err[np.isfinite(err)])
        trimmed = float(ae[: int(len(ae) * 0.999)].mean())
        assert trimmed < 0.02, f"frame {i}: calibrated elevation {trimmed:.4f}"
