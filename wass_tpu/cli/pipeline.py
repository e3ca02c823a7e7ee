"""Sequence-level pipeline orchestration (the wasscli equivalent).

Replaces the reference's interactive driver
(/root/reference/cli/wasscli/wasscli.py): prepare every frame pair, match
a random subset of frames (:259, <= 50), run the sequence-wide
autocalibration reduction, then dense stereo on every frame, aggregating
per-frame planes into output/planes.txt (:320-343).

The reference parallelizes with 4 worker processes over a shared
filesystem; here each stage is already a batched device program, frames
stream through one process (and shard across devices/hosts via
wass_tpu.parallel when available).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

from wass_tpu.io.workdir import Workdir, frame_workdirs
from wass_tpu.prepare.prepare import PrepareConfig, prepare_frame
from wass_tpu.match.pipeline import MatchConfig, match_frame
from wass_tpu.calib.autocalibrate import AutocalConfig, autocalibrate_sequence
from wass_tpu.stereo.dense import (
    DenseStereoConfig,
    DenseStereoPipeline,
    build_geom_pack,
    prepare_frame_geometry,
    rectify_on_device,
)
from wass_tpu.core.geometry import rt_from_plane


@dataclasses.dataclass
class SequenceConfig:
    prepare: PrepareConfig = dataclasses.field(default_factory=PrepareConfig)
    match: MatchConfig = dataclasses.field(default_factory=MatchConfig)
    autocal: AutocalConfig = dataclasses.field(default_factory=AutocalConfig)
    stereo: DenseStereoConfig = dataclasses.field(default_factory=DenseStereoConfig)
    match_subset: int = 50  # wasscli.py:259
    seed: int = 0
    # Optical-flow reconstruction path (reference: WASS_ENABLE_OPTFLOW
    # compile-time option, off by default).  Set to a FlowConfig to enable.
    flow: Optional[object] = None


class SequencePipeline:
    def __init__(self, outdir, cfg: Optional[SequenceConfig] = None):
        self.outdir = Path(outdir)
        self.cfg = cfg or SequenceConfig()
        self.outdir.mkdir(parents=True, exist_ok=True)

    # -- stage 1: prepare --------------------------------------------------
    def prepare(self, frames, K0, d0, K1, d1, ext_R=None, ext_T=None) -> List[Workdir]:
        """frames: iterable of (img0, img1) raw grayscale arrays."""
        wds = []
        for i, (img0, img1) in enumerate(frames):
            wd_path = self.outdir / f"{i:06d}_wd"
            wd = prepare_frame(wd_path, img0, img1, K0, d0, K1, d1, self.cfg.prepare, ext_R, ext_T)
            wds.append(wd)
        return wds

    def workdirs(self) -> List[Workdir]:
        return frame_workdirs(self.outdir)

    # -- stage 2: match ----------------------------------------------------
    def match(self, wds: Optional[Sequence[Workdir]] = None) -> int:
        wds = list(wds if wds is not None else self.workdirs())
        rng = np.random.default_rng(self.cfg.seed)
        if len(wds) > self.cfg.match_subset:
            sel = rng.choice(len(wds), self.cfg.match_subset, replace=False)
            wds = [wds[i] for i in sorted(sel)]
        n_ok = 0
        for wd in wds:
            img0 = wd.load_undistorted(0)
            img1 = wd.load_undistorted(1)
            K0 = wd.load_intrinsics(0)
            K1 = wd.load_intrinsics(1)
            res = match_frame(img0, img1, K0, K1, self.cfg.match)
            if res is None:
                continue
            wd.save_extrinsics(res.R, res.T)
            wd.save_matches("matches.txt", res.uv0_pose, res.uv1_pose)
            wd.save_matches("matches_epionly.txt", res.uv0_epi, res.uv1_epi)
            wd.save_matches("matches_unfiltered.txt", res.uv0_all, res.uv1_all)
            wd.save_matcher_stats(res.n_matches, res.epi_avg, res.epi_std, res.epi_min, res.epi_max)
            try:
                from wass_tpu.utils.render import render_matches

                render_matches(wd.path / "matches.jpg", img0, img1, res.uv0_pose, res.uv1_pose)
                render_matches(wd.path / "matches_epifilter.jpg", img0, img1, res.uv0_epi, res.uv1_epi)
            except Exception:
                pass  # debug imagery must never fail the stage
            n_ok += 1
        return n_ok

    # -- stage 3: autocalibrate -------------------------------------------
    def autocalibrate(self):
        return autocalibrate_sequence(self.workdirs(), self.cfg.autocal)

    # -- stage 4: dense stereo --------------------------------------------
    def stereo(self, wds: Optional[Sequence[Workdir]] = None) -> List[np.ndarray]:
        import jax
        import jax.numpy as jnp

        wds = list(wds if wds is not None else self.workdirs())
        pipe = DenseStereoPipeline(self.cfg.stereo)
        planes = []
        for wd in wds:
            img0 = wd.load_undistorted(0)
            img1 = wd.load_undistorted(1)
            K0 = wd.load_intrinsics(0)
            K1 = wd.load_intrinsics(1)
            R, T = wd.load_extrinsics()
            H, W = img0.shape
            geom = prepare_frame_geometry(K0, K1, R, T, (W, H), cam_distance=self.cfg.stereo.cam_distance)
            b_img, m_img = (img0, img1) if geom.base_is_cam0 else (img1, img0)
            b = jnp.asarray(b_img, jnp.float32)
            m = jnp.asarray(m_img, jnp.float32)
            base_rect = rectify_on_device(b, geom.H_base, (H, W))
            match_rect = rectify_on_device(m, geom.H_match, (H, W))
            res = pipe(base_rect, match_rect, b, m, build_geom_pack(geom, (H, W)))

            # MIN_TRIANGULATED_POINTS gate (wass_stereo.cpp:1993-1997): the
            # reference aborts the process; we mark the frame failed (nan
            # plane, empty mesh) and keep the sequence going.
            if int(res.n_points) < self.cfg.stereo.min_triangulated:
                wd.save_plane(None)
                wd.save_mesh(np.zeros((0, 3)), np.eye(3), np.zeros(3))
                planes.append(np.full(4, np.nan))
                continue

            plane = np.array(res.plane, np.float64)
            wd.save_plane(plane if bool(res.plane_ok) else None)
            planes.append(plane)

            # Export the compressed mesh in the sea-plane frame (the writer
            # contract of PovMesh::save_as_xyz_compressed).
            valid = np.array(res.valid)
            pts = np.array(res.points, np.float64)[valid]
            if np.all(np.isfinite(plane)):
                Rp, Tp, Rinv, Tinv = (np.array(a, np.float64) for a in rt_from_plane(jnp.asarray(plane)))
                pts_plane = pts @ Rp.T + Tp
            else:
                Rinv = np.eye(3)
                Tinv = np.zeros(3)
                pts_plane = pts
            wd.save_mesh(pts_plane, Rinv, Tinv)

            # Projection matrices / camera poses in the cam0 frame, using
            # the same baseline-normalized T as the reconstruction.
            P0 = K0 @ np.hstack([np.eye(3), np.zeros((3, 1))])
            P1 = K1 @ np.hstack([geom.R, geom.T.reshape(3, 1)])
            wd.save_projection_matrices(P0, P1)
            wd.save_camera_poses(np.eye(3), np.zeros(3), geom.R, geom.T)

            # Optional optical-flow reconstruction (refine_flow,
            # wass_stereo.cpp:1985-1990): a second, flow-based point cloud
            # saved next to the stereo mesh, plus the flow debug renders.
            if self.cfg.flow is not None:
                from wass_tpu.stereo.flow import flow_reconstruct_frame
                from wass_tpu.io.ply import save_ply_points
                from wass_tpu.utils.render import render_flow

                fr = flow_reconstruct_frame(
                    res.disparity, b_img, m_img, geom, self.cfg.flow,
                    min_disp=float(self.cfg.stereo.min_disp),
                    valid_rect=res.valid,
                )
                render_flow(wd.path / "flow_coarse.png", fr.coarse_flow, 200.0)
                render_flow(wd.path / "flow.png", fr.flow, 200.0)
                fpts = fr.points[fr.valid]
                fcol = np.repeat(
                    np.asarray(b_img)[fr.valid][:, None], 3, axis=1
                ).astype(np.uint8)
                save_ply_points(wd.path / "mesh_full_flow.ply", fpts, fcol)

        # Aggregate planes (wasscli.py:320-343).
        out = self.outdir / "output"
        out.mkdir(exist_ok=True)
        with open(out / "planes.txt", "w") as f:
            for p in planes:
                if np.all(np.isfinite(p)):
                    f.write(" ".join(f"{v:.18g}" for v in p) + "\n")
        with open(self.outdir / "workspaces.txt", "w") as f:
            for wd in wds:
                f.write(str(wd.path) + "\n")
        return planes
