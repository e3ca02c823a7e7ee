#!/usr/bin/env python
"""Frame-sharded scaling check on a virtual device mesh.

BASELINE.json's scaling target (>= 80% efficiency at 2+ hosts) needs a
multi-chip pod slice; this environment exposes one physical TPU, so this
harness demonstrates the *sharded program* scales by running the
frame-parallel dense pipeline on an N-device virtual CPU mesh and
reporting per-frame throughput at mesh sizes 1, 2, 4, 8.  Frames are
embarrassingly parallel (no cross-frame collectives except the final mean
plane), so efficiency on real ICI hardware tracks these structural
numbers minus collective overheads of O(bytes of one plane).

Prints one JSON line per mesh size.
"""

import json
import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import jax.numpy as jnp


def main():
    from wass_tpu.testing import make_scene
    from wass_tpu.stereo.dense import (
        DenseStereoConfig, prepare_frame_geometry, rectify_on_device, build_geom_pack,
    )
    from wass_tpu.parallel.mesh import make_frame_mesh
    from wass_tpu.parallel.runner import ShardedDenseRunner

    W, H, D = 192, 128, 32
    sc = make_scene(seed=2, width=W, height=H, wave_amplitude=0.25)
    rig = sc.rig
    cfg = DenseStereoConfig(
        num_disp=D, min_disp=1, plane_ransac_rounds=128,
        plane_ransac_threshold=0.1, plane_max_distance=0.3,
    )
    geom = prepare_frame_geometry(rig.K0, rig.K1, rig.R, rig.T, (W, H))
    b_img, m_img = (sc.img0, sc.img1) if geom.base_is_cam0 else (sc.img1, sc.img0)
    gp = build_geom_pack(geom, (H, W))

    base_t = None
    for n_dev in (1, 2, 4, 8):
        mesh = make_frame_mesh(n_dev)
        runner = ShardedDenseRunner(mesh, cfg)
        F = n_dev * 2  # two frames per device
        stack = lambda x: np.broadcast_to(x, (F,) + x.shape).copy()
        args = (
            stack(b_img.astype(np.float32)),
            stack(m_img.astype(np.float32)),
            [gp] * F,
        )
        res, mp = runner.run_batch(*args)
        jax.block_until_ready(mp)
        t0 = time.time()
        for _ in range(3):
            res, mp = runner.run_batch(*args)
            jax.block_until_ready(mp)
        per_frame = (time.time() - t0) / 3 / F
        fps = 1.0 / per_frame
        if base_t is None:
            base_t = per_frame
        eff = base_t / per_frame / 1.0
        print(json.dumps({
            "metric": f"virtual_mesh_frames_per_s_{n_dev}dev",
            "value": round(fps, 2),
            "unit": "frames/s",
            "vs_baseline": round(eff, 3),
        }))


if __name__ == "__main__":
    main()
