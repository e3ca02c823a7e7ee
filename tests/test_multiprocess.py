"""True multi-PROCESS tests: two jax.distributed CPU processes (gloo
collectives, 4 virtual devices each) drive the frame-sharded runner, the
full sharded pipeline stage, and the distributed Schur BA end-to-end.

The single-process virtual-mesh tests (test_parallel.py) validate the
SPMD math; these validate the cross-process mechanics the reference's
multi-machine scaling model implies (getting_started.html.md:40-47):
process-local feeding via jax.make_array_from_process_local_data,
per-host workdir sharding, allgathered plane bookkeeping, and psum
reductions that actually cross a process boundary.
"""

import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

_WORKER = textwrap.dedent(
    """
    import sys
    from pathlib import Path

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    pid = int(sys.argv[1])
    port = sys.argv[2]
    shared = sys.argv[3]
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
    )
    assert jax.device_count() == 8 and jax.local_device_count() == 4

    import numpy as np
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P

    from wass_tpu.parallel.mesh import make_frame_mesh
    from wass_tpu.parallel.runner import ShardedDenseRunner, local_frame_indices
    from wass_tpu.parallel.distba import lm_refine_two_view_sharded
    from wass_tpu.calib.ba import lm_refine_two_view
    from wass_tpu.stereo.dense import (
        DenseStereoConfig, build_geom_pack, dense_stereo_device,
        prepare_frame_geometry,
    )
    from wass_tpu.ops.sampling import warp_homography
    from wass_tpu.testing import make_scene

    # ---- 1. frame-sharded runner with process-local feeding --------------
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

    mesh = make_frame_mesh(F)
    slots = local_frame_indices(mesh)
    assert len(slots) == 4, slots
    n_local = len(slots)
    stack = lambda x: np.broadcast_to(np.asarray(x, np.float32), (n_local, h, w)).copy()

    runner = ShardedDenseRunner(mesh, cfg)
    res, rects, info, mean_plane = runner.run_batch(
        stack(b_img), stack(m_img), [gp] * n_local
    )
    planes = np.asarray(multihost_utils.process_allgather(res.plane, tiled=True))
    assert planes.shape == (F, 4)

    # Reference: the unsharded single-frame pipeline, run locally.
    b1 = jnp.asarray(np.asarray(b_img), jnp.float32)
    m1 = jnp.asarray(np.asarray(m_img), jnp.float32)
    br = warp_homography(b1, gp["H_base"], (h, w))
    mr = warp_homography(m1, gp["H_match"], (h, w))
    one = dense_stereo_device(br, mr, b1, m1, gp, cfg)
    for k in range(F):
        np.testing.assert_allclose(planes[k], np.asarray(one.plane), atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(mean_plane), np.asarray(one.plane), atol=5e-4
    )
    print(f"[{pid}] runner ok", flush=True)

    # ---- 2. full sharded pipeline stage over a shared workdir tree -------
    from wass_tpu.cli.pipeline import SequenceConfig, SequencePipeline

    scfg = SequenceConfig(stereo=cfg, debug_renders=False)
    pipe = SequencePipeline(shared, scfg)
    if pid == 0:
        scenes = [
            make_scene(seed=300 + i, width=w, height=h, wave_amplitude=0.25,
                       rig=rig, time=i * 0.25)
            for i in range(F)
        ]
        pipe.prepare(
            [(s.img0, s.img1) for s in scenes],
            rig.K0, np.zeros(5), rig.K1, np.zeros(5),
            ext_R=rig.R, ext_T=rig.T,
        )
    multihost_utils.sync_global_devices("prepared")
    wds = pipe.workdirs()
    assert len(wds) == F
    planes = pipe.stereo(wds)
    assert len(planes) == F
    assert all(p is not None and np.all(np.isfinite(p)) for p in planes)
    multihost_utils.sync_global_devices("stereo-done")
    # Every frame's mesh exists on the shared FS (each host wrote its own).
    for wd in wds:
        assert (wd.path / "mesh_cam.xyzC").exists(), wd.path
    assert (Path(shared) / "output" / "planes.txt").read_text().count("\\n") == F
    print(f"[{pid}] pipeline ok", flush=True)

    # ---- 3. distributed Schur BA across the process boundary -------------
    import cv2

    rng = np.random.default_rng(42)
    R, _ = cv2.Rodrigues(np.array([0.02, -0.25, 0.015]))
    T = np.array([-1.0, 0.02, 0.06]); T /= np.linalg.norm(T)
    n = 512
    pts = np.stack([rng.uniform(-4, 4, n), rng.uniform(-4, 4, n), rng.uniform(8, 25, n)], 1)
    p0 = pts[:, :2] / pts[:, 2:] + rng.standard_normal((n, 2)) * 2e-4
    x1 = pts @ R.T + T
    p1 = x1[:, :2] / x1[:, 2:] + rng.standard_normal((n, 2)) * 2e-4
    Rp, _ = cv2.Rodrigues(cv2.Rodrigues(R)[0].ravel() + np.array([2e-3, -1.5e-3, 1e-3]))
    Tp = T + np.array([3e-3, -2e-3, 1e-3])
    Xp = (pts + rng.standard_normal(pts.shape) * 0.05).astype(np.float32)
    mask = np.ones(n, bool); mask[500:] = False

    fsh = NamedSharding(mesh, P("frame"))
    shard_rows = n // F
    lo = slots[0] * shard_rows
    hi = (slots[-1] + 1) * shard_rows

    def put(x):
        return jax.make_array_from_process_local_data(
            fsh, np.ascontiguousarray(x[lo:hi]), (n,) + x.shape[1:]
        )

    args = (
        jnp.asarray(Rp, jnp.float32), jnp.asarray(Tp, jnp.float32),
        put(Xp), put(p0.astype(np.float32)), put(p1.astype(np.float32)), put(mask),
    )
    shard = lm_refine_two_view_sharded(mesh, *args, max_iters=40)
    single = lm_refine_two_view(
        jnp.asarray(Rp, jnp.float32), jnp.asarray(Tp, jnp.float32),
        jnp.asarray(Xp, jnp.float32), jnp.asarray(p0, jnp.float32),
        jnp.asarray(p1, jnp.float32), jnp.asarray(mask), max_iters=40,
    )
    np.testing.assert_allclose(np.asarray(shard.R), np.asarray(single.R), atol=5e-5)
    np.testing.assert_allclose(np.asarray(shard.T), np.asarray(single.T), atol=5e-5)
    print(f"[{pid}] distba ok", flush=True)
    print(f"[{pid}] ALL-OK", flush=True)
    """
)


@pytest.mark.slow
def test_two_process_runner_pipeline_distba(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    shared = tmp_path / "seq"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = str(Path(__file__).resolve().parents[1])
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(port), str(shared)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-4000:]}"
        assert f"[{i}] ALL-OK" in out, out[-4000:]
