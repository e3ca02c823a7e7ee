#!/usr/bin/env python
"""Benchmark: dense stereo frames/s/chip vs the reference's ~30 s/frame.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The headline config mirrors the reference design point (3 MPixel stereo
pair, SURVEY.md §6 / BASELINE.md): a synthetic 2048x1536 wave-field pair,
256 disparities, full dense pipeline (SGM aggregation over 8 paths,
disparity filtering, per-pixel triangulation, z-gap outlier removal,
RANSAC + refined sea-plane fit).  Baseline: the reference reconstructs a
3 MP pair in ~30 s single-threaded
(/root/reference/doc/src/render/index.html.md:70) => 0.0333 frames/s.

Run on the TPU (default session backend).  Set WASS_BENCH_SMALL=1 for a
reduced-size smoke run.
"""

import json
import os
import sys
import time

import numpy as np
from pathlib import Path


def main():
    small = os.environ.get("WASS_BENCH_SMALL", "0") == "1"
    if small:
        W, H, D = 512, 384, 64
    else:
        W, H, D = 2048, 1536, 256

    import jax

    # Persistent compilation cache: the 3 MP program takes several minutes
    # through the remote TPU compiler; cache the executable so repeated
    # bench runs (including the driver's) skip compilation.
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import jax.numpy as jnp

    from wass_tpu.stereo.dense import (
        DenseStereoConfig,
        DenseStereoPipeline,
        build_geom_pack,
        prepare_frame_geometry,
        rectify_on_device,
    )
    from wass_tpu.testing import make_scene

    t_setup = time.time()
    # The ray-traced synthetic scene is expensive at 3 MP (~3 min of host
    # numpy); cache the rendered frames + ground truth on disk.
    cache = Path(f"/tmp/wass_bench_scene_{W}x{H}_7.npz")
    if cache.exists():
        z = np.load(cache)
        sc_img0, sc_img1 = z["img0"], z["img1"]
        sc_points0 = z["points0"]
        rig_data = {k: z[k] for k in ("K0", "K1", "R0", "T0", "R1", "T1")}
        from wass_tpu.testing.synthetic import SyntheticRig

        rig = SyntheticRig(width=W, height=H, **rig_data)
        sc = None
    else:
        sc = make_scene(seed=7, width=W, height=H, wave_amplitude=0.25)
        rig = sc.rig
        sc_img0, sc_img1, sc_points0 = sc.img0, sc.img1, sc.points0
        np.savez_compressed(
            cache, img0=sc.img0, img1=sc.img1, points0=sc.points0,
            K0=rig.K0, K1=rig.K1, R0=rig.R0, T0=rig.T0, R1=rig.R1, T1=rig.T1,
        )
    cfg = DenseStereoConfig(
        num_disp=D,
        min_disp=1,
        plane_ransac_threshold=0.1,
        plane_max_distance=0.3,
    )
    geom = prepare_frame_geometry(rig.K0, rig.K1, rig.R, rig.T, (W, H))

    b_img, m_img = (sc_img0, sc_img1) if geom.base_is_cam0 else (sc_img1, sc_img0)
    b = jnp.asarray(b_img, jnp.float32)
    m = jnp.asarray(m_img, jnp.float32)
    geom_pack = build_geom_pack(geom, (H, W))

    pipe = DenseStereoPipeline(cfg)

    def frame(b, m):
        # rectify_on_device takes the host (static) homography: on TPU this
        # engages the gather-free two-pass warp, jit-cached per geometry.
        base_rect = rectify_on_device(b, geom.H_base, (H, W))
        match_rect = rectify_on_device(m, geom.H_match, (H, W))
        return pipe(base_rect, match_rect, b, m, geom_pack)

    print(f"# setup {time.time()-t_setup:.1f}s; compiling {W}x{H} D={D} "
          f"on {jax.devices()[0].platform}...", file=sys.stderr)
    t_c = time.time()
    res = jax.block_until_ready(frame(b, m))
    print(f"# compile+first-run {time.time()-t_c:.1f}s; "
          f"n_points={int(res.n_points)} plane_ok={bool(res.plane_ok)}",
          file=sys.stderr)

    # Quality gates (verify_meshes.m / BASELINE.md): plane-aligned elevation
    # error of the reconstructed cloud vs ground truth.
    try:
        valid = np.array(res.valid)
        pts = np.array(res.points)[valid]
        plane = np.array(res.plane, np.float64)
        uv = pts @ np.asarray(rig.K0).T
        uv = uv[:, :2] / uv[:, 2:3]
        xi = np.clip(uv[:, 0].astype(int), 0, W - 1)
        yi = np.clip(uv[:, 1].astype(int), 0, H - 1)
        gt = sc_points0[yi, xi] / rig.baseline
        err = np.abs((pts @ plane[:3]) - (gt @ plane[:3]))
        ae = np.sort(err[np.isfinite(err)])
        trimmed = ae[: int(len(ae) * 0.999)]
        print(
            f"# quality: n_points={len(pts)} (gate >3e6 at 5 MP scale), "
            f"trimmed-mean elevation err={trimmed.mean():.4f} baseline units "
            f"(verify_meshes gate 0.02)",
            file=sys.stderr,
        )
    except Exception as e:  # quality report must never break the bench
        print(f"# quality report failed: {e}", file=sys.stderr)

    # Timed runs.  Throughput: frames dispatched back-to-back with one
    # final sync — the production streaming pattern (and the comparison the
    # reference's 30 s/frame single-threaded number represents).  A full
    # device sync through this remote-TPU relay costs ~0.5-1 s by itself,
    # so per-frame latency is reported separately.
    n_runs = 4 if small else 8
    t0 = time.time()
    last = None
    for _ in range(n_runs):
        last = frame(b, m)
    jax.block_until_ready(last)
    dt = (time.time() - t0) / n_runs
    fps = 1.0 / dt

    t0 = time.time()
    jax.block_until_ready(frame(b, m))
    latency = time.time() - t0
    print(f"# throughput {fps:.3f} frames/s; single-frame latency (incl. "
          f"relay sync) {latency:.3f}s", file=sys.stderr)

    baseline_fps = 1.0 / 30.0  # reference: ~30 s/frame at 3 MP
    out = {
        "metric": f"dense_stereo_frames_per_s_per_chip_{W}x{H}_D{D}",
        "value": round(fps, 4),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline_fps, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
