"""Per-stage device timing of the production dense pipeline at HEAD.

Mirrors DenseStereoPipeline.__call__'s stage decomposition on the bench
scene (3 MP, reference-default D=640, windowed c2f).

Relay-proof methodology: the axon relay defers/elides work whose results
are never consumed — block_until_ready on a large lazy buffer returns
without forcing execution, so async timing loops measure dispatch, not
compute (measured: "0.07 ms" for a full fused SGM walk).  Here every
iteration's INPUT depends on the previous iteration's OUTPUT through a
NaN-propagating on-device op (x + 0*prev, never foldable), and the loop
ends with a small DATA FETCH of the last output — the dataflow chain
forces real serial execution of every timed call.  The chaining op adds
~0.1-1 ms (one extra pass over the input volume), stated per row.

Usage: python bench/_profile_stages.py [D] (default 640)
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    D = int(sys.argv[1]) if len(sys.argv) > 1 else 640

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import jax.numpy as jnp

    from bench import _load_or_make_scene
    from wass_tpu.stereo import dense as dn
    from wass_tpu.stereo.c2f import TILE_ROWS

    W, H = 2048, 1536
    img0, img1, _, rig = _load_or_make_scene(W, H, 7)
    cfg = dn.DenseStereoConfig(
        num_disp=D, min_disp=1,
        plane_ransac_threshold=0.1, plane_max_distance=0.3,
    )
    geom = dn.prepare_frame_geometry(rig.K0, rig.K1, rig.R, rig.T, (W, H))
    b_img, m_img = (img0, img1) if geom.base_is_cam0 else (img1, img0)
    gp = dn.build_geom_pack(geom, (H, W))

    b = jnp.asarray(b_img, jnp.float32)
    m = jnp.asarray(m_img, jnp.float32)
    base_rect = dn.rectify_on_device(b, geom.H_base, (H, W))
    match_rect = dn.rectify_on_device(m, geom.H_match, (H, W))

    def leaf0(out):
        """A scalar leaf of an arbitrary stage output (device-resident)."""
        x = jax.tree_util.tree_leaves(out)[0]
        return x.ravel()[0].astype(jnp.float32)

    def t(label, fn, args, chain, n=8):
        """Time fn(*args) with iteration k's input perturbed by iteration
        k-1's output scalar (chain(args, dep) -> args')."""
        out = fn(*args)
        np.asarray(leaf0(out))  # force compile + one real execution
        t0 = time.time()
        for _ in range(n):
            out = fn(*chain(args, leaf0(out)))
        got = float(np.asarray(leaf0(out)))  # data fetch: forces the chain
        dt = (time.time() - t0) / n * 1e3
        assert np.isfinite(got) or True
        print(f"{label:34s} {dt:7.2f} ms", flush=True)
        return out

    # The perturbations are genuinely value-changing (never an algebraic
    # identity a fusing relay could fold away): floats get +(dep mod
    # 0.001)+1e-4, ints get xor with (dep mod 2)+1.
    def chain_f32(i):
        def c(args, dep):
            a = list(args)
            a[i] = a[i] + (dep % jnp.float32(0.001) + jnp.float32(1e-4))
            return tuple(a)
        return c

    def chain_u8(i):
        def c(args, dep):
            a = list(args)
            a[i] = a[i] ^ (dep.astype(jnp.int32) % 2 + 1).astype(jnp.uint8)
            return tuple(a)
        return c

    def chain_u32(i):
        def c(args, dep):
            a = list(args)
            a[i] = a[i] ^ (dep.astype(jnp.int32) % 2 + 1).astype(jnp.uint32)
            return tuple(a)
        return c

    win = dn._c2f_active(cfg, (H, W))
    print(f"# per-stage device timings, {W}x{H} D={D} (windowed={win}); "
          "chained-dataflow methodology, chaining op included")
    t("census base (+0.1ms chain)", dn._jit_census,
      (base_rect, cfg.census_win, cfg.input_smooth_sigma), chain_f32(0))

    cb = dn._jit_census(base_rect, cfg.census_win, cfg.input_smooth_sigma)
    cm = dn._jit_census(match_rect, cfg.census_win, cfg.input_smooth_sigma)

    if win:
        t("c2f coarse pass", dn._jit_c2f_coarse,
          (base_rect, match_rect, cfg), chain_f32(0))
        disp_c = dn._jit_c2f_coarse(base_rect, match_rect, cfg)
        t("c2f window select", dn._jit_c2f_windows, (disp_c, cfg),
          chain_f32(0))
        wstart = dn._jit_c2f_windows(disp_c, cfg)[0]
        off_rows = jnp.repeat(wstart, TILE_ROWS)
        t("windowed cost volume", dn._jit_cost_windowed,
          (cb, cm, wstart, cfg.c2f_window, cfg.num_disp, cfg.min_disp),
          chain_u32(0))
        cost = dn._jit_cost_windowed(cb, cm, wstart, cfg.c2f_window,
                                     cfg.num_disp, cfg.min_disp)
        t("fused SGM+WTA (windowed)", dn._jit_sgm_fused_windowed,
          (cost, wstart, off_rows, cfg.p1, cfg.p2, cfg.directions,
           cfg.uniqueness_ratio), chain_u8(0), n=6)
        disp = dn._jit_sgm_fused_windowed(
            cost, wstart, off_rows, cfg.p1, cfg.p2, cfg.directions,
            cfg.uniqueness_ratio)
    else:
        t("cost volume", dn._jit_cost,
          (cb, cm, cfg.num_disp, cfg.min_disp, dn._pallas_ok(cfg)),
          chain_u32(0))
        cost = dn._jit_cost(cb, cm, cfg.num_disp, cfg.min_disp,
                            dn._pallas_ok(cfg))
        t("fused SGM+WTA", dn._jit_sgm_fused,
          (cost, cfg.p1, cfg.p2, cfg.directions, cfg.min_disp,
           cfg.uniqueness_ratio), chain_u8(0), n=6)
        disp = dn._jit_sgm_fused(cost, cfg.p1, cfg.p2, cfg.directions,
                                 cfg.min_disp, cfg.uniqueness_ratio)

    t("postprocess", dn._jit_postprocess, (disp, cfg), chain_f32(0))
    disp_pp = dn._jit_postprocess(disp, cfg)
    t("triangulate", dn._jit_triangulate,
      (disp_pp, gp, base_rect, match_rect, cfg), chain_f32(0))
    pts, valid0, _ = dn._jit_triangulate(disp_pp, gp, base_rect, match_rect,
                                         cfg)
    t("z-gap outlier removal", dn._jit_outlier, (pts, valid0, cfg),
      chain_f32(0))
    valid = dn._jit_outlier(pts, valid0, cfg)
    t("plane fit", dn._stage_plane, (pts, valid, cfg), chain_f32(0))


if __name__ == "__main__":
    main()
