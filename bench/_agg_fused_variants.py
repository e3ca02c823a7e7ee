"""A/B the fused SGM+WTA schemes on the real TPU at production shapes.

Old (r03): transpose -> pair -> XLA transpose+add int16 h-sum -> partial
-> final-walk WTA.  New (r05, _USE_H2): image-layout pair emits the two
uint8 horizontal volumes directly; the row-walk kernels fold them
in-register — no XLA transposes, no int16 h-sum HBM round-trip.

Usage: python bench/_agg_fused_variants.py [windowed|full|both]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import jax.numpy as jnp

    import wass_tpu.stereo.sgm_pallas as sp

    H, W = 1536, 2048
    rng = np.random.default_rng(0)

    def timeit(fn, *args, n=10):
        out = jax.block_until_ready(fn(*args))
        t0 = time.time()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.time() - t0) / n, out

    if which in ("windowed", "both"):
        Dw = 128
        cost = jnp.asarray(rng.integers(0, 64, (H, W, Dw), dtype=np.uint8))
        wstart = jnp.asarray(
            np.clip(np.arange(H // 8) * 2, 0, 512 - Dw), jnp.int32
        )
        for flag in (False, True):
            sp._USE_H2 = flag
            f = jax.jit(lambda c, w: sp.sgm_wta_fused_pallas_windowed(
                c, w, 8, 96, 8, 1))
            dt, out = timeit(f, cost, wstart)
            print(f"windowed fused 8dir {H}x{W}xDw{Dw} h2={flag}: "
                  f"{dt*1e3:.2f} ms")
            if flag:
                np.testing.assert_array_equal(np.asarray(out), ref)
                print("  bit-exact vs old: OK")
            else:
                ref = np.asarray(out)
        for flag in (False, True):
            sp._USE_H2 = flag
            f = jax.jit(lambda c, w: sp.sgm_aggregate_pallas_windowed(
                c, w, 8, 96, 8))
            dt, out = timeit(f, cost, wstart)
            print(f"windowed aggregate 8dir h2={flag}: {dt*1e3:.2f} ms")
            if flag:
                np.testing.assert_array_equal(np.asarray(out), ref)
                print("  bit-exact vs old: OK")
            else:
                ref = np.asarray(out)

    if which in ("full", "both"):
        D = 256
        cost = jnp.asarray(rng.integers(0, 64, (H, W, D), dtype=np.uint8))
        for flag in (False, True):
            sp._USE_H2 = flag
            f = jax.jit(lambda c: sp.sgm_wta_fused_pallas(c, 8, 96, 8, 1, 1))
            dt, out = timeit(f, cost)
            print(f"full-range fused 8dir {H}x{W}xD{D} h2={flag}: "
                  f"{dt*1e3:.2f} ms")
            if flag:
                np.testing.assert_array_equal(np.asarray(out), ref)
                print("  bit-exact vs old: OK")
            else:
                ref = np.asarray(out)


if __name__ == "__main__":
    main()
