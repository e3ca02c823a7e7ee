"""Probe: butterfly lane-min (cyclic roll tree) vs jnp.min lane reduction
inside the tri-direction SGM kernel."""
import time
import functools
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 32000


def _lane_min_butterfly(x, D):
    """All-lanes min via a cyclic butterfly: log2(D) rotate+min steps;
    every lane ends holding the global lane min (broadcast included)."""
    s = 1
    while s < D:
        x = jnp.minimum(x, pltpu.roll(x, s, axis=1))
        s *= 2
    return x


def _step_bfly(prev, cost, P1, P2, D):
    minprev = _lane_min_butterfly(prev, D)
    up = jnp.concatenate([jnp.full_like(prev[:, :1], _BIG), prev[:, :-1]], axis=1)
    dn = jnp.concatenate([prev[:, 1:], jnp.full_like(prev[:, :1], _BIG)], axis=1)
    best = jnp.minimum(jnp.minimum(prev, minprev + P2), jnp.minimum(up, dn) + P1)
    return cost + best - minprev


def _roll_mask(x, shift, B):
    if shift == 0:
        return x
    x = pltpu.roll(x, shift % B, axis=0)
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    if shift > 0:
        return jnp.where(rows < shift, _BIG, x)
    return jnp.where(rows >= B + shift, _BIG, x)


def _tri_bfly(c_ref, out_ref, s_v, s_d1, s_d2, *, P1, P2, G):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        for s in (s_v, s_d1, s_d2):
            s[...] = jnp.full_like(s, 255)

    B, D = s_v.shape
    for g in range(G):
        c32 = c_ref[g].astype(jnp.int32)
        v = _step_bfly(s_v[...].astype(jnp.int32), c32, P1, P2, D)
        s_v[...] = v.astype(jnp.uint8)
        d1 = _step_bfly(_roll_mask(s_d1[...].astype(jnp.int32), 1, B), c32, P1, P2, D)
        s_d1[...] = d1.astype(jnp.uint8)
        d2 = _step_bfly(_roll_mask(s_d2[...].astype(jnp.int32), -1, B), c32, P1, P2, D)
        s_d2[...] = d2.astype(jnp.uint8)
        out_ref[g] = (v + d1 + d2).astype(jnp.int16)


def run_tri(kernel, cost, G=8, P1=8, P2=96):
    S, B, D = cost.shape
    n_blocks = S // G
    k = functools.partial(kernel, P1=P1, P2=P2, G=G)
    blk = (G, B, D)
    return pl.pallas_call(
        k,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(blk, lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec(blk, lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((S, B, D), jnp.int16),
        scratch_shapes=[pltpu.VMEM((B, D), jnp.uint8) for _ in range(3)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(cost)


def sync(x):
    np.asarray(x[0, 0, :8])


def timeit(name, fn, argsets, n=15):
    out = fn(*argsets[0])
    sync(out)
    t0 = time.time()
    for k in range(n):
        out = fn(*argsets[k % len(argsets)])
    sync(out)
    print(f"{name:40s} {((time.time()-t0)/n)*1000:8.2f} ms/it", flush=True)
    return out


if __name__ == "__main__":
    from wass_tpu.stereo.sgm_pallas import _run_tri_dir

    H, W = 1536, 2048
    rng = np.random.default_rng(0)
    for D in (128, 64):
        costs = [jnp.asarray(rng.integers(0, 60, (H, W, D)), jnp.uint8) for _ in range(2)]
        jax.block_until_ready([np.asarray(c[0, 0, 0]) for c in costs])
        a = [(c,) for c in costs]
        r_b = timeit(f"D={D} tri butterfly lane-min", jax.jit(lambda c: run_tri(_tri_bfly, c)), a)
        r_ref = jax.jit(functools.partial(_run_tri_dir, P1=8, P2=96, reverse=False))(costs[0])
        same = np.array_equal(np.asarray(r_b), np.asarray(r_ref))
        print(f"  parity vs production kernel: {'exact' if same else 'DIFFERS'}", flush=True)
