"""Gridding + post-processing tests: median-stack rasterization, DCT/IDW
interpolation, NetCDF round-trip, spectra, filters, occlusion, radiance."""

import numpy as np
import jax.numpy as jnp
import pytest

from wass_tpu.grid.interpolators import dct_interpolate, idw_interpolate
from wass_tpu.grid.gridding import _median_stack
from wass_tpu.grid.netcdf import NetCDFWriter, NetCDFReader
from wass_tpu.post.spectra import compute_spectrum, spectrum_stats, compute_3d_spectrum
from wass_tpu.post.filters import temporal_butterworth, spatial_butterworth_lowpass, zero_mean
from wass_tpu.post.geometry import compute_slope_and_normals, compute_occlusion_mask
from wass_tpu.post.radiance import vats_threshold, bg_radiance


def wave_cube(rng, T=256, H=24, W=24, fps=5.0, f0=0.4, amp=1.0):
    t = np.arange(T) / fps
    xx, yy = np.meshgrid(np.arange(W), np.arange(H))
    Z = amp * np.sin(2 * np.pi * f0 * t[:, None, None] + 0.3 * xx + 0.2 * yy)
    Z += 0.05 * rng.standard_normal((T, H, W))
    return Z


class TestInterpolators:
    def _holey_surface(self, rng, h=64, w=64, frac=0.4):
        xx, yy = np.meshgrid(np.arange(w), np.arange(h))
        Z = np.sin(xx / 9.0) * np.cos(yy / 7.0)
        holes = rng.random((h, w)) < frac
        Zh = Z.copy()
        Zh[holes] = np.nan
        return Z, Zh, holes

    def test_idw_fills_holes(self, rng):
        Z, Zh, holes = self._holey_surface(rng)
        out, mask = idw_interpolate(Zh)
        filled = holes & np.isfinite(out)
        assert filled.mean() > 0.3
        err = np.abs(out - Z)[filled]
        assert np.median(err) < 0.1

    def test_dct_fills_holes(self, rng):
        Z, Zh, holes = self._holey_surface(rng)
        out, mask = dct_interpolate(Zh, nfreqs=32, max_iters=300)
        err = np.abs(out - Z)[holes]
        assert np.median(err) < 0.1
        # Observed cells should be closely reproduced too.
        err_obs = np.abs(out - Z)[~holes]
        assert np.median(err_obs) < 0.05


class TestMedianStack:
    def test_scatter_median(self, rng):
        import jax

        H = W = 16
        n = 4000
        px = rng.integers(0, W, n)
        py = rng.integers(0, H, n)
        z = (px + py).astype(np.float32) + rng.standard_normal(n).astype(np.float32) * 0.01
        Z = np.asarray(
            _median_stack(
                jnp.asarray(px, jnp.int32), jnp.asarray(py, jnp.int32), jnp.asarray(z),
                jnp.ones(n, bool), jax.random.PRNGKey(0), (H, W), 10, n,
            )
        )
        xx, yy = np.meshgrid(np.arange(W), np.arange(H))
        expect = (xx + yy).astype(np.float32)
        m = np.isfinite(Z)
        assert m.mean() > 0.95
        assert np.abs(Z - expect)[m].max() < 0.1


class TestNetCDF:
    def test_roundtrip(self, tmp_path, rng):
        M = N = 32
        w = NetCDFWriter(tmp_path / "g.nc", M=M, N=N)
        w.scale = 2.5
        XX, YY = np.meshgrid(np.arange(N, dtype=float), np.arange(M, dtype=float))
        w.set_grids(XX, YY)
        w.set_kxky(XX * 0.1, YY * 0.1)
        w.set_intrinsics(np.eye(3), np.eye(3), np.zeros(5), np.zeros(5),
                         np.eye(4), np.eye(4), np.eye(3, 4), np.eye(3, 4), np.eye(4), np.eye(4))
        w.add_meta_attribute("fps", 5.0)
        frames = [rng.standard_normal((M, N)).astype(np.float32) for _ in range(4)]
        for i, Z in enumerate(frames):
            w.push_Z(Z, time=i / 5.0, workdir=i)
        w.close()

        r = NetCDFReader(tmp_path / "g.nc")
        assert r.Z.shape[0] == 4
        np.testing.assert_allclose(r.Z[2], frames[2].T, rtol=1e-6)
        assert float(r.meta_attr("fps")) == 5.0
        np.testing.assert_allclose(r.meta("intr0"), np.eye(3))
        r.close()


class TestSpectra:
    def test_peak_frequency(self, rng):
        fps, f0 = 5.0, 0.4
        Z = wave_cube(rng, fps=fps, f0=f0)
        f, S, ts = compute_spectrum(Z, dt=1.0 / fps, nperseg=128, rangespan=2)
        st = spectrum_stats(f, S)
        assert abs(st.fp - f0) < 0.08
        # Hm0 = 4 sqrt(m0); for a sine of amplitude a, m0 = a^2/2 => ~2.83a.
        assert 2.0 < st.hm0 < 3.6

    def test_3d_spectrum_runs(self, rng):
        Z = wave_cube(rng, T=128, H=48, W=48)
        S, KX, KY, f = compute_3d_spectrum(Z, du=0.5, dt=0.2, segments=4)
        assert np.isfinite(S).all()
        assert S.shape[1:] == KX.shape


class TestFilters:
    def test_temporal_butterworth_removes_high_freq(self, rng):
        fps = 10.0
        t = np.arange(512) / fps
        low = np.sin(2 * np.pi * 0.3 * t)
        high = np.sin(2 * np.pi * 3.0 * t)
        cube = (low + high)[:, None, None] * np.ones((1, 4, 4))
        out = temporal_butterworth(cube, fps=fps, cutoff_hz=1.0)
        resid = out[:, 0, 0] - low
        assert np.abs(resid[32:-32]).max() < 0.1

    def test_spatial_lowpass(self, rng):
        H = W = 64
        xx, yy = np.meshgrid(np.arange(W), np.arange(H))
        low = np.sin(xx / 20.0)
        high = np.sin(xx * 2.0)
        out = spatial_butterworth_lowpass(low + high, du=0.5, cutoff=0.2)
        assert np.abs(out - low)[8:-8, 8:-8].max() < 0.2

    def test_zero_mean(self, rng):
        cube = rng.standard_normal((32, 6, 6)) + 5.0
        z = zero_mean(cube)
        np.testing.assert_allclose(np.nanmean(z, axis=0), 0, atol=1e-12)


class TestGeometry:
    def test_normals_point_up(self):
        XX, YY = np.meshgrid(np.arange(32, dtype=float), np.arange(32, dtype=float))
        ZZ = 0.2 * np.sin(XX / 5)
        slope, normals = compute_slope_and_normals(XX, YY, ZZ)
        assert (normals[..., 2] > 0).all()
        np.testing.assert_allclose(np.linalg.norm(normals, axis=-1), 1.0, atol=1e-9)

    def test_occlusion_behind_wall(self):
        ZZ = np.zeros((16, 32))
        ZZ[:, 20] = 5.0  # tall wall
        rays = np.zeros((16, 32, 3))
        rays[..., 0] = 1.0  # point rays in +x
        rays[..., 2] = 0.3  # upward slope: clears the wall only from afar
        occ = compute_occlusion_mask(ZZ, rays)
        # Points just left of the wall are occluded (0.3 * 5 cells < 5);
        # far-left points rise above it before reaching x=20 (0.3 * 18 > 5).
        assert occ[:, 15:20].mean() > 0.8
        assert occ[:, :3].mean() < 0.2

    def test_visibility_batch_matches_per_frame(self):
        """The batched slab path must agree with the per-frame reference
        formulation (occlusion exactly; incidence to float tolerance)."""
        from wass_tpu.post.geometry import compute_visibility_batch

        rng = np.random.default_rng(3)
        H, W, B = 24, 20, 3
        dx = 0.5
        XX, YY = np.meshgrid(np.arange(W) * dx, np.arange(H) * dx)
        ZZ = 0.4 * np.sin(XX * 1.3) * np.cos(YY * 0.9)
        slab = np.stack([ZZ + 0.1 * k for k in range(B)])
        C = np.array([W * dx / 2, -3.0, 8.0])

        occ_b, inc_b = compute_visibility_batch(slab, XX, YY, C, dx)
        for k in range(B):
            zz = slab[k]
            rays = np.dstack([C[0] - XX, C[1] - YY, np.maximum(C[2] - zz, 1e-3)])
            rays /= np.linalg.norm(rays, axis=-1, keepdims=True)
            _, normals = compute_slope_and_normals(XX, YY, zz)
            inc = np.degrees(np.arccos(np.clip(np.sum(normals * rays, -1), -1, 1)))
            occ = compute_occlusion_mask(zz / dx, rays)
            occ[inc >= 88.0] = 1
            np.testing.assert_array_equal(occ_b[k], occ)
            np.testing.assert_allclose(inc_b[k], inc, atol=2e-2)


class TestRadiance:
    def test_vats_threshold_separates_modes(self, rng):
        vals = np.concatenate([rng.normal(0.2, 0.02, 5000), rng.normal(0.9, 0.02, 100)])
        t = vats_threshold(vals)
        assert 0.25 < t < 0.9

    def test_bg_radiance_is_temporal_mean_like(self, rng):
        cube = np.ones((50, 4, 4), np.float32) * 0.5
        cube[25] = 1.0
        bg = bg_radiance(cube, 49)
        assert abs(bg[0, 0, 0] - 0.5) < 0.05


class TestVariationalRefinement:
    def test_refines_toward_photoconsistent_surface(self):
        """Flat ground-truth surface viewed by two cameras with an
        analytic texture: starting from a smoothly perturbed surface, the
        photo-consistency refinement must reduce both the photometric
        loss and the elevation error (the reference's experimental
        TFVariationalRefinement semantics)."""
        import jax.numpy as jnp

        from wass_tpu.grid.variational import variational_refine

        # Plane frame == alignment frame: Rpl = I, Tpl = 0, baseline = 1.
        H = W = 48
        z0 = 0.0  # flat sea surface (meters, aligned convention)
        XX, YY = np.meshgrid(
            np.linspace(-2.0, 2.0, W), np.linspace(-2.0, 2.0, H)
        )

        def tex(x, y):
            return 127.0 + 60.0 * np.sin(2.1 * x) * np.cos(1.7 * y) + 40.0 * np.sin(3.3 * x + 2.9 * y)

        # Cameras: pc = (X, Y, -Z); both see the plane at depth 5 - z0.
        f, cx, cy = 60.0, 32.0, 32.0
        K = np.array([[f, 0, cx], [0, f, cy], [0, 0, 1.0]])
        depth = 5.0 - z0
        Hi = Wi = 64

        def render(tx):
            u, v = np.meshgrid(np.arange(Wi, dtype=float), np.arange(Hi, dtype=float))
            X = (u - cx) * depth / f - tx
            Y = (v - cy) * depth / f
            return tex(X, Y)

        b = 0.4
        I0 = render(0.0)
        I1 = render(b)
        P0 = K @ np.hstack([np.eye(3), np.array([[0.0], [0.0], [5.0]])])
        P1 = K @ np.hstack([np.eye(3), np.array([[b], [0.0], [5.0]])])

        rng = np.random.default_rng(3)
        Z_init = z0 + 0.25 * np.sin(1.5 * XX) * np.cos(1.2 * YY)
        mask = np.ones((H, W), np.float32)

        Zr = np.asarray(variational_refine(
            jnp.asarray(Z_init, jnp.float32), I0, I1, P0, P1,
            np.eye(3), np.zeros(3), XX, YY, 1.0, mask,
            max_iters=600, alpha=0.05, lr=5e-3,
        ))
        inner = (slice(6, -6), slice(6, -6))
        err0 = np.abs(Z_init - z0)[inner].mean()
        err1 = np.abs(Zr - z0)[inner].mean()
        assert np.isfinite(Zr).all()
        assert err1 < 0.5 * err0, (err0, err1)
