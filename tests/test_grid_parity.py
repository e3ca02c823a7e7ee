"""Gridding parity additions: netCDF-4 dimension conventions, JPEG frame
push, outlier voter, LinearND, chunked force_zero_mean."""

import numpy as np
import pytest

import h5py

from wass_tpu.grid.netcdf import NetCDFWriter
from wass_tpu.grid.outliers import filter_mesh_outliers


def _write_cube(path, T=4, M=12, N=10, with_images=False):
    w = NetCDFWriter(path, M=M, N=N)
    w.scale = 2.5
    w.add_meta_attribute("generator", "wass_tpu")
    XX, YY = np.meshgrid(np.arange(N, dtype=float), np.arange(M, dtype=float))
    w.set_grids(XX * 1000, YY * 1000)
    w.set_kxky(XX, YY)
    rng = np.random.default_rng(0)
    for t in range(T):
        img = rng.integers(0, 255, 16, dtype=np.uint8).tobytes() if with_images else None
        w.push_Z(rng.standard_normal((M, N)) * 100, time=t / 2.0, workdir=t, image=img)
    w.close()


class TestNetCDFConventions:
    def test_dimension_scales_attached(self, tmp_path):
        """The cube must follow the netCDF-4 HDF5 conventions (dimension
        scales attached to every variable) so netCDF4-package readers see
        (count, X, Y), not phony dims.  The netCDF4 package is absent in
        this image, so the convention attributes are validated directly."""
        path = tmp_path / "cube.nc"
        _write_cube(path)
        with h5py.File(path) as f:
            for dim in ("X", "Y", "count"):
                assert f[dim].attrs["CLASS"] == b"DIMENSION_SCALE"
            z = f["Z"]
            assert "DIMENSION_LIST" in z.attrs
            names = [
                f[ref[0]].name for ref in z.attrs["DIMENSION_LIST"]
            ]
            assert names == ["/count", "/X", "/Y"]
            xg = f["X_grid"]
            names = [f[ref[0]].name for ref in xg.attrs["DIMENSION_LIST"]]
            assert names == ["/X", "/Y"]
            assert [f[r[0]].name for r in f["time"].attrs["DIMENSION_LIST"]] == ["/count"]

    def test_netcdf4_reader_roundtrip(self, tmp_path):
        """Read the cube back through a netCDF-4 dimension-resolving
        reader: the real netCDF4 package when present, else the vendored
        minimal reader (wass_tpu/io/netcdf4_reader.py), which implements
        the same convention resolution (DIMENSION_LIST references,
        DIMENSION_SCALE tagging) independently of the writer."""
        try:
            from netCDF4 import Dataset
        except ImportError:
            from wass_tpu.io.netcdf4_reader import Dataset

        path = tmp_path / "cube.nc"
        _write_cube(path, with_images=True)
        with Dataset(path) as ds:
            assert set(ds.dimensions) >= {"X", "Y", "count"}
            # X is the N axis, Y the M axis (grid/netcdf.py:33-36).
            assert ds.dimensions["X"] == 10 and ds.dimensions["Y"] == 12
            z = ds["Z"]
            assert z.dimensions == ("count", "X", "Y")
            assert z.shape == (4, 10, 12)
            zdata = np.asarray(z[:])
            assert np.isfinite(zdata).all()
            assert ds["X_grid"].dimensions == ("X", "Y")
            assert ds["time"].dimensions == ("count",)
            np.testing.assert_allclose(np.asarray(ds["time"][:]), [0, 0.5, 1.0, 1.5])
            assert float(np.asarray(ds["scale"][()])) == 2.5
            # VLEN JPEG frame store.
            imgs = ds["cam0images"]
            assert imgs.shape == (4,)
            assert len(np.asarray(imgs[0]).tobytes()) == 16
            # meta group attributes.
            meta = ds.groups["meta"]
            assert "generator" in meta.ncattrs()
            assert meta.getncattr("generator") == "wass_tpu"

    def test_images_stored(self, tmp_path):
        path = tmp_path / "cube.nc"
        _write_cube(path, with_images=True)
        with h5py.File(path) as f:
            assert f["cam0images"].shape == (4,)
            assert f["cam0images"][0].size == 16


class TestOutlierVoter:
    def test_drops_spikes_keeps_surface(self, rng):
        n = 4000
        x = rng.uniform(-10, 10, n)
        y = rng.uniform(-10, 10, n)
        z = 0.05 * x - 0.03 * y + 0.01 * rng.standard_normal(n)
        n_bad = 60
        bad = rng.choice(n, n_bad, replace=False)
        z[bad] += rng.choice([-1, 1], n_bad) * rng.uniform(1.5, 3.0, n_bad)
        mesh = np.vstack([x, y, z])
        out = filter_mesh_outliers(mesh, ransac_inlier_threshold=0.2)
        kept = out.shape[1]
        # All spikes dropped, almost all surface kept.
        assert kept <= n - n_bad
        assert kept >= (n - n_bad) * 0.98
        # No kept point deviates far from the plane.
        dev = np.abs(out[2] - (0.05 * out[0] - 0.03 * out[1]))
        assert dev.max() < 0.5

    def test_small_cloud_passthrough(self):
        mesh = np.random.default_rng(0).standard_normal((3, 8))
        out = filter_mesh_outliers(mesh)
        assert out.shape == mesh.shape


def test_force_zero_mean_chunked(tmp_path, rng):
    from wass_tpu.grid.gridding import _force_zero_mean_chunked

    path = tmp_path / "cube.nc"
    T, M, N = 6, 12, 10
    _write_cube(path, T=T, M=M, N=N)
    with h5py.File(path) as f:
        Z = f["Z"][...]
    mean_storage = Z.mean(axis=0)  # (N, M) storage order
    # _force_zero_mean_chunked takes the (M, N) grid-frame mean in mm.
    _force_zero_mean_chunked(path, mean_storage.T.astype(np.float32))
    with h5py.File(path) as f:
        Z2 = f["Z"][...]
    np.testing.assert_allclose(Z2, Z - mean_storage[None], atol=1e-4)


def test_grid_sequence_linearnd_and_outliers(tmp_path, rng):
    """grid_frame LinearND path + outlier flag run end-to-end on a tiny
    synthetic workdir mesh."""
    from wass_tpu.grid.gridding import GridConfig, grid_frame
    from wass_tpu.grid.setup import GridSetup
    from wass_tpu.io.xyzc import save_xyz_compressed
    from wass_tpu.io.workdir import Workdir

    wd = Workdir(tmp_path / "000000_wd").create()
    n = 3000
    pts = np.c_[
        rng.uniform(-4, 4, n), rng.uniform(-4, 4, n),
        10.0 + 0.05 * rng.standard_normal(n),
    ]
    save_xyz_compressed(wd.path / "mesh_cam.xyzC", pts, np.eye(3), np.zeros(3))

    H = W = 16
    XX, YY = np.meshgrid(np.linspace(-3, 3, W), np.linspace(-3, 3, H))
    setup = GridSetup.__new__(GridSetup)
    # Minimal fields used by grid_frame.
    object.__setattr__ if False else None
    setup.Rpl = np.eye(3)
    setup.Tpl = np.zeros((3, 1))
    setup.baseline = 1.0
    setup.XX = XX
    setup.YY = YY
    setup.xmin, setup.xmax = -3.0, 3.0
    setup.ymin, setup.ymax = -3.0, 3.0

    for algo in ("LinearND", "IDW"):
        cfg = GridConfig(algorithm=algo, filter_outliers=True, seed=1)
        Z, mask = grid_frame(wd, setup, cfg)
        assert Z.shape == (H, W)
        inner = Z[2:-2, 2:-2]
        assert np.isfinite(inner).all()
        # Aligned z flips sign: surface at z=10 -> -10.
        assert abs(np.nanmedian(inner) + 10.0) < 0.3


def test_grid_sequence_streaming_mask_and_stats(tmp_path, rng):
    """grid_sequence streams frames (returns GridStats, not per-frame
    grids), honors a user grid mask (reference --mask), writes maskZ into
    the cube, and emits the frame-0 diagnostics."""
    from wass_tpu.grid.gridding import GridConfig, GridStats, grid_sequence
    from wass_tpu.grid.setup import GridSetup
    from wass_tpu.io.xyzc import save_xyz_compressed
    from wass_tpu.io.workdir import Workdir

    wds = []
    for i in range(3):
        wd = Workdir(tmp_path / f"{i:06d}_wd").create()
        n = 2500
        pts = np.c_[
            rng.uniform(-4, 4, n), rng.uniform(-4, 4, n),
            10.0 + 0.1 * i + 0.03 * rng.standard_normal(n),
        ]
        save_xyz_compressed(wd.path / "mesh_cam.xyzC", pts, np.eye(3), np.zeros(3))
        wds.append(wd)

    H = W = 16
    XX, YY = np.meshgrid(np.linspace(-3, 3, W), np.linspace(-3, 3, H))
    setup = GridSetup.__new__(GridSetup)
    setup.Rpl = np.eye(3)
    setup.Tpl = np.zeros((3, 1))
    setup.baseline = 1.0
    setup.XX, setup.YY = XX, YY
    setup.xmin, setup.xmax = -3.0, 3.0
    setup.ymin, setup.ymax = -3.0, 3.0
    setup.KX_ab = XX
    setup.KY_ab = YY
    setup.K0 = setup.K1 = np.eye(3)
    setup.P0plane = setup.P1plane = np.eye(4)[:3]
    setup.P0cam = setup.P1cam = np.eye(4)
    setup.Cam0toGrid = setup.Cam1toGrid = np.eye(4)
    setup.fps = 2.0

    user_mask = np.ones((H, W), np.float32)
    user_mask[:, :4] = 0.0  # exclude a stripe

    out = tmp_path / "gridded.nc"
    stats = grid_sequence(
        wds, setup, out, GridConfig(algorithm="IDW", save_images=False),
        user_mask=user_mask, diag_dir=tmp_path / "diag",
    )
    assert isinstance(stats, GridStats)
    assert stats.n_frames == 3
    assert stats.zmean.shape == (H, W)
    assert np.isfinite(stats.zmin) and stats.zmax >= stats.zmin

    with h5py.File(out) as f:
        assert f["Z"].shape[0] == 3
        # maskZ stored in (N=X, M=Y) storage order like the reference cube.
        m = f["maskZ"][...]
        np.testing.assert_array_equal(m, user_mask.T)
        Z0 = f["Z"][0]  # (N, M): columns are grid x
        assert np.isnan(Z0[:4, :]).all()  # masked stripe excluded
        assert np.isfinite(Z0[6:-2, 2:-2]).all()
    assert (tmp_path / "diag" / "grid_img.png").exists()
