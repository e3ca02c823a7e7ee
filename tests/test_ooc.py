"""Out-of-core post-processing: streamed results must equal in-RAM ones
even under a pathologically small memory budget (the reference's dask /
chunked-HDF5 contract, wasspost.py:157-251, 965-1005, 1014-1074)."""

import numpy as np
import pytest

import h5py

from wass_tpu.post import ooc
from wass_tpu.post.filters import temporal_butterworth, zero_mean
from wass_tpu.post.radiance import bg_radiance


@pytest.fixture
def tiny_budget(monkeypatch):
    monkeypatch.setenv("WASS_POST_MEMORY_MB", "0.05")  # ~50 KB


@pytest.fixture
def cube_file(tmp_path, rng):
    T, H, W = 32, 24, 20
    Z = rng.standard_normal((T, H, W)).astype(np.float32)
    Z[:, 3, 4] = np.nan
    path = tmp_path / "cube.h5"
    with h5py.File(path, "w") as f:
        f.create_dataset("Z", data=Z, chunks=(8, 8, 8))
    return path, Z


def test_blocks_cover_everything(tiny_budget):
    shape = (32, 24, 20)
    seen = np.zeros(shape[1:], int)
    n_blocks = 0
    for ys, xs in ooc.iter_col_blocks(shape, 4):
        seen[ys, xs] += 1
        n_blocks += 1
    assert (seen == 1).all()
    assert n_blocks >= 4  # the budget actually forced splitting

    cov = np.zeros(shape[0], int)
    n_slabs = 0
    for ts in ooc.iter_time_slabs(shape, 4):
        cov[ts] += 1
        n_slabs += 1
    assert (cov == 1).all()
    assert n_slabs > 1


def test_apply_timewise_matches_in_ram(cube_file, tiny_budget):
    path, Z = cube_file
    ref = temporal_butterworth(Z, fps=4.0, cutoff_hz=0.5)
    with h5py.File(path, "r+") as f:
        ooc.apply_timewise(
            f, "Z", "Z_filtered",
            lambda blk: temporal_butterworth(blk, fps=4.0, cutoff_hz=0.5).astype(np.float32),
            dtype="f4",
        )
        out = f["Z_filtered"][...]
    np.testing.assert_allclose(out, ref.astype(np.float32), rtol=1e-5, atol=1e-5)


def test_streaming_zeromean_matches(cube_file, tiny_budget):
    path, Z = cube_file
    ref = zero_mean(Z)
    with h5py.File(path, "r+") as f:
        mean = ooc.streaming_time_mean(f["Z"]).astype(np.float32)
        ooc.apply_framewise(f, "Z", "Z", lambda blk: blk - mean[None])
        out = f["Z"][...]
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_bg_radiance_streamed_matches(cube_file, tiny_budget):
    path, Z = cube_file
    Zc = np.nan_to_num(Z)
    with h5py.File(path, "r+") as f:
        f["Z"][...] = Zc
        ooc.apply_timewise(
            f, "Z", "bg", lambda blk: bg_radiance(blk, 9).astype(np.float32), dtype="f4"
        )
        out = f["bg"][...]
    np.testing.assert_allclose(out, bg_radiance(Zc, 9), rtol=1e-5, atol=1e-5)


def test_spectrum_accepts_h5py_dataset(cube_file):
    from wass_tpu.post.spectra import compute_spectrum

    path, Z = cube_file
    with h5py.File(path, "r") as f:
        fr, S, _ = compute_spectrum(f["Z"], dt=0.25, nperseg=16, rangespan=2, scale=1e-3)
    fr2, S2, _ = compute_spectrum(Z, dt=0.25, nperseg=16, rangespan=2, scale=1e-3)
    np.testing.assert_allclose(S, S2, rtol=1e-6)


def test_clamp_chunks():
    assert ooc.clamp_chunks((64, 48, 48), (3, 48, 48)) == (3, 48, 48)
    assert ooc.clamp_chunks(None, (3, 4, 5)) is None
