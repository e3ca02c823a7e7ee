"""NetCDF-4 output cube, written through h5py.

Replicates the reference's gridded.nc schema (NetCDFOutput,
/root/reference/gridding/wassgridsurface/netcdfoutput.py:22-211): dims
X/Y/count; variables Z (mm, chunked CxHxW), X_grid/Y_grid (mm), Kx/Ky,
scale, time, count, workdir, maskZ, VL-typed cam0images/cam0masks; a
"meta" group carrying intrinsics and projection matrices.

netCDF-4 files *are* HDF5 files following the netCDF conventions
(dimension scales + reference lists); this writer produces those
conventions directly with h5py since the netCDF4 python package is not
available in this environment.  Files open with any netCDF4/HDF5 reader.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class NetCDFWriter:
    def __init__(self, filename, M: int, N: int, chunk_c: int = 64):
        import h5py

        self.f = h5py.File(filename, "w")
        self.M = M
        self.N = N
        self._count = 0

        f = self.f
        # Dimension scales (netCDF dimensions).
        self.dimX = f.create_dataset("X", data=np.zeros(N, np.float64))
        self.dimX.make_scale("X")
        self.dimY = f.create_dataset("Y", data=np.zeros(M, np.float64))
        self.dimY.make_scale("Y")

        cc = min(chunk_c, 512)
        cx = min(128, N)
        cy = min(128, M)

        def var(name, shape, dtype, chunks=None, maxshape=None):
            return f.create_dataset(name, shape=shape, dtype=dtype, chunks=chunks, maxshape=maxshape)

        self.scale_ds = var("scale", (), "f8")
        self.count_ds = var("count", (0,), "u4", chunks=(1024,), maxshape=(None,))
        self.time_ds = var("time", (0,), "f4", chunks=(1024,), maxshape=(None,))
        self.workdir_ds = var("workdir", (0,), "u8", chunks=(1024,), maxshape=(None,))
        self.xgrid = var("X_grid", (N, M), "f8")
        self.ygrid = var("Y_grid", (N, M), "f8")
        self.kx = var("Kx", (N, M), "f8")
        self.ky = var("Ky", (N, M), "f8")
        self.Z = f.create_dataset(
            "Z", shape=(0, N, M), dtype="f4", chunks=(cc, cx, cy), maxshape=(None, N, M)
        )
        self.maskZ = var("maskZ", (N, M), "f4")

        import h5py

        vlen = h5py.vlen_dtype(np.uint8)
        self.cam0images = f.create_dataset("cam0images", (0,), dtype=vlen, chunks=(64,), maxshape=(None,))
        self.cam0masks = f.create_dataset("cam0masks", (0,), dtype=vlen, chunks=(64,), maxshape=(None,))

        # netCDF-4 dimension wiring: `count` is the unlimited record
        # dimension; every variable attaches its dimension scales so
        # netCDF4-convention readers see (count, X, Y) instead of
        # phony dims (reference schema: netcdfoutput.py:40-101).
        self.count_ds.make_scale("count")
        for ds2d in (self.xgrid, self.ygrid, self.kx, self.ky, self.maskZ):
            ds2d.dims[0].attach_scale(self.dimX)
            ds2d.dims[1].attach_scale(self.dimY)
        self.Z.dims[0].attach_scale(self.count_ds)
        self.Z.dims[1].attach_scale(self.dimX)
        self.Z.dims[2].attach_scale(self.dimY)
        for ds1d in (self.time_ds, self.workdir_ds, self.cam0images, self.cam0masks):
            ds1d.dims[0].attach_scale(self.count_ds)

        for name, units, long_name in [
            ("scale", "meter", "scale"),
            ("count", "steps", "count"),
            ("time", "seconds", "time"),
            ("workdir", "workdir", "WASS-like workdir number (ie. frame index)"),
            ("X_grid", "millimeter", "X axis grid"),
            ("Y_grid", "millimeter", "Y axis grid"),
            ("Kx", "wavenumbers", "Horizontal wavenumbers"),
            ("Ky", "wavenumbers", "Vertical wavenumbers"),
            ("Z", "millimeter", "Z data on time over the XY grid"),
            ("maskZ", "", "Z mask over the XY grid"),
        ]:
            f[name].attrs["units"] = units
            f[name].attrs["long_name"] = long_name

        self.meta = f.create_group("meta")

    @property
    def scale(self):
        return self.scale_ds[()]

    @scale.setter
    def scale(self, v):
        self.scale_ds[...] = v

    def set_grids(self, XX, YY):
        self.xgrid[...] = np.asarray(XX).T if XX.shape == (self.M, self.N) else XX
        self.ygrid[...] = np.asarray(YY).T if YY.shape == (self.M, self.N) else YY

    def set_kxky(self, KX, KY):
        self.kx[...] = np.asarray(KX).T if KX.shape == (self.M, self.N) else KX
        self.ky[...] = np.asarray(KY).T if KY.shape == (self.M, self.N) else KY

    def set_mask(self, mask):
        self.maskZ[...] = np.asarray(mask).T if mask.shape == (self.M, self.N) else mask

    def set_intrinsics(self, K0, K1, kc0, kc1, P0plane, P1plane, P0cam, P1cam, Cam0toGrid, Cam1toGrid):
        m = self.meta
        m.create_dataset("intr0", data=np.asarray(K0, np.float64))
        m.create_dataset("intr1", data=np.asarray(K1, np.float64))
        m.create_dataset("dist0", data=np.asarray(kc0, np.float64).reshape(-1))
        m.create_dataset("dist1", data=np.asarray(kc1, np.float64).reshape(-1))
        for name, M_ in [
            ("P0plane", P0plane), ("P1plane", P1plane),
            ("P0cam", P0cam), ("P1cam", P1cam),
            ("Cam0toGrid", Cam0toGrid), ("Cam1toGrid", Cam1toGrid),
        ]:
            if M_ is not None:
                m.create_dataset(name, data=np.asarray(M_, np.float64))

    def add_meta_attribute(self, name, value):
        self.meta.attrs[name] = value

    def push_Z(self, Z, time: float, workdir: int, image: Optional[bytes] = None, imagemask: Optional[bytes] = None):
        idx = self._count
        self._count += 1
        for ds in (self.count_ds, self.time_ds, self.workdir_ds, self.cam0images, self.cam0masks):
            ds.resize((self._count,))
        self.Z.resize((self._count, self.N, self.M))
        Zt = np.asarray(Z, np.float32)
        if Zt.shape == (self.M, self.N):
            Zt = Zt.T
        self.Z[idx] = Zt
        self.count_ds[idx] = idx
        self.time_ds[idx] = time
        self.workdir_ds[idx] = workdir
        if image is not None:
            self.cam0images[idx] = np.frombuffer(image, np.uint8)
        if imagemask is not None:
            self.cam0masks[idx] = np.frombuffer(imagemask, np.uint8)

    def close(self):
        self.f.close()


class NetCDFReader:
    """Reader for gridded.nc cubes (ours or the reference's)."""

    def __init__(self, filename):
        import h5py

        self.f = h5py.File(filename, "r")

    def __getitem__(self, name):
        return self.f[name]

    @property
    def Z(self):
        return self.f["Z"]

    def meta(self, name):
        return self.f["meta"][name][...]

    def meta_attr(self, name):
        return self.f["meta"].attrs[name]

    def close(self):
        self.f.close()
