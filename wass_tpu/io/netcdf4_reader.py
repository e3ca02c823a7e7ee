"""Minimal netCDF-4 reader over HDF5 (h5py), for environments without the
netCDF4 package.

netCDF-4 files ARE HDF5 files plus a set of conventions; this module
implements the part a consumer of our gridded cubes
(/root/reference/gridding/wassgridsurface/netcdfoutput.py:22-101 is the
schema contract) relies on, the same way the netCDF-C library resolves it:

* dimensions are HDF5 datasets tagged ``CLASS = "DIMENSION_SCALE"``
  (a dimension WITHOUT a corresponding variable additionally carries the
  ``NAME = "This is a netCDF dimension but not a netCDF variable..."``
  marker);
* every variable's shape is named by its ``DIMENSION_LIST`` attribute — a
  list of object references to the dimension-scale datasets;
* groups map to netCDF groups; HDF5 attributes map to netCDF attributes;
* variable-length ``uint8`` datasets map to netCDF VLEN types (the JPEG
  frame store ``cam0images``).

It deliberately shares no code with grid/netcdf.py's writer, so the
roundtrip test (tests/test_grid_parity.py) genuinely exercises the
conventions rather than a common implementation.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

_DIM_ONLY_MARKER = b"This is a netCDF dimension but not a netCDF variable"


def _decode_attr(v):
    """netCDF-style attribute decode (bytes -> str, 0-d -> scalar)."""
    if isinstance(v, bytes):
        return v.decode()
    if isinstance(v, np.ndarray) and v.shape == ():
        return v[()]
    return v


class Variable:
    """A netCDF variable: named dimensions + data access."""

    def __init__(self, ds, dset):
        self._ds = ds
        self._h5 = dset

    @property
    def dimensions(self) -> Tuple[str, ...]:
        """Dimension names resolved through DIMENSION_LIST references."""
        if "DIMENSION_LIST" not in self._h5.attrs:
            # A coordinate variable IS its own dimension.
            name = self._h5.name.rsplit("/", 1)[-1]
            if name in self._ds.dimensions:
                return (name,)
            return ()
        f = self._h5.file
        names = []
        for refs in self._h5.attrs["DIMENSION_LIST"]:
            # Each axis lists one (or more) scale references; netCDF
            # attaches exactly one.
            names.append(f[refs[0]].name.rsplit("/", 1)[-1])
        return tuple(names)

    @property
    def shape(self):
        return self._h5.shape

    @property
    def dtype(self):
        return self._h5.dtype

    def __getitem__(self, key):
        return self._h5[key]

    # Exact reserved names, matching netCDF-C's hidden-attribute policy
    # (hiding only the precise HDF5 dimension-scale bookkeeping names, not
    # every user attr that merely shares a prefix, e.g. "CLASS_ID").
    _RESERVED = frozenset({"CLASS", "NAME", "DIMENSION_LIST", "REFERENCE_LIST"})

    def ncattrs(self):
        return [
            k
            for k in self._h5.attrs
            if k not in self._RESERVED and not k.startswith("_Netcdf4")
        ]

    def getncattr(self, name):
        return _decode_attr(self._h5.attrs[name])


class Dataset:
    """Read-only netCDF-4 dataset (root or sub-group)."""

    def __init__(self, path_or_group, mode: str = "r"):
        import h5py

        if isinstance(path_or_group, (h5py.File, h5py.Group)):
            self._h5 = path_or_group
            self._owner = False
        else:
            assert mode == "r", "reader is read-only"
            self._h5 = h5py.File(path_or_group, "r")
            self._owner = True

    # -- netCDF4-style surface --------------------------------------------
    @property
    def dimensions(self) -> Dict[str, int]:
        import h5py

        dims = {}
        for name, item in self._h5.items():
            if isinstance(item, h5py.Dataset) and item.attrs.get("CLASS") == b"DIMENSION_SCALE":
                dims[name] = item.shape[0] if item.shape else 0
        return dims

    @property
    def variables(self) -> Dict[str, Variable]:
        import h5py

        out = {}
        for name, item in self._h5.items():
            if not isinstance(item, h5py.Dataset):
                continue
            if item.attrs.get("CLASS") == b"DIMENSION_SCALE" and _DIM_ONLY_MARKER in item.attrs.get("NAME", b""):
                continue  # pure dimension, not a variable
            out[name] = Variable(self, item)
        return out

    @property
    def groups(self) -> Dict[str, "Dataset"]:
        import h5py

        return {
            name: Dataset(item)
            for name, item in self._h5.items()
            if isinstance(item, h5py.Group)
        }

    def ncattrs(self):
        return [k for k in self._h5.attrs if not k.startswith("_Netcdf4")]

    def getncattr(self, name):
        return _decode_attr(self._h5.attrs[name])

    def __getitem__(self, name) -> Variable:
        if "/" in name:
            grp, rest = name.split("/", 1)
            return self.groups[grp][rest]
        return self.variables[name]

    def close(self):
        if self._owner:
            self._h5.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
