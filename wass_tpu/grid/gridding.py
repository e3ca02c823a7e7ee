"""Per-frame point-cloud -> regular-grid surface reconstruction.

wassgridsurface --action grid equivalent (_grid_task,
/root/reference/gridding/wassgridsurface/wassgridsurface.py:304-523):
align the compressed camera mesh to the sea plane, quantize points into
grid cells with NREPS=10 random-subsample *median stacking*, interpolate
the holes (DCT / IDW), optional median filter, and stream frames into the
NetCDF cube.

TPU shape of the median stacking: the reference scatters a random
permutation per repetition (last-write-wins) into a (H, W, NREPS) buffer
and takes nanmedian.  Here each repetition is a jnp scatter with a random
permutation — identical semantics, batched on device.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from wass_tpu.grid.setup import GridSetup, align_on_sea_plane
from wass_tpu.grid.interpolators import dct_interpolate, idw_interpolate
from wass_tpu.io.workdir import Workdir
from wass_tpu.io.xyzc import load_camera_mesh
from wass_tpu.ops.morphology import median_filter


@dataclasses.dataclass(frozen=True)
class GridConfig:
    algorithm: str = "DCT"  # DCT | IDW
    nreps: int = 10
    subsample_percent: float = 100.0
    median_filter_size: int = 0
    dct_nfreqs: int = 150
    dct_iters: int = 500
    dct_alpha: float = 8e-7
    seed: int = 0


@partial(jax.jit, static_argnames=("shape", "nreps", "n_use"))
def _median_stack(pts_x, pts_y, pts_z, good, key, shape, nreps: int, n_use: int):
    """(H, W) nanmedian of nreps last-write-wins scatters of a random
    subsample (wassgridsurface.py:330-346)."""
    H, W = shape
    npts = pts_x.shape[0]
    flat = pts_y * W + pts_x
    flat = jnp.where(good, flat, H * W)  # dump invalid into a bin off-grid

    def one_rep(k):
        perm = jax.random.permutation(k, npts)
        sel = perm[:n_use]
        buf = jnp.full((H * W + 1,), jnp.nan, jnp.float32)
        buf = buf.at[flat[sel]].set(pts_z[sel], mode="drop")
        return buf[: H * W].reshape(H, W)

    keys = jax.random.split(key, nreps)
    ZZ = jax.vmap(one_rep)(keys)
    return jnp.nanmedian(ZZ, axis=0)


def grid_frame(
    workdir: Workdir,
    setup: GridSetup,
    cfg: GridConfig = GridConfig(),
) -> Tuple[np.ndarray, np.ndarray]:
    """Grid one frame: returns (Z, mask) in meters on the setup's XY grid."""
    mesh = load_camera_mesh(workdir.path / "mesh_cam.xyzC")
    meanplane_RT = (setup.Rpl, setup.Tpl)
    mesh_aligned = (setup.Rpl @ mesh + setup.Tpl)
    mesh_aligned[2, :] *= -1.0
    mesh_aligned = mesh_aligned * setup.baseline

    H, W = setup.XX.shape
    sx = setup.xmax - setup.xmin
    sy = setup.ymax - setup.ymin
    px = np.floor((mesh_aligned[0] - setup.xmin) / sx * (W - 1) + 0.5).astype(np.int64)
    py = np.floor((mesh_aligned[1] - setup.ymin) / sy * (H - 1) + 0.5).astype(np.int64)
    good = (px >= 0) & (px < W) & (py >= 0) & (py < H)

    n_use = max(1, int(len(px) * cfg.subsample_percent // 100))
    Z = _median_stack(
        jnp.asarray(np.clip(px, 0, W - 1), jnp.int32),
        jnp.asarray(np.clip(py, 0, H - 1), jnp.int32),
        jnp.asarray(mesh_aligned[2], jnp.float32),
        jnp.asarray(good),
        jax.random.PRNGKey(cfg.seed),
        (H, W),
        cfg.nreps,
        n_use,
    )
    Z = np.asarray(Z)

    if cfg.algorithm.upper() == "IDW":
        Zi, mask = idw_interpolate(Z)
    else:
        Zi, mask = dct_interpolate(
            Z, nfreqs=cfg.dct_nfreqs, max_iters=cfg.dct_iters, alpha=cfg.dct_alpha, seed=cfg.seed
        )

    Zi = np.where(mask > 0, Zi, np.nan)
    if cfg.median_filter_size >= 3:
        filled = np.nan_to_num(Zi)
        Zi = np.asarray(median_filter(jnp.asarray(filled, jnp.float32), cfg.median_filter_size))
        Zi = np.where(mask > 0, Zi, np.nan)
    return Zi, mask


def grid_sequence(
    workdirs: Sequence[Workdir],
    setup: GridSetup,
    out_path,
    cfg: GridConfig = GridConfig(),
    fps: Optional[float] = None,
) -> List[np.ndarray]:
    """Grid all frames into a NetCDF-compatible cube (gridded.nc schema)."""
    from wass_tpu.grid.netcdf import NetCDFWriter

    H, W = setup.XX.shape
    fps = fps if fps is not None else (setup.fps or 1.0)
    writer = NetCDFWriter(out_path, M=H, N=W)
    writer.scale = setup.baseline
    writer.set_grids(setup.XX * 1000.0, setup.YY * 1000.0)
    writer.set_kxky(setup.KX_ab, setup.KY_ab)
    writer.set_intrinsics(
        setup.K0, setup.K1, np.zeros(5), np.zeros(5),
        setup.P0plane, setup.P1plane, setup.P0cam[:3], setup.P1cam[:3],
        setup.Cam0toGrid, setup.Cam1toGrid,
    )
    writer.add_meta_attribute("generator", "wass_tpu")
    writer.add_meta_attribute("baseline", setup.baseline)
    writer.add_meta_attribute("fps", fps)

    Zs = []
    for i, wd in enumerate(workdirs):
        Z, mask = grid_frame(wd, setup, cfg)
        frame_idx = int(str(wd.path.name)[:-3]) if str(wd.path.name).endswith("_wd") else i
        writer.push_Z(Z * 1000.0, time=i / fps, workdir=frame_idx)
        Zs.append(Z)
    writer.close()
    return Zs
