"""Frame-sharded sequence runner: batches of stereo frames across a mesh.

The multi-chip/multi-host production path: frames are stacked into a
batch sharded over the ("frame",) mesh axis, the dense pipeline runs
vmapped under that sharding (XLA partitions it with zero cross-frame
communication), and the sequence reduction (mean plane) is a collective.

On a pod slice, call jax.distributed.initialize() first; the same code
then spans hosts, with each host feeding its local shard of frames
(process-local data + jax.make_array_from_process_local_data).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from wass_tpu.stereo.dense import (
    DenseStereoConfig,
    DenseFrameResult,
    dense_stereo_device,
    _stage_disparity,
    _stage_points,
    _stage_plane,
)
from wass_tpu.ops.sampling import warp_homography


@partial(jax.jit, static_argnames=("cfg",))
def _batched_frames(base_b, match_b, geom_pack_b, cfg: DenseStereoConfig):
    """vmapped staged pipeline over a leading frame axis, with *per-frame*
    geometries (every geom_pack leaf carries a frame axis, including the
    rectifying homographies — rectification runs in-graph with the traced-H
    gather warp so frames with distinct extrinsics batch together).  Under
    a frame sharding, XLA partitions every stage along that axis with zero
    cross-frame communication."""

    def one(bi, mi, gp):
        shape = bi.shape
        br = warp_homography(bi, gp["H_base"], shape)
        mr = warp_homography(mi, gp["H_match"], shape)
        disp = _stage_disparity.__wrapped__(br, mr, cfg)
        pts, valid = _stage_points.__wrapped__(disp, gp, br, mr, cfg)
        plane, ok, valid = _stage_plane.__wrapped__(pts, valid, cfg)
        return DenseFrameResult(pts, valid, plane, ok, disp, jnp.sum(valid))

    res = jax.vmap(one)(base_b, match_b, geom_pack_b)
    mean_plane = jnp.nanmean(res.plane, axis=0)
    return res, mean_plane


def stack_geom_packs(packs: Sequence[dict]) -> dict:
    """Stack per-frame geom_pack dicts (build_geom_pack) along a new frame
    axis for _batched_frames."""
    keys = packs[0].keys()
    return {k: jnp.stack([p[k] for p in packs]) for k in keys}


class ShardedDenseRunner:
    """Runs batches of frame pairs sharded across the device mesh.

    Each frame carries its own geometry (geom_pack entries are batched);
    fixed-rig sequences simply feed identical packs."""

    def __init__(self, mesh: Mesh, cfg: DenseStereoConfig):
        self.mesh = mesh
        self.cfg = cfg
        self.fsh = NamedSharding(mesh, P("frame"))

    @property
    def batch_size(self) -> int:
        return self.mesh.shape["frame"]

    def run_batch(self, base_img, match_img, geom_packs: Sequence[dict]):
        """base_img/match_img: (F, H, W) undistorted images in base/match
        roles; geom_packs: one build_geom_pack dict per frame."""
        put = lambda x: jax.device_put(np.asarray(x), self.fsh)
        gp = jax.device_put(
            jax.tree.map(np.asarray, stack_geom_packs(geom_packs)), self.fsh
        )
        return _batched_frames(put(base_img), put(match_img), gp, self.cfg)


def initialize_multihost(coordinator: Optional[str] = None, num_processes: Optional[int] = None, process_id: Optional[int] = None):
    """jax.distributed bootstrap for pod slices; no-op on a single host."""
    if coordinator is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator, num_processes=num_processes, process_id=process_id
    )
    return True
