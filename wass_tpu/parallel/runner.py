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


@partial(jax.jit, static_argnames=("cfg",))
def _batched_frames(base_rect_b, match_rect_b, base_b, match_b, geom_pack, cfg: DenseStereoConfig):
    """vmapped staged pipeline over a leading frame axis.  Under a frame
    sharding, XLA partitions every stage along that axis."""

    def one(br, mr, bi, mi):
        disp = _stage_disparity.__wrapped__(br, mr, cfg)
        pts, valid = _stage_points.__wrapped__(disp, geom_pack, br, mr, cfg)
        plane, ok, valid = _stage_plane.__wrapped__(pts, valid, cfg)
        return DenseFrameResult(pts, valid, plane, ok, disp, jnp.sum(valid))

    res = jax.vmap(one)(base_rect_b, match_rect_b, base_b, match_b)
    mean_plane = jnp.nanmean(res.plane, axis=0)
    return res, mean_plane


class ShardedDenseRunner:
    """Runs batches of frame pairs sharded across the device mesh.

    All frames of a batch share the rectification geometry (fixed rig);
    per-frame geometries would simply become batched geom_pack entries.
    """

    def __init__(self, mesh: Mesh, cfg: DenseStereoConfig, geom_pack: dict):
        self.mesh = mesh
        self.cfg = cfg
        self.geom_pack = jax.device_put(geom_pack, NamedSharding(mesh, P()))
        self.fsh = NamedSharding(mesh, P("frame"))

    @property
    def batch_size(self) -> int:
        return self.mesh.shape["frame"]

    def run_batch(self, base_rect, match_rect, base_img, match_img):
        put = lambda x: jax.device_put(np.asarray(x), self.fsh)
        return _batched_frames(
            put(base_rect), put(match_rect), put(base_img), put(match_img),
            self.geom_pack, self.cfg,
        )


def initialize_multihost(coordinator: Optional[str] = None, num_processes: Optional[int] = None, process_id: Optional[int] = None):
    """jax.distributed bootstrap for pod slices; no-op on a single host."""
    if coordinator is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator, num_processes=num_processes, process_id=process_id
    )
    return True
