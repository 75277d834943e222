"""Device mesh and sharding layout.

The model (~270M params) fits on one chip, so the production layout is pure
data parallelism over a 1-D ("data",) mesh — the TPU-native replacement for
the reference's DDP/NCCL stack (SURVEY.md §2.11):

  * params + optimizer state: replicated,
  * batch: sharded on axis 0,
  * gradient all-reduce / SyncBN statistics / loss logging reductions: all
    emitted automatically by GSPMD from these shardings (no explicit
    collectives anywhere in model code).

Multi-host: `jax.distributed.initialize()` then the same code path —
`create_mesh` uses all global devices and each host feeds its own batch
shard (TrainLoader shard_index/shard_count).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(devices=None, axis_name: str = "data") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def create_mesh_for_batch(global_batch: int, devices=None,
                          axis_name: str = "data") -> Mesh:
    """Mesh over the largest device prefix whose size divides the batch."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    while n > 1 and global_batch % n != 0:
        n -= 1
    return Mesh(np.asarray(devices[:n]), (axis_name,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(mesh.axis_names[0]))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Device-put a host batch dict, sharding axis 0 across the mesh."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def create_mesh_2d(devices=None, space: int = 2,
                   axis_names=("data", "space")) -> Mesh:
    """2-D mesh: data parallelism x width-axis spatial parallelism.

    The model fits one chip, so `space` only matters when a single sample's
    activations don't (oversized eval images) or to demonstrate composed
    dp x sp shardings; grads/BN reductions span both axes automatically."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    assert n % space == 0, (n, space)
    return Mesh(np.asarray(devices).reshape(n // space, space), axis_names)


def shard_batch_2d(batch: dict, mesh: Mesh) -> dict:
    """Shard a train batch on a ("data", "space") mesh: axis 0 over data,
    the width axis over space (img is NHWC; dense per-pixel targets are
    (B, H, W))."""
    data_ax, space_ax = mesh.axis_names

    def put(x):
        if x.ndim == 4:      # img NHWC
            spec = P(data_ax, None, space_ax, None)
        elif x.ndim == 3:    # depth_gt / pe_k_gt (B, H, W)
            spec = P(data_ax, None, space_ax)
        else:                # cam_height (B,)
            spec = P(data_ax)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, batch)


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """Shard NHWC images over the WIDTH axis (sequence/spatial parallelism).

    For images too large for one chip's HBM at eval, place the input with
    this sharding and run the ordinary jitted forward: GSPMD propagates the
    spatial partition through convs (halo exchanges), window attention and
    the neck, inserting collectives automatically — verified numerically
    equal to the replicated forward on an 8-device mesh (SURVEY.md §5.7:
    spatial sharding of the HxW grid is this model family's honest analogue
    of sequence parallelism)."""
    return NamedSharding(mesh, P(None, None, mesh.axis_names[0], None))
