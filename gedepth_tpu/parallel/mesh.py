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
    """Device-put a host batch dict, sharding axis 0 across the mesh.

    Multi-host: each process passes only its LOCAL rows (TrainLoader
    shard_index/shard_count) and the global array is assembled from the
    per-process shards (the analogue of the reference's DistributedSampler
    feeding each rank its slice, depth/datasets/builder.py:123-125)."""
    sharding = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), batch)
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


def create_mesh_3d(devices=None, shape=(2, 2, 2),
                   axis_names=("data", "space", "model")) -> Mesh:
    """3-D mesh: data x spatial x tensor parallelism.

    Beyond-reference capability (the reference ships DP only, SURVEY.md
    §2.11): the "model" axis carries Megatron-style tensor parallelism of
    the transformer blocks (see `tp_param_shardings`). Lay the mesh out so
    "model" maps to the innermost (fastest-ICI) physical axis — it carries
    the per-layer all-reduces."""
    devices = devices if devices is not None else jax.devices()
    n = int(np.prod(shape))
    assert len(devices) >= n, (len(devices), shape)
    return Mesh(np.asarray(devices[:n]).reshape(shape), axis_names)


# Megatron-style TP layout for transformer blocks (path-substring -> spec):
# qkv / FFN-in are column-parallel (output features sharded), proj / FFN-out
# are row-parallel (input features sharded). GSPMD then emits exactly one
# all-reduce per block half, and keeps attention + GELU fully local when the
# sharded dim divides; anything unmatched stays replicated.
_TP_RULES = (
    ("attn/qkv/kernel", (None, "model")),
    ("attn/qkv/bias", ("model",)),
    ("attn/proj/kernel", ("model", None)),
    ("ffn/Dense_0/kernel", (None, "model")),
    ("ffn/Dense_0/bias", ("model",)),
    ("ffn/Dense_1/kernel", ("model", None)),
)


def tp_param_shardings(tree, mesh: Mesh, model_axis: str = "model"):
    """PartitionSpec pytree for `tree` (params, or an optimizer-state tree
    that mirrors param paths, e.g. Adam mu/nu) sharding transformer weights
    over `model_axis`. Leaves whose matched dim does not divide the axis
    size, and all unmatched leaves, are replicated."""
    import jax.tree_util as jtu

    size = dict(zip(mesh.axis_names, mesh.devices.shape))[model_axis]

    def spec_for(path, leaf):
        name = "/".join(
            str(getattr(k, "key", getattr(k, "name", k))) for k in path)
        for pat, axes in _TP_RULES:
            if name.endswith(pat) and leaf.ndim == len(axes):
                dim = axes.index("model")
                if leaf.shape[dim] % size == 0:
                    return P(*[model_axis if a == "model" else None
                               for a in axes])
        return P()

    return jtu.tree_map_with_path(spec_for, tree)


def shard_state_tp(state, mesh: Mesh, model_axis: str = "model"):
    """Device-put a TrainState with TP param layout: params and the
    param-shaped optimizer-state trees follow `tp_param_shardings`
    (path-rule matching works on mu/nu because optax mirrors param paths);
    everything else is replicated. The jitted train step then propagates
    these layouts (GSPMD inserts the TP all-reduces)."""
    def put_tree(tree):
        specs = tp_param_shardings(tree, mesh, model_axis)
        return jax.tree.map(
            lambda x, s: jax.device_put(jnp_asarray(x),
                                        NamedSharding(mesh, s)),
            tree, specs)

    rep = replicated_sharding(mesh)
    return state.replace(
        step=jax.device_put(state.step, rep),
        params=put_tree(state.params),
        batch_stats=jax.tree.map(
            lambda x: jax.device_put(jnp_asarray(x), rep),
            state.batch_stats),
        # optax mu/nu leaf paths end with the same param path, so the same
        # rule tree shards them; counts/scalars fall through to replicated
        opt_state=put_tree(state.opt_state),
    )


def jnp_asarray(x):
    import jax.numpy as jnp
    return x if hasattr(x, "sharding") else jnp.asarray(x)


def shard_batch_3d(batch: dict, mesh: Mesh, spatial: bool = False) -> dict:
    """Shard a train batch on a ("data", "space", "model") mesh.

    Default (spatial=False): batch axis 0 over BOTH data and space
    (hierarchical DP) — the safe composition with tensor parallelism.
    spatial=True width-shards over "space" instead. DO NOT train with it
    while TP is active: spatially sharding a conv's input while any
    downstream weight is sharded over a third mesh axis makes XLA double-
    count the conv weight gradient (exactly x space-axis-size; both the
    Shardy and legacy GSPMD partitioners, jax 0.9.0). Minimized repro +
    regression watch: tests/test_xla_spmd_regress.py. Forward/eval is
    unaffected, and dp x sp without TP is verified exact."""
    data_ax, space_ax = mesh.axis_names[0], mesh.axis_names[1]
    batch_spec = (P(data_ax) if spatial else P((data_ax, space_ax)))

    def put(x):
        if x.ndim == 4:
            spec = (P(data_ax, None, space_ax, None) if spatial
                    else P((data_ax, space_ax), None, None, None))
        elif x.ndim == 3:
            spec = (P(data_ax, None, space_ax) if spatial
                    else P((data_ax, space_ax), None, None))
        else:
            spec = batch_spec
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
