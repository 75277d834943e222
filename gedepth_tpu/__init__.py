"""GEDepth-TPU: a TPU-native monocular depth estimation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of qcraftai/gedepth
(GEDepth, ICCV 2023): supervised monocular depth estimation with a
ground-embedding (plane-embedding, "PE") prior, built around the DepthFormer
architecture (Swin encoder + conv stem + HAHI deformable-attention neck +
DenseDepth decoder).

Design notes (TPU-first, not a port):
  * NHWC tensor layout everywhere (XLA TPU-native conv layout).
  * flax.linen modules, pure-functional train/eval steps under jax.jit.
  * Data parallelism via jax.sharding.Mesh + NamedSharding (GSPMD); batch-norm
    statistics are globally correct under GSPMD (SyncBN parity for free).
  * Hot ops (window attention, PE slope fusion, deformable attention sampling)
    have Pallas TPU kernels with XLA reference implementations for parity.
  * Static shapes: eval runs at a fixed padded shape; TTA flip is a batched
    axis, not a python loop.
"""

__version__ = "0.1.0"
