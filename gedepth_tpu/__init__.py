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

import os as _os


def _enable_compilation_cache():
    """Persistent XLA compilation cache (set GEDEPTH_NO_COMPILE_CACHE=1 to
    opt out). Swin-L at eval resolution takes tens of minutes to compile over
    a remote-TPU tunnel; the cache makes every later process start warm."""
    if _os.environ.get("GEDEPTH_NO_COMPILE_CACHE") == "1":
        return
    try:
        import jax

        path = _os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               _os.path.expanduser("~/.cache/jax_comp"))
        _os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


def _honor_platform_env():
    """Make JAX_PLATFORMS=cpu actually work under the axon remote-TPU
    plugin: the plugin registers itself regardless of the env var, so the
    only reliable override is the in-process config update — applied here
    (before any backend initialises) so every CLI tool and test honors the
    env var without its own boilerplate."""
    plat = _os.environ.get("JAX_PLATFORMS", "")
    if plat and "axon" not in plat:
        try:
            import jax

            jax.config.update("jax_platforms", plat)
        except Exception:  # pragma: no cover - best-effort
            pass


_enable_compilation_cache()
_honor_platform_env()
