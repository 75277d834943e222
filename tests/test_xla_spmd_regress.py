"""Regression watch for an upstream XLA SPMD partitioner bug (jax 0.9.0).

Minimized finding (round 3): take a conv whose input is SPATIALLY sharded
(H or W over a mesh axis) and shard any downstream weight over a different
mesh axis (tensor parallelism). The conv KERNEL gradient comes back
multiplied by exactly the spatial axis size — under both the Shardy and
legacy GSPMD partitioners — while the loss, the dense grad, and every
pairwise composition (dp x sp, dp x tp) stay exact.

Because of this, `shard_batch_3d` defaults to hierarchical DP (batch over
data AND space) when composing with TP. If `test_sp_tp_conv_grad_bug_watch`
starts XPASSing after a jax upgrade, the upstream bug is fixed: flip
`shard_batch_3d(spatial=True)` back on for training and delete the
workaround note.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs 4 (virtual) devices")


def _setup():
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.standard_normal((3, 3, 4, 8)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((8, 16, 24, 4)).astype(np.float32))
    w2 = jnp.asarray(rng.standard_normal((8, 16)).astype(np.float32))

    def f(kernel, dense, inp):
        y = jax.lax.conv_general_dilated(
            inp, kernel, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = jnp.maximum(y, 0.0)
        return jnp.mean((y @ dense) ** 2)

    g = jax.jit(jax.grad(f, argnums=(0, 1)))
    gk_ref, gd_ref = jax.device_get(g(k, w2, x))
    return g, k, x, w2, np.linalg.norm(gk_ref), np.linalg.norm(gd_ref)


def test_dp_space_fold_with_tp_is_exact():
    """The shipped workaround: batch over (data, space) jointly + TP."""
    g, k, x, w2, ref_k, ref_d = _setup()
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 1, 2),
                ("data", "space", "model"))
    gk, gd = jax.device_get(g(
        jax.device_put(k, NamedSharding(mesh, P())),
        jax.device_put(w2, NamedSharding(mesh, P(None, "model"))),
        jax.device_put(x, NamedSharding(
            mesh, P(("data", "space"), None, None, None)))))
    np.testing.assert_allclose(np.linalg.norm(gk), ref_k, rtol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(gd), ref_d, rtol=1e-5)


@pytest.mark.xfail(strict=False,
                   reason="upstream XLA SPMD conv-weight-grad double count "
                   "when spatial sharding composes with tensor parallelism "
                   "(jax 0.9.0, Shardy and legacy GSPMD)")
def test_sp_tp_conv_grad_bug_watch():
    g, k, x, w2, ref_k, _ = _setup()
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2),
                ("space", "model"))
    gk, _ = jax.device_get(g(
        jax.device_put(k, NamedSharding(mesh, P())),
        jax.device_put(w2, NamedSharding(mesh, P(None, "model"))),
        jax.device_put(x, NamedSharding(
            mesh, P(None, None, "space", None)))))
    # exact when the upstream bug is fixed; today it returns 2x
    np.testing.assert_allclose(np.linalg.norm(gk), ref_k, rtol=1e-5)
