"""HAHI projection-native (flane) lane path == raw-layout windowed path.

The flane path changes only LAYOUT, never math: _LaneDense keeps the exact
nn.Dense parameter tree (kernel (C, F), bias (F,)), the offset/weight
projections emit the Pallas kernel's block layout directly, and the window
anchors fold in inside msda_windowed_levels_flanes. These tests pin:
  * identical param trees between GEDEPTH_MSDA_FLANE=0 and the lane path,
  * forward parity for 'windowed' and 'windowed_compat' (multi-grid
    self-attention included — the hi stage's query set),
  * gradient parity w.r.t. params AND inputs through the custom VJP,
  * compat clamp-mass metric parity at nonzero clamp fractions.
Runs the kernel through the Pallas CPU interpreter (GEDEPTH_MSDA_FLANE=
interpret); on-TPU numerics are covered by tests/test_pallas_kernels.py.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gedepth_tpu.models.hahi import MSDeformAttention

B, C, H_HEADS, P, R = 1, 64, 4, 4, 4
SPATIAL = ((16, 64), (8, 32))          # both grids kernel-eligible (TH*TW=128)
L = len(SPATIAL)


def _rand_params(params, key, scale=0.05):
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(key, len(leaves))
    out = [l + scale * jax.random.normal(k, l.shape, l.dtype)
           for l, k in zip(leaves, keys)]
    return jax.tree_util.tree_unflatten(treedef, out)


def _inputs(query_shapes, seed=0):
    rng = np.random.default_rng(seed)
    nq = sum(a * b for a, b in query_shapes)
    nv = sum(a * b for a, b in SPATIAL)
    q = jnp.asarray(rng.standard_normal((B, nq, C)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, nv, C)).astype(np.float32))
    qpos = jnp.asarray(rng.standard_normal((1, nq, C)).astype(np.float32))
    # random reference points spread over the image -> nonzero clamp mass
    ref = jnp.asarray(rng.uniform(0.05, 0.95, (nq, L, 2)).astype(np.float32))
    return q, v, qpos, ref


@pytest.mark.parametrize("sampling,query_shapes", [
    ("windowed", SPATIAL),              # hi self-attn: multi-grid queries
    ("windowed", ((16, 64),)),          # ha cross-attn: single query grid
    ("windowed_compat", SPATIAL),
    ("windowed_compat", ((16, 64),)),
])
def test_flane_matches_raw_forward_and_grads(monkeypatch, sampling,
                                             query_shapes):
    q, v, qpos, ref = _inputs(query_shapes)
    m = MSDeformAttention(embed_dims=C, num_heads=H_HEADS, num_levels=L,
                          num_points=P, dropout=0.0, sampling=sampling,
                          window_radius=R)
    kw = dict(spatial_shapes=SPATIAL, deterministic=True,
              query_shapes=query_shapes)

    monkeypatch.setenv("GEDEPTH_MSDA_FLANE", "0")
    params = m.init(jax.random.PRNGKey(0), q, v, qpos, ref, **kw)
    monkeypatch.setenv("GEDEPTH_MSDA_FLANE", "interpret")
    params_f = m.init(jax.random.PRNGKey(0), q, v, qpos, ref, **kw)

    # identical parameter trees (names, shapes, init values): converted
    # reference checkpoints load into either path unchanged
    flat_r = jax.tree_util.tree_leaves_with_path(params)
    flat_f = jax.tree_util.tree_leaves_with_path(params_f)
    assert [p for p, _ in flat_r] == [p for p, _ in flat_f]
    for (_, lr), (_, lf) in zip(flat_r, flat_f):
        np.testing.assert_array_equal(np.asarray(lr), np.asarray(lf))

    # move params off the zero-init point so offsets/weights are live
    params = _rand_params(params, jax.random.PRNGKey(7))

    def loss(p, q_, v_, env):
        monkeypatch.setenv("GEDEPTH_MSDA_FLANE", env)
        out = m.apply(p, q_, v_, qpos, ref, **kw)
        return jnp.sum(out ** 2), out

    (_, out_raw), g_raw = jax.value_and_grad(loss, argnums=(0, 1, 2),
                                             has_aux=True)(
        params, q, v, "0")
    (_, out_fl), g_fl = jax.value_and_grad(loss, argnums=(0, 1, 2),
                                           has_aux=True)(
        params, q, v, "interpret")

    np.testing.assert_allclose(np.asarray(out_fl), np.asarray(out_raw),
                               rtol=2e-4, atol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_fl),
                    jax.tree_util.tree_leaves(g_raw)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


def test_flane_compat_clamp_mass_matches_raw(monkeypatch):
    query_shapes = SPATIAL
    q, v, qpos, ref = _inputs(query_shapes, seed=3)
    m = MSDeformAttention(embed_dims=C, num_heads=H_HEADS, num_levels=L,
                          num_points=P, dropout=0.0,
                          sampling="windowed_compat", window_radius=R)
    kw = dict(spatial_shapes=SPATIAL, deterministic=True,
              query_shapes=query_shapes)
    monkeypatch.setenv("GEDEPTH_MSDA_FLANE", "0")
    params = _rand_params(m.init(jax.random.PRNGKey(0), q, v, qpos, ref,
                                 **kw), jax.random.PRNGKey(5))
    _, inter_raw = m.apply(params, q, v, qpos, ref, **kw,
                           mutable=["intermediates"])
    monkeypatch.setenv("GEDEPTH_MSDA_FLANE", "interpret")
    _, inter_fl = m.apply(params, q, v, qpos, ref, **kw,
                          mutable=["intermediates"])
    mass_raw = float(inter_raw["intermediates"]["compat_clamp_mass"][0])
    mass_fl = float(inter_fl["intermediates"]["compat_clamp_mass"][0])
    assert mass_raw > 0.05, "fixture should clamp a visible mass fraction"
    np.testing.assert_allclose(mass_fl, mass_raw, rtol=1e-4)
