"""Model composition tests (tiny shapes, CPU)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gedepth_tpu.configs import get_config
from gedepth_tpu.models import (
    GEDepth, DepthFormerSwin, HAHINeck, LightPEMaskNeck, DynamicPENeckSoft,
    DenseDepthHead, sigloss, softmax_ce_ignore)

pytestmark = pytest.mark.slow  # compile-heavy: full-model jits (test tiers, NOTES r4)


TINY = dict(embed_dims=32, depths=(1, 1, 2, 1), num_heads=(1, 2, 4, 8),
            neck_channels=(64, 32, 64, 128, 256), neck_embed_dim=64,
            neck_num_points=4, drop_path_rate=0.1)


def _img(b=1, h=64, w=96, c=5, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.standard_normal((b, h, w, c)).astype(np.float32)
    if c == 5:
        img[..., 3] = np.abs(img[..., 3]) * 0.2          # pe/scale channel
        img[..., 4] = np.abs(img[..., 4]) * 30 + 1.0     # raw pe channel
    return jnp.asarray(img)


def test_backbone_pyramid_shapes():
    m = DepthFormerSwin(embed_dims=32, depths=(1, 1, 2, 1),
                        num_heads=(1, 2, 4, 8), use_pe=True)
    img = _img()
    params = m.init(jax.random.PRNGKey(0), img)
    outs = m.apply(params, img)
    shapes = [tuple(o.shape) for o in outs]
    assert shapes == [
        (1, 32, 48, 64),   # stem /2
        (1, 16, 24, 32),   # /4
        (1, 8, 12, 64),    # /8
        (1, 4, 6, 128),    # /16
        (1, 2, 3, 256),    # /32
    ]


def test_gedepth_adaptive_forward_and_losses():
    model = GEDepth(pe_variant="adaptive", **TINY)
    img = _img()
    ch = jnp.asarray([1.65], dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img, ch)
    out = model.apply(params, img, ch)
    assert out["depth"].shape == (1, 32, 48, 1)
    assert out["y"].shape == (1, 64, 96, 1)
    assert out["slope_logits"].shape == (1, 64, 96, 11)
    assert np.isfinite(np.asarray(out["depth"])).all()
    # y is a sigmoid mask
    y = np.asarray(out["y"])
    assert (y >= 0).all() and (y <= 1).all()

    # losses are finite scalars
    gt = jnp.abs(_img(1, 64, 96, 1, seed=3)) * 10
    l1 = sigloss(jax.image.resize(out["depth"], (1, 64, 96, 1), "linear"), gt)
    labels = jnp.full((1, 64, 96), 4.0)
    l2 = softmax_ce_ignore(out["slope_logits"], labels)
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))


def test_gedepth_vanilla_uses_input_pe():
    model = GEDepth(pe_variant="vanilla", **TINY)
    img = _img()
    params = model.init(jax.random.PRNGKey(0), img)
    out = model.apply(params, img)
    assert out["slope_logits"] is None
    pe_mask = np.asarray(out["pe_mask"])
    y = np.asarray(out["y"])
    want = np.asarray(img[..., 3:4]) * y * 200.0
    np.testing.assert_allclose(pe_mask, want, rtol=1e-5, atol=1e-5)


def test_gedepth_none_variant_rgb_only():
    model = GEDepth(pe_variant="none", **TINY)
    img = _img(c=3)
    params = model.init(jax.random.PRNGKey(0), img)
    out = model.apply(params, img)
    assert out["y"] is None and out["pe_mask"] is None
    assert out["depth"].shape == (1, 32, 48, 1)
    # depth = relu(conv)+min_depth >= min_depth
    assert np.asarray(out["depth"]).min() >= 1e-3 - 1e-7


def test_predict_depth_clamps_and_resizes():
    model = GEDepth(pe_variant="adaptive", **TINY)
    img = _img()
    params = model.init(jax.random.PRNGKey(0), img)
    depth = model.apply(params, img, method=GEDepth.predict_depth)
    assert depth.shape == (1, 64, 96, 1)
    d = np.asarray(depth)
    assert d.min() >= 1e-3 - 1e-6 and d.max() <= 80.0 + 1e-4


def test_train_mode_runs_with_dropout_rngs():
    model = GEDepth(pe_variant="adaptive", **TINY)
    img = _img(b=2)
    ch = jnp.asarray([1.65, 1.55], dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img, ch)
    out, mutated = model.apply(
        variables, img, ch, True,
        rngs={"dropout": jax.random.PRNGKey(1)},
        mutable=["batch_stats"])
    assert "batch_stats" in mutated
    assert np.isfinite(np.asarray(out["depth"])).all()


def test_sigloss_matches_torch_semantics():
    import torch
    rng = np.random.default_rng(0)
    pred = np.abs(rng.standard_normal((2, 8, 8, 1))).astype(np.float32) + 0.1
    gt = np.abs(rng.standard_normal((2, 8, 8, 1))).astype(np.float32)
    gt[gt < 0.5] = 0.0  # invalid pixels
    got = float(sigloss(jnp.asarray(pred), jnp.asarray(gt)))

    p, g = torch.from_numpy(pred), torch.from_numpy(gt)
    vm = g > 0
    pi, gi = p[vm], g[vm]
    diff = torch.log(pi + 1e-3) - torch.log(gi + 1e-3)
    want = float(torch.sqrt(torch.var(diff) + 0.15 * torch.mean(diff) ** 2))
    assert got == pytest.approx(want, rel=1e-5)


def test_softmax_ce_matches_torch():
    import torch
    rng = np.random.default_rng(1)
    logits = rng.standard_normal((1, 4, 6, 11)).astype(np.float32)
    labels = rng.integers(0, 11, size=(1, 4, 6)).astype(np.float32)
    labels[0, 0, :3] = 255
    got = float(softmax_ce_ignore(jnp.asarray(logits), jnp.asarray(labels)))
    t_logits = torch.from_numpy(logits.transpose(0, 3, 1, 2))
    t_labels = torch.from_numpy(labels).long()
    want = float(torch.nn.CrossEntropyLoss(ignore_index=255)(
        t_logits, t_labels))
    assert got == pytest.approx(want, rel=1e-5)


def test_smoke_config_builds():
    cfg = get_config("smoke_synthetic")
    model = cfg.model.build()
    img = _img(1, 96, 192, 5)
    params = model.init(jax.random.PRNGKey(0), img)
    out = model.apply(params, img)
    assert out["depth"].shape == (1, 48, 96, 1)


def test_swin_scan_pairs_matches_loop():
    """scan_pairs=True with stacked params reproduces the per-block loop
    exactly (eval mode); stack_swin_params adapts the checkpoint layout."""
    import jax
    import jax.numpy as jnp
    from gedepth_tpu.models.swin import DepthFormerSwin, stack_swin_params

    depths = (2, 4)
    kw = dict(embed_dims=16, depths=depths, num_heads=(2, 4), window=4,
              use_pe=False, drop_path_rate=0.2)
    loop = DepthFormerSwin(**kw)
    scan = DepthFormerSwin(scan_pairs=True, **kw)

    img = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 32, 48, 3)).astype(np.float32))
    vs = loop.init(jax.random.PRNGKey(0), img)
    stacked = stack_swin_params(vs["params"], depths)
    # sanity: the scan model accepts exactly this tree
    scan_shapes = jax.tree.map(
        lambda x: x.shape,
        scan.init(jax.random.PRNGKey(0), img)["params"])
    got_shapes = jax.tree.map(lambda x: x.shape, stacked)
    assert scan_shapes == got_shapes

    outs_a = loop.apply({"params": vs["params"],
                         "batch_stats": vs["batch_stats"]}, img)
    outs_b = scan.apply({"params": stacked,
                         "batch_stats": vs["batch_stats"]}, img)
    for a, b in zip(outs_a, outs_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_hi_min_level_same_params_different_semantics():
    """hi_min_level=1 (HI self-attention queries start at the second
    transformer level, Mask2Former-pixel-decoder style) must keep the
    EXACT parameter tree of hi_min_level=0 — the query-side Denses are
    per-token — while changing the forward, and grads must still reach
    the self-attention parameters (via the coarser-level queries)."""
    import dataclasses
    import jax.numpy as jnp
    cfg = get_config("smoke_synthetic")
    m0 = dataclasses.replace(cfg.model, neck_sampling="windowed").build()
    m1 = dataclasses.replace(cfg.model, neck_sampling="windowed",
                             neck_hi_min_level=1).build()
    img = _img(1, 96, 192, 5)
    ch = jnp.full((1,), 1.65, jnp.float32)
    v0 = m0.init(jax.random.PRNGKey(0), img, ch)
    v1 = m1.init(jax.random.PRNGKey(0), img, ch)
    assert (jax.tree.map(lambda x: x.shape, v0)
            == jax.tree.map(lambda x: x.shape, v1))

    d0 = np.asarray(m0.apply(v0, img, ch, method=m0.predict_depth))
    d1 = np.asarray(m1.apply(v0, img, ch, method=m1.predict_depth))
    assert d0.shape == d1.shape and np.isfinite(d1).all()
    assert np.abs(d0 - d1).mean() > 0  # semantics actually differ

    def loss(p):
        out, _ = m1.apply({"params": p, "batch_stats": v1["batch_stats"]},
                          img, ch, True,
                          rngs={"dropout": jax.random.PRNGKey(1)},
                          mutable=["batch_stats"])
        return sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(out))

    g = jax.grad(loss)(v1["params"])
    off_g = g["neck"]["self_attn"]["sampling_offsets"]["kernel"]
    assert float(jnp.abs(off_g).sum()) > 0


def test_all_presets_build():
    """Every named preset constructs its model module (catches config/
    model-attribute drift without paying init/compile cost)."""
    from gedepth_tpu.configs import get_config
    from gedepth_tpu.configs.presets import _PRESETS

    for name in _PRESETS:
        cfg = get_config(name)
        model = cfg.model.build()
        assert model is not None, name
