"""Model-zoo components: ResNet, Adabins, BTS, extra datasets."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gedepth_tpu.models.resnet import ResNet
from gedepth_tpu.models.adabins import AdabinsHead
from gedepth_tpu.models.bts import BTSHead, local_planar_guidance

pytestmark = pytest.mark.slow  # compile-heavy: full-model jits (test tiers, NOTES r4)


def test_resnet50_pyramid_shapes():
    m = ResNet(depth=50)
    x = jnp.zeros((1, 64, 96, 3), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(variables, x)
    assert [tuple(o.shape) for o in outs] == [
        (1, 16, 24, 256), (1, 8, 12, 512), (1, 4, 6, 1024), (1, 2, 3, 2048)]


def test_resnet18_runs():
    m = ResNet(depth=18)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(variables, x)
    assert outs[-1].shape == (1, 1, 1, 512)


def test_adabins_head_output_in_depth_range():
    head = AdabinsHead(up_sample_channels=(16, 32, 64), channels=16,
                       n_bins=32, patch_size=4, min_depth=1e-3, max_depth=10)
    feats = [jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 32 // (2 ** i), 48 // (2 ** i), c)).astype(np.float32))
        for i, c in enumerate((16, 32, 64))]
    variables = head.init(jax.random.PRNGKey(0), feats)
    depth, edges = head.apply(variables, feats)
    assert depth.shape == (1, 32, 48, 1)
    d = np.asarray(depth)
    assert d.min() >= 1e-3 - 1e-5 and d.max() <= 10 + 1e-4
    e = np.asarray(edges)
    assert e.shape == (1, 33)
    assert (np.diff(e, axis=1) >= 0).all()   # monotone bin edges
    assert e[0, -1] == pytest.approx(10.0, rel=1e-3)


def test_local_planar_guidance_flat_plane():
    """A fronto-parallel plane (normal = +z, dist = d) gives depth d."""
    B, h, w = 1, 3, 4
    eq = np.zeros((B, h, w, 4), np.float32)
    eq[..., 2] = 1.0   # n3 = 1
    eq[..., 3] = 5.0   # dist
    depth = np.asarray(local_planar_guidance(jnp.asarray(eq), 4))
    assert depth.shape == (B, h * 4, w * 4)
    np.testing.assert_allclose(depth, 5.0, rtol=1e-6)


def test_bts_head_forward():
    head = BTSHead(in_channels=(8, 16, 32, 64, 128), num_features=64,
                   max_depth=10.0)
    rng = np.random.default_rng(1)
    shapes = [(1, 32, 48, 8), (1, 16, 24, 16), (1, 8, 12, 32),
              (1, 4, 6, 64), (1, 2, 3, 128)]
    feats = [jnp.asarray(rng.standard_normal(s).astype(np.float32))
             for s in shapes]
    variables = head.init(jax.random.PRNGKey(0), feats)
    out = head.apply(variables, feats)
    assert out.shape == (1, 64, 96, 1)
    assert np.isfinite(np.asarray(out)).all()
    assert np.asarray(out).min() >= 1e-3 - 1e-6


def test_extra_datasets_split_parsing(tmp_path):
    from gedepth_tpu.data.extra_datasets import (
        NYUDataset, CustomDepthDataset)
    from PIL import Image
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(rng.integers(0, 255, (20, 30, 3), dtype=np.uint8)
                        ).save(img_dir / f"im{i}.png")
        Image.fromarray(rng.integers(0, 5000, (20, 30), dtype=np.uint16)
                        ).save(img_dir / f"d{i}.png")
    split = tmp_path / "split.txt"
    split.write_text("".join(f"imgs/im{i}.png imgs/d{i}.png\n"
                             for i in range(3)))
    ds = NYUDataset(str(tmp_path), str(split))
    assert len(ds) == 3
    s = ds[0]
    assert s["img"].shape == (20, 30, 3)
    assert s["depth_gt"].shape == (20, 30)
    assert s["depth_gt"].max() <= 5000 / 1000.0

    cds = CustomDepthDataset(str(img_dir))
    assert len(cds) == 6  # all pngs
    assert cds[0]["img"].shape == (20, 30, 3)


def test_timm_efficientnet_b5_endpoints():
    """tf_b5 must emit the reference AdaBins endpoints — channels
    (24, 40, 64, 176, 2048) at strides /2 /4 /8 /16 /32 (reference
    efficientnet.py out_index=[4,5,6,8,11], adabins.py in_channels)."""
    from gedepth_tpu.models.efficientnet import TimmEfficientNet
    m = TimmEfficientNet("tf_b5")
    x = jnp.zeros((1, 64, 96, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(v, x)
    assert [tuple(o.shape) for o in outs] == [
        (1, 32, 48, 24), (1, 16, 24, 40), (1, 8, 12, 64),
        (1, 4, 6, 176), (1, 2, 3, 2048)]
    n = sum(p.size for p in jax.tree.leaves(v["params"]))
    assert 25e6 < n < 35e6  # b5 trunk ~28M


def test_hrnet_w18_pyramid():
    from gedepth_tpu.models.hrnet import HRNet
    m = HRNet("w18")
    x = jnp.zeros((1, 64, 96, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(v, x)
    assert [tuple(o.shape) for o in outs] == [
        (1, 16, 24, 18), (1, 8, 12, 36), (1, 4, 6, 72), (1, 2, 3, 144)]
    # param count sanity: W18 trunk is ~9.6M
    n = sum(p.size for p in jax.tree.leaves(v["params"]))
    assert 8e6 < n < 12e6


def test_efficientnet_b0_endpoints():
    from gedepth_tpu.models.efficientnet import EfficientNet
    m = EfficientNet("b0")
    x = jnp.zeros((1, 128, 192, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(v, x)
    assert [tuple(o.shape) for o in outs] == [
        (1, 32, 48, 24), (1, 16, 24, 40), (1, 8, 12, 112), (1, 4, 6, 320)]


def test_ddrnet_dual_resolution():
    from gedepth_tpu.models.ddrnet import DualResNet
    m = DualResNet(planes=8, spp_planes=16, out_planes=32)
    x = jnp.zeros((1, 128, 192, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    # single /8 feature map (reference ddrnet.py:350-352 contract)
    assert out.shape == (1, 16, 24, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_binsformer_head_layers():
    from gedepth_tpu.models.binsformer import BinsFormerHead
    rng = np.random.default_rng(0)
    shapes = [(1, 32, 48, 8), (1, 16, 24, 16), (1, 8, 12, 32),
              (1, 4, 6, 64), (1, 2, 3, 128)]
    feats = [jnp.asarray(rng.standard_normal(s).astype(np.float32))
             for s in shapes]
    head = BinsFormerHead(in_channels=(8, 16, 32, 64, 128), conv_dim=32,
                          n_bins=16, num_encoder_layers=1,
                          num_decoder_layers=3, num_heads=4)
    v = head.init(jax.random.PRNGKey(0), feats)
    outs = head.apply(v, feats)
    assert len(outs) == 3
    last = outs[-1]
    assert last["depth"].shape == (1, 32, 48, 1)
    assert last["bin_edges"].shape == (1, 17)
    assert last["class_logits"].shape == (1, 25)
    e = np.asarray(last["bin_edges"])
    assert (np.diff(e, axis=1) >= -1e-6).all()


def test_pac_equals_conv_with_constant_guide():
    from gedepth_tpu.models.experiment_heads import pixel_adaptive_conv
    import jax.lax as lax
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 8, 10, 4)).astype(np.float32))
    guide = jnp.ones((1, 8, 10, 3), jnp.float32)
    kern = jnp.asarray(rng.standard_normal((3, 3, 4, 5)).astype(np.float32))
    out = pixel_adaptive_conv(x, guide, kern)
    ref = lax.conv_general_dilated(
        x, kern, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_depth_to_normals_flat_plane():
    from gedepth_tpu.models.experiment_heads import depth_to_normals
    d = jnp.full((1, 10, 12, 1), 5.0)
    n = np.asarray(depth_to_normals(d, 500.0, 500.0))
    np.testing.assert_allclose(n[..., 2], 1.0, atol=1e-6)


def test_rmi_loss_sane():
    from gedepth_tpu.models.rmi_loss import rmi_loss
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((1, 24, 30, 11)).astype(
        np.float32))
    labels = jnp.asarray(rng.integers(0, 11, (1, 24, 30)).astype(np.float32))
    bad = float(rmi_loss(logits, labels))
    perfect = jnp.asarray(
        (np.eye(11)[np.asarray(labels, int)] * 20 - 10).astype(np.float32))
    good = float(rmi_loss(perfect, labels))
    assert np.isfinite(bad) and good < bad


def test_cascade_seg_scaffolding():
    from gedepth_tpu.models.segmentation import (
        FCNHead, OCRHead, CascadeEncoderDecoderSeg)
    from gedepth_tpu.models.resnet import ResNet
    seg = CascadeEncoderDecoderSeg(
        backbone=ResNet(depth=18),
        first_head=FCNHead(channels=16, num_classes=2),
        cascade_heads=[OCRHead(channels=16, ocr_channels=8, num_classes=2)])
    img = jnp.zeros((1, 32, 48, 3), jnp.float32)
    v = seg.init(jax.random.PRNGKey(0), img)
    outs = seg.apply(v, img)
    assert [tuple(o.shape) for o in outs] == [(1, 32, 48, 2), (1, 32, 48, 2)]


def test_dynamicpe_variant_family_shapes():
    """The reference's DynamicPENeck experiment family
    (dynamicpe_neck.py:80-488) — forward shapes + finite outputs + grads
    flow (except through the deliberately detached Soft2 inputs)."""
    import jax
    import jax.numpy as jnp
    from gedepth_tpu.models import (
        DynamicPENeckStem, DynamicAttnPENeck, DynamicPENeckBackbone,
        DynamicPENeckSoft2, DynamicPENeckSoftHRNet, DynamicPENeckSoftDDR,
        DynamicPENeckHeavy)

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    stem = jnp.asarray(rng.standard_normal((1, 16, 24, 64))
                       .astype(np.float32))

    # pyramid whose widths/sizes match the skip-add cascade (ref forward
    # adds inputs[i+1] after each stride-2 downsample,
    # dynamicpe_neck.py:239-249)
    stem_pyr = [jnp.asarray(rng.standard_normal((1, 32 // s, 32 // s, c))
                            .astype(np.float32))
                for s, c in zip((1, 2, 4, 8, 16), (64, 16, 16, 16, 16))]
    m = DynamicPENeckStem(widths=(8, 16, 16, 16, 16), final_channels=32)
    v = m.init(key, stem_pyr)
    out = m.apply(v, stem_pyr)
    assert out.shape == (1, 1)
    assert float(jnp.abs(out).max()) <= 1.0  # tanh-bounded slope

    m = DynamicAttnPENeck(out_channels=5)
    v = m.init(key, stem)
    assert m.apply(v, stem).shape == (1, 5)

    hr = [jnp.asarray(rng.standard_normal((1, 16 // s, 24 // s, c))
                      .astype(np.float32))
          for s, c in zip((1, 2, 4, 8), (18, 36, 72, 144))]
    m = DynamicPENeckBackbone(out_widths=(32, 32, 32, 32),
                              final_channels=32)
    v = m.init(key, hr)
    assert m.apply(v, hr).shape == (1, 9)

    m = DynamicPENeckSoftHRNet(channels=18)
    v = m.init(key, hr)
    assert m.apply(v, hr).shape == (1, 16, 24, 11)

    pyr = [jnp.asarray(rng.standard_normal((1, 16 // s, 24 // s, c))
                       .astype(np.float32))
           for s, c in zip((1, 1, 2, 4, 8), (64, 16, 32, 64, 128))]
    m = DynamicPENeckSoft2(channels=16)
    v = m.init(key, pyr)
    out = m.apply(v, pyr)
    assert out.shape == (1, 16, 24, 11)
    # detached inputs: grads w.r.t. inputs are exactly zero
    g = jax.grad(lambda xs: m.apply(v, xs).sum())(pyr)
    assert all(float(jnp.abs(x).max()) == 0.0 for x in g)

    ddr = jnp.asarray(rng.standard_normal((1, 8, 12, 256))
                      .astype(np.float32))
    m = DynamicPENeckSoftDDR()
    v = m.init(key, ddr)
    assert m.apply(v, ddr).shape == (1, 8, 12, 11)

    m = DynamicPENeckHeavy(up_sample_channels=(16, 16, 32, 64, 128))
    v = m.init(key, pyr)
    out = m.apply(v, pyr)
    assert out.shape[-1] == 11 and np.isfinite(np.asarray(out)).all()
