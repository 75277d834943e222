"""Stage-1 mask pretrain path + single-image inference API."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gedepth_tpu.models.pretrain import (
    GroundMaskPretrain, ground_mask_gt, weighted_ce_ignore,
    extract_backbone, overlay_backbone)
from gedepth_tpu.models import GEDepth

pytestmark = pytest.mark.slow  # compile-heavy: full-model jits (test tiers, NOTES r4)

TINY = dict(embed_dims=16, depths=(1, 1), num_heads=(1, 2),
            neck_channels=(16, 16, 32), neck_embed_dim=32,
            neck_num_points=2, drop_path_rate=0.0)


def test_ground_mask_gt():
    pe = np.array([[10.0, 10.0, 10.0, -5.0]])
    gt = np.array([[10.1, 12.0, 0.0, 5.0]])
    m = ground_mask_gt(pe, gt, rel_tol=0.03)
    assert list(m[0]) == [1.0, 0.0, 0.0, 0.0]


def test_weighted_ce_matches_torch():
    import torch
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((1, 6, 8, 2)).astype(np.float32)
    labels = rng.integers(0, 2, size=(1, 6, 8)).astype(np.float32)
    labels[0, 0, :2] = 255
    got = float(weighted_ce_ignore(jnp.asarray(logits), jnp.asarray(labels)))
    want = float(torch.nn.CrossEntropyLoss(
        weight=torch.tensor([0.2, 1.0]), ignore_index=255)(
        torch.from_numpy(logits.transpose(0, 3, 1, 2)),
        torch.from_numpy(labels).long()))
    assert got == pytest.approx(want, rel=1e-5)


def test_pretrain_model_and_backbone_overlay():
    pm = GroundMaskPretrain(**TINY)
    img = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 32, 48, 5)).astype(np.float32))
    pvars = pm.init(jax.random.PRNGKey(0), img)
    logits = pm.apply(pvars, img)
    assert logits.shape == (1, 32, 48, 2)

    # overlay onto the depth model: backbone subtrees are congruent
    dm = GEDepth(pe_variant="adaptive", **TINY)
    dvars = dm.init(jax.random.PRNGKey(1), img, jnp.ones((1,), jnp.float32))
    merged = overlay_backbone(dvars["params"],
                              extract_backbone(pvars["params"]))
    a = jax.tree.leaves(merged["backbone"])
    b = jax.tree.leaves(pvars["params"]["backbone"])
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # other subtrees untouched
    for x, y in zip(jax.tree.leaves(merged["decode_head"]),
                    jax.tree.leaves(dvars["params"]["decode_head"])):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_inference_api_on_synthetic(tmp_path):
    from gedepth_tpu.apis import init_depther, inference_depther
    from gedepth_tpu.configs import get_config
    from gedepth_tpu.data import SyntheticGroundDataset

    cfg = get_config("smoke_synthetic")
    handle = init_depther(cfg, checkpoint=None, flip_tta=False)
    ds = SyntheticGroundDataset(size=1, height=96, width=192)
    sample = ds[0]
    depth = inference_depther(handle, sample["img"])
    assert depth.shape == (96, 192)
    assert depth.min() >= cfg.model.min_depth - 1e-6
    assert depth.max() <= cfg.model.max_depth + 1e-4

    # RGB-only image must raise without a PE prior
    with pytest.raises(ValueError):
        inference_depther(handle, sample["img"][..., :3])

    # with a PE prior on disk it works
    pe_path = tmp_path / "pe.npy"
    np.save(pe_path, sample["img"][..., 4])
    handle2 = init_depther(cfg, flip_tta=False, pe_path=str(pe_path))
    depth2 = inference_depther(handle2, sample["img"][..., :3])
    assert depth2.shape == (96, 192)
