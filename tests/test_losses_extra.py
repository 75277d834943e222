"""Auxiliary loss zoo: torch cross-checks where torch has an equivalent."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from gedepth_tpu.models.losses_extra import (
    l1_loss, mse_loss, cosine_similarity_loss, focal_loss, dice_loss,
    ohem_ce_loss, bins_chamfer_loss, edge_aware_smoothness_loss, accuracy)


@pytest.fixture
def data(rng):
    pred = np.abs(rng.standard_normal((2, 8, 8, 1))).astype(np.float32)
    target = np.abs(rng.standard_normal((2, 8, 8, 1))).astype(np.float32)
    target[target < 0.4] = 0.0
    return pred, target


def test_l1_mse_masked(data):
    pred, target = data
    m = target > 0
    want_l1 = float(np.abs(pred - target)[m].mean())
    want_mse = float(((pred - target) ** 2)[m].mean())
    assert float(l1_loss(jnp.asarray(pred), jnp.asarray(target))) == \
        pytest.approx(want_l1, rel=1e-5)
    assert float(mse_loss(jnp.asarray(pred), jnp.asarray(target))) == \
        pytest.approx(want_mse, rel=1e-5)


def test_cosine_loss_matches_torch(rng):
    a = rng.standard_normal((2, 5, 5, 3)).astype(np.float32)
    b = rng.standard_normal((2, 5, 5, 3)).astype(np.float32)
    got = float(cosine_similarity_loss(jnp.asarray(a), jnp.asarray(b)))
    cos = F.cosine_similarity(torch.from_numpy(a), torch.from_numpy(b),
                              dim=-1)
    want = float((1 - cos).mean())
    assert got == pytest.approx(want, rel=1e-4)


def test_focal_reduces_easy_examples(rng):
    logits = np.zeros((1, 4, 4, 3), np.float32)
    logits[..., 0] = 5.0  # confident class 0
    labels = np.zeros((1, 4, 4), np.float32)
    easy = float(focal_loss(jnp.asarray(logits), jnp.asarray(labels)))
    labels_hard = np.full((1, 4, 4), 1.0, np.float32)
    hard = float(focal_loss(jnp.asarray(logits), jnp.asarray(labels_hard)))
    assert easy < hard * 1e-2


def test_dice_perfect_prediction_is_zero():
    labels = np.array([[0, 1], [1, 0]], np.float32)[None]
    logits = np.zeros((1, 2, 2, 2), np.float32)
    logits[..., 1] = np.where(labels[0] == 1, 20.0, -20.0)
    logits[..., 0] = -logits[..., 1]
    val = float(dice_loss(jnp.asarray(logits), jnp.asarray(labels)))
    assert val == pytest.approx(0.0, abs=1e-3)


def test_ohem_keeps_hard_pixels(rng):
    logits = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
    labels = rng.integers(0, 4, (1, 8, 8)).astype(np.float32)
    full = float(ohem_ce_loss(jnp.asarray(logits), jnp.asarray(labels),
                              min_kept=64 * 100))
    mined = float(ohem_ce_loss(jnp.asarray(logits), jnp.asarray(labels),
                               thresh=0.99, min_kept=8))
    assert mined >= full  # mining keeps the hardest subset


def test_bins_chamfer_zero_when_bins_cover_targets():
    edges = jnp.asarray(np.array([[0.5, 1.5, 2.5, 3.5]], np.float32))
    # centers are [1, 2, 3]; targets exactly at centers
    target = jnp.asarray(np.array([[[1.0, 2.0], [3.0, 2.0]]], np.float32))
    val = float(bins_chamfer_loss(edges, target, loss_weight=1.0))
    assert val == pytest.approx(0.0, abs=1e-6)
    # shifted targets increase the distance
    val2 = float(bins_chamfer_loss(edges, target + 0.4, loss_weight=1.0))
    assert val2 > val


def test_edge_aware_smoothness_prefers_flat(rng):
    img = rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32)
    flat = np.ones((1, 16, 16, 1), np.float32)
    noisy = flat + rng.standard_normal((1, 16, 16, 1)).astype(np.float32) * .3
    l_flat = float(edge_aware_smoothness_loss(jnp.asarray(flat),
                                              jnp.asarray(img), 1.0))
    l_noisy = float(edge_aware_smoothness_loss(jnp.asarray(noisy),
                                               jnp.asarray(img), 1.0))
    assert l_flat == pytest.approx(0.0, abs=1e-6)
    assert l_noisy > 0.01


def test_accuracy_topk(rng):
    logits = np.zeros((1, 2, 2, 3), np.float32)
    logits[..., 0] = 0.5
    logits[..., 1] = 1.0
    labels = np.ones((1, 2, 2), np.float32)
    assert float(accuracy(jnp.asarray(logits), jnp.asarray(labels))) == 1.0
    labels0 = np.zeros((1, 2, 2), np.float32)
    assert float(accuracy(jnp.asarray(logits), jnp.asarray(labels0))) == 0.0
    assert float(accuracy(jnp.asarray(logits), jnp.asarray(labels0),
                          topk=2)) == 1.0
