"""Golden tests for the 9-metric eval core and eval crops."""
import numpy as np
import pytest

from gedepth_tpu.core import (
    METRIC_NAMES,
    calculate_metrics,
    masked_metrics,
    aggregate_metrics,
    eval_kb_crop,
    eval_crop_mask,
    garg_crop_mask,
    eigen_crop_mask,
    batched_masked_metrics_jax,
)


def test_perfect_prediction():
    gt = np.array([1.0, 2.0, 5.0, 40.0])
    m = dict(zip(METRIC_NAMES, calculate_metrics(gt, gt.copy())))
    assert m["a1"] == m["a2"] == m["a3"] == 1.0
    for k in ("abs_rel", "rmse", "rmse_log", "silog", "sq_rel", "log_10"):
        assert m[k] == pytest.approx(0.0, abs=1e-12)


def test_hand_computed_values():
    gt = np.array([2.0, 4.0])
    pred = np.array([1.0, 8.0])
    m = dict(zip(METRIC_NAMES, calculate_metrics(gt, pred)))
    # thresh = max(2, 2) = 2 for both -> none < 1.25, none < 1.5625; 2 < 1.953? no
    assert m["a1"] == 0.0 and m["a2"] == 0.0
    assert m["a3"] == 0.0  # 1.25^3 = 1.953 < 2
    assert m["abs_rel"] == pytest.approx((1 / 2 + 4 / 4) / 2)
    assert m["sq_rel"] == pytest.approx((1 / 2 + 16 / 4) / 2)
    assert m["rmse"] == pytest.approx(np.sqrt((1 + 16) / 2))
    g = np.log(pred) - np.log(gt)  # [-log2, log2]
    assert m["rmse_log"] == pytest.approx(np.sqrt(np.mean(g ** 2)))
    assert m["silog"] == pytest.approx(
        np.sqrt(np.mean(g ** 2) - np.mean(g) ** 2) * 100)
    assert m["log_10"] == pytest.approx(np.mean(np.abs(np.log10(gt) - np.log10(pred))))


def test_empty_mask_gives_nans_and_nanmean_skips():
    res_empty = calculate_metrics(np.zeros(0), np.zeros(0))
    assert all(np.isnan(v) for v in res_empty)
    res_good = calculate_metrics(np.array([2.0]), np.array([2.0]))
    agg = aggregate_metrics([res_empty, res_good])
    assert agg["a1"] == 1.0  # empty image skipped, not zeroed


def test_masked_metrics_range_open_interval():
    gt = np.array([1e-3, 0.5, 80.0, 79.9])  # 1e-3 and 80 excluded
    pred = np.array([9.0, 0.5, 9.0, 79.9])
    m = dict(zip(METRIC_NAMES, masked_metrics(gt, pred, 1e-3, 80)))
    assert m["abs_rel"] == 0.0  # only 0.5 and 79.9 survive, both exact


def test_eval_kb_crop():
    x = np.arange(375 * 1242, dtype=np.float32).reshape(375, 1242)
    c = eval_kb_crop(x)
    assert c.shape == (352, 1216)
    # bottom-centred: top margin 23, left margin 13
    assert c[0, 0] == x[23, 13]
    assert c[-1, -1] == x[374, 13 + 1216 - 1]


def test_garg_eigen_crop_bounds():
    g = garg_crop_mask((352, 1216))
    assert g[int(0.40810811 * 352), int(0.03594771 * 1216)]
    assert not g[int(0.40810811 * 352) - 1, 100]
    e = eigen_crop_mask((352, 1216))
    assert e[int(0.3324324 * 352), 100]
    assert e.sum() != g.sum()


def test_eval_crop_mask_no_crop_does_not_crash():
    gt = np.full((10, 10), 5.0)
    m = eval_crop_mask(gt, 1e-3, 80, garg_crop=False, eigen_crop=False)
    assert m.all()


def test_jax_batched_matches_numpy():
    rng = np.random.default_rng(7)
    B, H, W = 3, 20, 30
    gt = rng.uniform(0, 90, size=(B, H, W)).astype(np.float32)
    pred = rng.uniform(1e-3, 80, size=(B, H, W)).astype(np.float32)
    masks = []
    for b in range(B):
        masks.append(eval_crop_mask(gt[b], 1e-3, 80, garg_crop=True))
    masks = np.stack(masks)
    # numpy per-image reference (clamp pred like the model does)
    ref_rows = [calculate_metrics(gt[b][masks[b]], pred[b][masks[b]])
                for b in range(B)]
    got = np.asarray(batched_masked_metrics_jax(gt, pred, masks))
    np.testing.assert_allclose(got, np.asarray(ref_rows), rtol=2e-4, atol=2e-5)


def test_jax_batched_empty_mask_nan_row():
    gt = np.full((1, 4, 4), 100.0, dtype=np.float32)  # all out of range
    pred = np.full((1, 4, 4), 50.0, dtype=np.float32)
    mask = np.zeros((1, 4, 4), dtype=bool)
    got = np.asarray(batched_masked_metrics_jax(gt, pred, mask))
    assert np.isnan(got).all()
