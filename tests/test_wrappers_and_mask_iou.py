"""Dataset wrappers (reference dataset_wrappers.py) and ground-mask IoU
(reference kitti.py maskpe_eval) unit tests."""
import numpy as np
import pytest

from gedepth_tpu.data.wrappers import ConcatDataset, RepeatDataset
from gedepth_tpu.data import SyntheticGroundDataset
from gedepth_tpu.eval.mask_iou import (
    MaskIoUAccumulator, mask_iou, pe_ground_truth_mask)


def _ds(size, seed):
    return SyntheticGroundDataset(size=size, height=16, width=24,
                                  use_pe=True, seed=seed)


def test_repeat_dataset_cycles():
    base = _ds(3, 0)
    rep = RepeatDataset(base, times=4)
    assert len(rep) == 12
    a = rep[1]["img"]
    b = rep[1 + 3]["img"]
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(rep[2]["depth_gt"], rep[2 + 6]["depth_gt"])


def test_concat_dataset_spans_and_reindexes():
    d1, d2 = _ds(3, 0), _ds(2, 1)
    cat = ConcatDataset([d1, d2])
    assert len(cat) == 5
    np.testing.assert_array_equal(cat[4]["img"], d2[1]["img"])
    assert cat[4]["index"] == 4  # global index rewritten
    np.testing.assert_array_equal(cat[3]["depth_gt"], d2[0]["depth_gt"])


def test_repeat_times_config_wraps_train_dataset():
    import dataclasses
    from gedepth_tpu.configs import get_config
    from gedepth_tpu.train.loop import build_datasets

    cfg = get_config("smoke_synthetic")
    cfg = cfg.replace(data=dataclasses.replace(cfg.data, repeat_times=3))
    train, test = build_datasets(cfg)
    assert isinstance(train, RepeatDataset)
    assert len(train) == 3 * cfg.data.synthetic_size
    assert not isinstance(test, RepeatDataset)


def test_build_datasets_dispatches_toolbox_extras(tmp_path):
    """sunrgbd / cityscapes / nuscenes / custom dataset names are reachable
    from DataConfig (reference toolbox dataset registry analogue)."""
    import dataclasses
    from PIL import Image
    from gedepth_tpu.configs import get_config
    from gedepth_tpu.train.loop import build_datasets
    from gedepth_tpu.data import (
        SUNRGBDDataset, CityscapesDataset, NuScenesDataset,
        CustomDepthDataset)

    root = tmp_path
    Image.fromarray(np.zeros((8, 12, 3), np.uint8)).save(root / "a.png")
    Image.fromarray(
        np.ones((8, 12), np.uint16), mode="I;16").save(root / "d.png")
    (root / "split.txt").write_text("a.png d.png\n")

    cfg0 = get_config("smoke_synthetic")
    want = {"sunrgbd": SUNRGBDDataset, "cityscapes": CityscapesDataset,
            "nuscenes": NuScenesDataset, "custom": CustomDepthDataset}
    for name, cls in want.items():
        cfg = cfg0.replace(data=dataclasses.replace(
            cfg0.data, dataset=name, data_root=str(root),
            train_split="split.txt", test_split="split.txt"))
        train, test = build_datasets(cfg)
        assert isinstance(train, cls), name
        # custom lists the whole folder (2 images); split-based sets have 1
        assert len(test) == (2 if name == "custom" else 1)
        assert test[0]["img"].shape == (8, 12, 3)


def test_learned_positional_encoding_shapes():
    """Reference position_encoding.py:103 analogue (sine PE is the one the
    shipped configs use; the learned variant is the toolbox alternative)."""
    import jax
    from gedepth_tpu.models.layers import LearnedPositionalEncoding

    mod = LearnedPositionalEncoding(num_feats=8, max_len=16)
    v = mod.init(jax.random.PRNGKey(0), 5, 7)
    out = mod.apply(v, 5, 7)
    assert out.shape == (5, 7, 16)
    # col embed leads, row embed trails (reference cat order)
    np.testing.assert_array_equal(
        np.asarray(out[0, :, :8]), np.asarray(v["params"]["col_embed"][:7]))
    np.testing.assert_array_equal(
        np.asarray(out[:, 0, 8:]), np.asarray(v["params"]["row_embed"][:5]))


def test_torch_linear_kernel_init_bound():
    import jax
    from gedepth_tpu.models.layers import torch_linear_kernel_init

    k = torch_linear_kernel_init(jax.random.PRNGKey(0), (64, 32))
    bound = 1.0 / np.sqrt(64)
    assert float(np.abs(np.asarray(k)).max()) <= bound
    assert float(np.asarray(k).std()) > 0.3 * bound  # actually uniform


def test_mask_iou_values():
    a = np.zeros((4, 4), bool)
    a[:2] = True
    b = np.zeros((4, 4), bool)
    b[1:3] = True
    # inter = 4, union = 12
    assert mask_iou(a, b) == pytest.approx(100.0 * 4 / 12)
    assert mask_iou(a, a) == pytest.approx(100.0)


def test_pe_ground_truth_mask_tolerance():
    gt = np.array([[10.0, 10.0, 0.0, 2.0]])
    pe = np.array([[10.4, 11.0, 5.0, 2.05]])
    m = pe_ground_truth_mask(pe, gt, rel_tol=0.05)
    # 4% in, 10% out, gt=0 out, 2.5% in
    np.testing.assert_array_equal(m, [[True, False, False, True]])


def test_mask_iou_accumulator_buckets():
    acc = MaskIoUAccumulator()
    full = np.ones((4, 4), bool)
    acc.add(full, full)                       # 100
    half = np.zeros((4, 4), bool)
    half[:2] = True
    acc.add(half, full)                       # 50
    s = acc.summary()
    assert s["n"] == 2
    assert s["miou"] == pytest.approx(75.0)
    assert s["frac_over_60"] == 0.5
    assert s["frac_over_75"] == 0.5
