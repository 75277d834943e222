"""Unit tests for the host-side augmentation pipeline."""
import numpy as np
import pytest

from gedepth_tpu.data import (
    KBCrop, RandomRatioResize, PadToSize, RandomRotate, RandomFlip,
    RandomCrop, ColorAug, Normalize, DDADResize, Compose,
    SyntheticGroundDataset, TrainLoader, EvalLoader,
    IMAGENET_MEAN, IMAGENET_STD,
)


def _sample(h=375, w=1242, channels=5, rng=None):
    rng = rng or np.random.default_rng(0)
    img = rng.uniform(0, 255, size=(h, w, channels)).astype(np.float32)
    return {
        "img": img,
        "depth_gt": rng.uniform(0, 80, size=(h, w)).astype(np.float32),
        "pe_k_gt": rng.integers(0, 11, size=(h, w)).astype(np.float32),
        "cam_height": np.float32(1.65),
    }


def test_kb_crop_geometry(rng):
    s = _sample()
    ref_img = s["img"].copy()
    out = KBCrop()(s, rng)
    assert out["img"].shape == (352, 1216, 5)
    assert out["depth_gt"].shape == (352, 1216)
    # bottom-centered: top=23, left=13
    np.testing.assert_array_equal(out["img"][0, 0], ref_img[23, 13])


def test_random_ratio_resize_bounds(rng):
    s = _sample(352, 1216)
    out = RandomRatioResize((0.5, 2.0))(s, rng)
    h, w = out["img"].shape[:2]
    assert 0.5 * 352 <= h <= 2.0 * 352 + 1
    assert out["depth_gt"].shape == (h, w)
    assert out["pe_k_gt"].shape == (h, w)
    # nearest interp must not invent new slope classes
    assert set(np.unique(out["pe_k_gt"])) <= set(np.unique(s["pe_k_gt"]))


def test_pad_to_size_fill_semantics(rng):
    s = _sample(200, 600)
    out = PadToSize(352, 1216)(s, rng)
    assert out["img"].shape == (352, 1216, 5)
    pad_region = out["valid_mask"] == 0
    assert pad_region.any()
    assert (out["img"][pad_region] == 0).all()
    assert (out["depth_gt"][pad_region] == 0).all()
    assert (out["pe_k_gt"][pad_region] == 255).all()


def test_random_rotate_border_values():
    s = _sample(100, 200)
    s["depth_gt"][:] = 7.0
    s["pe_k_gt"][:] = 3.0
    out = RandomRotate(prob=1.0, degree=10.0)(s, np.random.default_rng(3))
    # rotated corners take the border fill: 0 for depth, 255 for pe
    assert (out["depth_gt"] == 0).any()
    assert (out["pe_k_gt"] == 255).any()
    assert set(np.unique(out["pe_k_gt"])) <= {3.0, 255.0}


def test_random_flip_consistency():
    s = _sample(10, 20)
    ref = {k: np.array(v) for k, v in s.items() if isinstance(v, np.ndarray)}
    out = RandomFlip(prob=1.0)(s, np.random.default_rng(0))
    np.testing.assert_array_equal(out["img"], ref["img"][:, ::-1])
    np.testing.assert_array_equal(out["depth_gt"], ref["depth_gt"][:, ::-1])


def test_random_crop_shape(rng):
    s = _sample(352, 1216)
    out = RandomCrop((352, 704))(s, rng)
    assert out["img"].shape == (352, 704, 5)
    assert out["depth_gt"].shape == (352, 704)


def test_color_aug_rgb_only():
    s = _sample(16, 16)
    pe_before = s["img"][..., 3:].copy()
    out = ColorAug(prob=1.0)(s, np.random.default_rng(5))
    np.testing.assert_array_equal(out["img"][..., 3:], pe_before)
    assert out["img"][..., :3].max() <= 255.0


def test_normalize_five_channel():
    s = _sample(8, 8)
    s["img"][..., 3] = np.array([[0, 50]] * 4 + [[100, 300]] * 4,
                                dtype=np.float32).repeat(4, axis=1)[:8, :8]
    raw = s["img"].copy()
    out = Normalize(depth_scale=200.0)(s)
    rgb = out["img"][..., :3]
    np.testing.assert_allclose(
        rgb, (raw[..., :3] - IMAGENET_MEAN) / IMAGENET_STD, rtol=1e-5)
    pe = out["img"][..., 3]
    # zeros stay zero; positive values divided by 200
    assert (pe[raw[..., 3] == 0] == 0).all()
    np.testing.assert_allclose(pe[raw[..., 3] > 0],
                               raw[..., 3][raw[..., 3] > 0] / 200.0)
    # raw channel untouched
    np.testing.assert_array_equal(out["img"][..., 4], raw[..., 4])


def test_ddad_resize_sparse_scatter():
    s = _sample(1216, 1936)
    s["depth_gt"][:] = 0.0
    s["depth_gt"][100, 200] = 42.0
    out = DDADResize((384, 640))(s, None)
    assert out["img"].shape == (384, 640, 5)
    assert out["depth_gt"].shape == (384, 640)
    ys, xs = np.nonzero(out["depth_gt"])
    assert len(ys) == 1
    assert out["depth_gt"][ys[0], xs[0]] == 42.0
    assert ys[0] == int(100 * 384 / 1216) and xs[0] == int(200 * 640 / 1936)


def test_full_train_pipeline_contract():
    ds = SyntheticGroundDataset(size=4, height=120, width=400)
    pipe = Compose([
        KBCrop(96, 352),
        RandomRatioResize((0.5, 2.0)),
        PadToSize(96, 352),
        RandomRotate(0.5, 2.5),
        RandomFlip(0.5),
        RandomCrop((96, 176)),
        ColorAug(0.5),
        Normalize(depth_scale=200.0),
    ])
    rng = np.random.default_rng(1)
    s = pipe(ds[0], rng)
    assert s["img"].shape == (96, 176, 5)
    assert s["depth_gt"].shape == (96, 176)
    assert s["pe_k_gt"].shape == (96, 176)
    cls = set(np.unique(s["pe_k_gt"]))
    assert cls <= set(range(11)) | {255.0}


def test_pipeline_deterministic_with_same_seed():
    ds = SyntheticGroundDataset(size=2, height=96, width=128)
    pipe = Compose([RandomRatioResize((0.5, 2.0)), PadToSize(96, 128),
                    RandomCrop((64, 96)), ColorAug(1.0),
                    Normalize(depth_scale=200.0)])
    a = pipe(ds[0], np.random.default_rng(42))
    b = pipe(ds[0], np.random.default_rng(42))
    np.testing.assert_array_equal(a["img"], b["img"])


def test_train_loader_shapes_and_sharding():
    ds = SyntheticGroundDataset(size=8, height=64, width=96)
    pipe = Compose([RandomCrop((48, 64)), Normalize(depth_scale=200.0)])
    full = TrainLoader(ds, pipe, global_batch=4, seed=7)
    b_full = full._make_batch(0)
    assert b_full["img"].shape == (4, 48, 64, 5)
    assert b_full["depth_gt"].shape == (4, 48, 64)
    # sharded loaders reproduce exactly their slice of the global batch
    sh0 = TrainLoader(ds, pipe, global_batch=4, seed=7, shard_index=0,
                      shard_count=2)._make_batch(0)
    sh1 = TrainLoader(ds, pipe, global_batch=4, seed=7, shard_index=1,
                      shard_count=2)._make_batch(0)
    np.testing.assert_array_equal(
        np.concatenate([sh0["img"], sh1["img"]]), b_full["img"])


def test_train_loader_epoch_permutation_semantics():
    """Default sampling='epoch' matches the reference DistributedSampler:
    within each epoch every dataset index appears EXACTLY once, epochs are
    distinct permutations, and the schedule is deterministic per (seed,
    epoch) and shard-stable (builder.py:123-125)."""
    ds = SyntheticGroundDataset(size=10, height=64, width=96)
    pipe = Compose([Normalize(depth_scale=200.0)])
    ld = TrainLoader(ds, pipe, global_batch=5, seed=3)
    # 2 steps per epoch at batch 5 over 10 samples
    epoch0 = [ld._index_for(s, slot) for s in (0, 1) for slot in range(5)]
    epoch1 = [ld._index_for(s, slot) for s in (2, 3) for slot in range(5)]
    assert sorted(epoch0) == list(range(10))       # exactly-once coverage
    assert sorted(epoch1) == list(range(10))
    assert epoch0 != epoch1                        # re-shuffled per epoch
    assert epoch0 != list(range(10))               # actually shuffled
    # deterministic: a fresh loader instance reproduces the schedule
    ld2 = TrainLoader(ds, pipe, global_batch=5, seed=3)
    assert [ld2._index_for(1, k) for k in range(5)] == epoch0[5:]
    # epoch boundary inside a batch: global_batch=4 -> step 2 spans epochs
    ld3 = TrainLoader(ds, pipe, global_batch=4, seed=3)
    stream = [ld3._index_for(s, k) for s in range(5) for k in range(4)]
    assert sorted(stream[:10]) == list(range(10))
    assert sorted(stream[10:20]) == list(range(10))
    # opt-in replacement sampling still available
    ld4 = TrainLoader(ds, pipe, global_batch=5, seed=3,
                      sampling="replacement")
    rep = [ld4._index_for(s, k) for s in (0, 1) for k in range(5)]
    assert len(rep) == 10 and all(0 <= i < 10 for i in rep)


def test_train_loader_multiprocess_stream_identical():
    """num_workers changes throughput only: every batch is a pure function
    of (seed, step, slot), so the multi-process stream must equal the
    single-thread one (reference analogue: builder.py workers_per_gpu)."""
    import itertools

    ds = SyntheticGroundDataset(size=8, height=64, width=96)
    pipe = Compose([RandomCrop((48, 64)), Normalize(depth_scale=200.0)])
    base = TrainLoader(ds, pipe, global_batch=2, seed=7)
    mp = TrainLoader(ds, pipe, global_batch=2, seed=7, num_workers=2)
    for a, b in zip(itertools.islice(iter(base), 3),
                    itertools.islice(iter(mp), 3)):
        np.testing.assert_array_equal(a["img"], b["img"])
        np.testing.assert_array_equal(a["depth_gt"], b["depth_gt"])


def test_eval_loader_padding():
    ds = SyntheticGroundDataset(size=5, height=64, width=96)
    pipe = Compose([Normalize(depth_scale=200.0)])
    loader = EvalLoader(ds, pipe, batch_size=2)
    batches = list(loader)
    assert len(batches) == 3
    batch, valid = batches[-1]
    assert batch["img"].shape[0] == 2
    assert valid.tolist() == [True, False]
    # padded row repeats the last sample
    assert batch["index"][1] == batch["index"][0]
