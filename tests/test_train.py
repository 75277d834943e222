"""Training-stack tests: optimizer parity, sharded train step, smoke train."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gedepth_tpu.models import GEDepth
from gedepth_tpu.train import (
    make_optimizer, lr_schedule, create_train_state, make_train_step,
    make_eval_step)
from gedepth_tpu.train.optim import decay_mask
from gedepth_tpu.parallel import create_mesh, shard_batch, batch_sharding

pytestmark = pytest.mark.slow  # compile-heavy: full-model jits (test tiers, NOTES r4)

TINY = dict(embed_dims=16, depths=(1, 1), num_heads=(1, 2),
            neck_channels=(16, 16, 32), neck_embed_dim=32,
            neck_num_points=2, drop_path_rate=0.0)


def _model():
    return GEDepth(pe_variant="adaptive", **TINY)


def _batch(b=8, h=32, w=48, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.standard_normal((b, h, w, 5)).astype(np.float32)
    img[..., 4] = np.abs(img[..., 4]) * 30 + 1
    depth = np.abs(rng.standard_normal((b, h, w))).astype(np.float32) * 10
    depth[depth < 2] = 0.0
    pe_k = rng.integers(0, 11, size=(b, h, w)).astype(np.float32)
    pe_k[:, :4] = 255
    return {"img": img, "depth_gt": depth, "pe_k_gt": pe_k,
            "cam_height": np.full((b,), 1.65, np.float32)}


def test_lr_schedule_warmup_and_cosine():
    sched = lr_schedule(1e-4, max_iters=1000, warmup_iters=100,
                        warmup_ratio=1e-3, min_lr_ratio=1e-8)
    lr0 = float(sched(jnp.asarray(0)))
    assert lr0 == pytest.approx(1e-4 * 1e-3, rel=1e-3)
    lr100 = float(sched(jnp.asarray(100)))
    # warmup done: cosine value at t=100/1000
    want = 1e-4 * 0.5 * (1 + np.cos(np.pi * 0.1))
    assert lr100 == pytest.approx(want, rel=1e-3)
    lr_end = float(sched(jnp.asarray(1000)))
    assert lr_end == pytest.approx(1e-4 * 1e-8, abs=1e-10)


def test_decay_mask_excludes_norms_and_bias_tables():
    model = _model()
    batch = _batch(2)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(batch["img"]),
                           jnp.asarray(batch["cam_height"]))
    mask = decay_mask(variables["params"])
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    checked_norm = checked_table = checked_conv = False
    for kp, decayed in flat:
        names = [getattr(p, "key", str(p)) for p in kp]
        path = "/".join(names)
        if "relative_position_bias_table" in path:
            assert not decayed, path
            checked_table = True
        elif any(n.startswith("norm") for n in names):
            assert not decayed, path
            checked_norm = True
        elif "BatchNorm" in path and ("scale" in path or "bias" in path):
            # mmcv names ConvModule norms 'bn' -> they DO decay in the ref
            assert decayed, path
            checked_conv = True
    assert checked_norm and checked_table and checked_conv


def test_train_step_decreases_loss_sharded():
    """8-device data-parallel smoke train on a fixed batch."""
    model = _model()
    mesh = create_mesh()
    assert len(jax.devices()) == 8  # conftest forces 8 virtual cpu devices
    batch = shard_batch(_batch(8), mesh)

    tx, _ = make_optimizer(max_lr=3e-4, max_iters=60, warmup_iters=0)
    state = create_train_state(model, tx, batch["img"], jax.random.PRNGKey(0),
                               batch["cam_height"])
    step = make_train_step(model, donate=False)
    rng = jax.random.PRNGKey(1)
    first = None
    last = None
    for i in range(30):
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, batch, sub)
        if first is None:
            first = float(metrics["loss"])
        last = float(metrics["loss"])
    assert np.isfinite(last)
    assert last < first * 0.8, (first, last)


def test_bf16_train_step_tracks_f32():
    """bf16 mixed-precision training (TrainConfig.bf16_compute) keeps the
    master state f32 (params / opt state / BN stats dtypes unchanged) and
    its loss trajectory tracks the f32 step from the same init/stream."""
    def run(bf16, steps=8):
        model = _model()
        batch = _batch(4)
        tx, _ = make_optimizer(max_lr=1e-4, max_iters=10, warmup_iters=0)
        state = create_train_state(model, tx, batch["img"],
                                   jax.random.PRNGKey(0),
                                   batch["cam_height"])
        step = make_train_step(model, donate=False, bf16=bf16)
        rng = jax.random.PRNGKey(1)
        losses = []
        for _ in range(steps):
            rng, sub = jax.random.split(rng)
            state, m = step(state, batch, sub)
            losses.append(float(m["loss"]))
        return np.asarray(losses), state

    ref, _ = run(False)
    got, state = run(True)
    assert np.all(np.isfinite(got))
    # master state stays f32 under bf16 compute
    for leaf in jax.tree.leaves(state.params) + jax.tree.leaves(
            state.batch_stats):
        assert leaf.dtype != jnp.bfloat16
    np.testing.assert_allclose(got, ref, rtol=0.05)
    assert got[-1] < got[0]  # still learning


def test_train_run_bitwise_reproducible():
    """Two independent runs from the same seed produce bitwise-identical
    params after 5 steps — guards against nondeterministic ops (unordered
    scatter reductions, uncontrolled rng) entering the train path. The
    reference only offers best-effort determinism (set_random_seed
    deterministic=False by default, train_api comment); explicit PRNG keys
    make the stronger guarantee cheap here."""
    def run():
        model = _model()
        mesh = create_mesh()
        batch = shard_batch(_batch(8), mesh)
        tx, _ = make_optimizer(max_lr=3e-4, max_iters=10, warmup_iters=0)
        state = create_train_state(model, tx, batch["img"],
                                   jax.random.PRNGKey(0),
                                   batch["cam_height"])
        step = make_train_step(model, donate=False)
        rng = jax.random.PRNGKey(1)
        for _ in range(5):
            rng, sub = jax.random.split(rng)
            state, _ = step(state, batch, sub)
        return jax.device_get(state.params)

    a, b = run(), run()
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_eval_step_flip_tta_consistency():
    model = _model()
    batch = _batch(2)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(batch["img"]),
                           jnp.asarray(batch["cam_height"]))
    params, stats = variables["params"], variables.get("batch_stats", {})
    ev = make_eval_step(model, flip_tta=True)
    ev_plain = make_eval_step(model, flip_tta=False)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    pred = np.asarray(ev(params, stats, jb))
    assert pred.shape == (2, 32, 48)
    assert pred.min() >= model.min_depth - 1e-6
    # TTA == mean(plain(x), unflip(plain(flip(x))))
    plain = np.asarray(ev_plain(params, stats, jb))
    flipped_in = dict(jb, img=jb["img"][:, :, ::-1, :])
    plain_f = np.asarray(ev_plain(params, stats, flipped_in))[:, :, ::-1]
    np.testing.assert_allclose(pred, 0.5 * (plain + plain_f),
                               rtol=1e-4, atol=1e-5)


def test_eval_step_bf16_close_to_f32():
    """The Evaluator-reachable bf16 eval forward (tools/test.py --bf16)
    returns f32 depth close to the f32 path; clamps still hold."""
    model = _model()
    batch = _batch(2)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(batch["img"]),
                           jnp.asarray(batch["cam_height"]))
    params, stats = variables["params"], variables.get("batch_stats", {})
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    f32 = np.asarray(make_eval_step(model, flip_tta=False)(params, stats,
                                                           jb))
    b16 = np.asarray(make_eval_step(model, flip_tta=False, bf16=True)(
        params, stats, jb))
    assert b16.dtype == np.float32
    assert b16.min() >= model.min_depth - 1e-6
    rel = np.abs(b16 - f32) / np.maximum(f32, model.min_depth)
    assert float(rel.mean()) < 0.02


def test_eval_step_multiscale_ratio():
    """ratio=1.0 is the identity view; a non-unit ratio runs the forward at
    the snapped scaled size and returns base-resolution predictions
    (reference --aug-test intent, test_time_aug.py:102-127)."""
    model = _model()
    batch = _batch(1)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(batch["img"]),
                           jnp.asarray(batch["cam_height"]))
    params, stats = variables["params"], variables.get("batch_stats", {})
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    base = np.asarray(make_eval_step(model, flip_tta=False)(
        params, stats, jb))
    unit = np.asarray(make_eval_step(model, flip_tta=False, ratio=1.0)(
        params, stats, jb))
    np.testing.assert_allclose(base, unit, rtol=1e-6, atol=1e-6)
    scaled = np.asarray(make_eval_step(model, flip_tta=False, ratio=2.0)(
        params, stats, jb))
    assert scaled.shape == base.shape
    assert np.isfinite(scaled).all()
    assert scaled.min() >= model.min_depth - 1e-6
    # different scale => genuinely different view (not a no-op)
    assert np.abs(scaled - base).max() > 0


def test_slide_positions_cover_and_match_mmseg_grid():
    from gedepth_tpu.train.steps import slide_positions
    # mmseg slide_inference grid: ceil((size - tile) / stride) + 1 windows,
    # last flush with the border
    assert slide_positions(10, 10, 5) == [0]
    assert slide_positions(10, 12, 5) == [0]          # tile >= size
    assert slide_positions(20, 10, 5) == [0, 5, 10]
    assert slide_positions(21, 10, 5) == [0, 5, 10, 11]
    for size, tile, stride in [(33, 8, 3), (64, 16, 16), (17, 16, 5)]:
        pos = slide_positions(size, tile, stride)
        covered = np.zeros(size, bool)
        for p in pos:
            assert 0 <= p <= max(size - tile, 0)
            covered[p:p + tile] = True
        assert covered.all()


def test_slide_eval_step():
    """mode='slide' (the reference's declared-but-NotImplemented test_cfg
    mode): full-size tile reduces exactly to 'whole' inference; overlapping
    tiles produce finite clamped predictions at the input resolution."""
    from gedepth_tpu.train.steps import make_slide_eval_step

    model = _model()
    batch = _batch(2)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(batch["img"]),
                           jnp.asarray(batch["cam_height"]))
    params, stats = variables["params"], variables.get("batch_stats", {})
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    whole = np.asarray(make_eval_step(model, flip_tta=False)(
        params, stats, jb))
    # window == full image: slide must equal whole bit-for-bit-ish
    full = np.asarray(make_slide_eval_step(model, (32, 48), (16, 24),
                                           flip_tta=False)(params, stats,
                                                           jb))
    np.testing.assert_allclose(full, whole, rtol=1e-5, atol=1e-5)
    # genuine 2x2 overlapping grid
    slid = np.asarray(make_slide_eval_step(model, (32, 32), (16, 16),
                                           flip_tta=False)(params, stats,
                                                           jb))
    assert slid.shape == whole.shape
    assert np.isfinite(slid).all()
    assert slid.min() >= model.min_depth - 1e-6
    assert slid.max() <= model.max_depth + 1e-6
    # flip TTA wraps the slide like whole mode
    tta = np.asarray(make_slide_eval_step(model, (32, 32), (16, 16),
                                          flip_tta=True)(params, stats, jb))
    assert tta.shape == whole.shape and np.isfinite(tta).all()


def test_checkpoint_roundtrip(tmp_path):
    from gedepth_tpu.train.checkpoint import (
        save_checkpoint, restore_checkpoint, save_params_only,
        load_params_only)
    model = _model()
    batch = _batch(2)
    tx, _ = make_optimizer(1e-4, 100, 0)
    state = create_train_state(model, tx, jnp.asarray(batch["img"]),
                               jax.random.PRNGKey(0),
                               jnp.asarray(batch["cam_height"]))
    step = make_train_step(model, donate=False)
    state, _ = step(state, {k: jnp.asarray(v) for k, v in batch.items()},
                    jax.random.PRNGKey(1))

    save_checkpoint(str(tmp_path / "ckpt"), state, step=1)
    blank = create_train_state(model, tx, jnp.asarray(batch["img"]),
                               jax.random.PRNGKey(42),
                               jnp.asarray(batch["cam_height"]))
    restored = restore_checkpoint(str(tmp_path / "ckpt"), blank)
    assert int(restored.step) == int(state.step)
    for a, b in zip(jax.tree.leaves(restored.params),
                    jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # weights-only npz roundtrip
    save_params_only(str(tmp_path / "w.npz"), state.params, state.batch_stats)
    p2, s2 = load_params_only(str(tmp_path / "w.npz"), blank.params,
                              blank.batch_stats)
    for a, b in zip(jax.tree.leaves(p2), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bf16_train_step_with_swin_scan():
    """Regression: bf16_compute + scanned Swin stages + active drop-path.
    The scanned stage's carry must stay bf16 — DropPath's traced f32 rate
    override used to promote the residual stream to f32 mid-scan (scan
    carry type error, caught by the round-4 TPU train bench)."""
    model = GEDepth(pe_variant="adaptive", swin_scan=True, embed_dims=16,
                    depths=(2, 2), num_heads=(1, 2),
                    neck_channels=(16, 16, 32), neck_embed_dim=32,
                    neck_num_points=2, drop_path_rate=0.2)
    batch = {k: jnp.asarray(v) for k, v in _batch(2).items()}
    tx, _ = make_optimizer(1e-4, 100, 0)
    state = create_train_state(model, tx, batch["img"],
                               jax.random.PRNGKey(0), batch["cam_height"])
    step = make_train_step(model, donate=False, bf16=True)
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    state, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))


def test_checkpoint_swin_layout_adaptation(tmp_path):
    """A per-block npz loads into a swin_scan model (and vice versa) with
    identical eval outputs — the layout is adapted on load, so the compat
    preset can enable swin_scan without breaking converted checkpoints."""
    from gedepth_tpu.train.checkpoint import (save_params_only,
                                              load_params_only)
    kw = dict(pe_variant="adaptive", embed_dims=16, depths=(2, 2),
              num_heads=(1, 2), neck_channels=(16, 16, 32),
              neck_embed_dim=32, neck_num_points=2, drop_path_rate=0.0)
    loop = GEDepth(swin_scan=False, **kw)
    scan = GEDepth(swin_scan=True, **kw)
    batch = _batch(2)
    img = jnp.asarray(batch["img"])
    ch = jnp.asarray(batch["cam_height"])

    v_loop = loop.init(jax.random.PRNGKey(0), img, ch)
    save_params_only(str(tmp_path / "perblock.npz"), v_loop["params"],
                     v_loop.get("batch_stats", {}))

    v_scan_tmpl = scan.init(jax.random.PRNGKey(1), img, ch)
    p_scan, s_scan = load_params_only(str(tmp_path / "perblock.npz"),
                                      v_scan_tmpl["params"],
                                      v_scan_tmpl.get("batch_stats", {}))
    out_a = loop.apply(v_loop, img, ch, method=loop.predict_depth)
    out_b = scan.apply({"params": p_scan, "batch_stats": s_scan}, img, ch,
                       method=scan.predict_depth)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               rtol=1e-5, atol=1e-5)

    # reverse direction: stacked npz -> per-block model
    save_params_only(str(tmp_path / "stacked.npz"), p_scan, s_scan)
    p_back, s_back = load_params_only(str(tmp_path / "stacked.npz"),
                                      v_loop["params"],
                                      v_loop.get("batch_stats", {}))
    for a, b in zip(jax.tree.leaves(p_back),
                    jax.tree.leaves(v_loop["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_spatial_sharding_matches_replicated():
    """GSPMD width-axis sharding of the eval forward == replicated run."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from gedepth_tpu.parallel import create_mesh, spatial_sharding

    model = _model()
    rng_np = np.random.default_rng(0)
    img = rng_np.standard_normal((1, 32, 64, 5)).astype(np.float32)
    img[..., 4] = np.abs(img[..., 4]) * 30 + 1
    ch = np.full((1,), 1.65, np.float32)
    v = model.init(jax.random.PRNGKey(0), jnp.asarray(img), jnp.asarray(ch))

    mesh = create_mesh()
    img_s = jax.device_put(jnp.asarray(img), spatial_sharding(mesh))
    v_r = jax.device_put(v, NamedSharding(mesh, P()))
    ch_r = jax.device_put(jnp.asarray(ch), NamedSharding(mesh, P()))
    fwd = jax.jit(lambda vv, x, c: model.apply(vv, x, c,
                                               method=model.predict_depth))
    out_s = np.asarray(fwd(v_r, img_s, ch_r))
    out_r = np.asarray(fwd(v, jnp.asarray(img), jnp.asarray(ch)))
    np.testing.assert_allclose(out_s, out_r, rtol=1e-4, atol=1e-4)
