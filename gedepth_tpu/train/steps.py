"""Pure jit-able train / eval steps.

One `jax.jit`-compiled function per phase; GSPMD handles gradient
all-reduce, global BN statistics (SyncBN parity) and loss-scalar reduction
from the input shardings — there are no explicit collectives here.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from gedepth_tpu.models.losses import sigloss, softmax_ce_ignore
from gedepth_tpu.ops.resize import resize_bilinear


def make_train_step(model, sig_loss_weight: float = 1.0,
                    slope_ce_weight: float = 0.08,
                    sig_max_depth: Optional[float] = None,
                    donate: bool = True, bf16: bool = False):
    """Returns train_step(state, batch, rng) -> (state, metrics).

    batch dict:
      img        (B, H, W, 5|3) float32
      depth_gt   (B, H, W) float32, 0 = invalid
      pe_k_gt    (B, H, W) slope classes (adaptive only)
      cam_height (B,)

    bf16=True (TrainConfig.bf16_compute) runs the model forward/backward
    in bfloat16 — params and inputs are cast at the apply boundary, so the
    master params, optimizer state, losses, and gradients stay float32
    (grads flow back through the cast). Halves the activation HBM traffic
    on TPU; no loss scaling needed at bf16's exponent range. Smoke-scale
    loss-trajectory parity vs f32 is tested in
    tests/test_train.py::test_bf16_train_step_tracks_f32.
    """
    adaptive = model.pe_variant == "adaptive"

    def loss_fn(params, batch_stats, batch, rng):
        apply_params = params
        img = batch["img"]
        if bf16:
            apply_params = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x, params)
            img = img.astype(jnp.bfloat16)
        variables = {"params": apply_params}
        mutable = []
        if batch_stats:
            variables["batch_stats"] = batch_stats
            mutable = ["batch_stats"]
        out, mutated = model.apply(
            variables, img, batch.get("cam_height"), True,
            rngs={"dropout": rng}, mutable=mutable)
        new_stats = mutated.get("batch_stats", batch_stats)
        if bf16 and new_stats:
            # BN running stats must keep the master (f32) dtypes or the
            # donated state changes structure across steps
            new_stats = jax.tree.map(lambda new, old: new.astype(old.dtype),
                                     new_stats, batch_stats)

        gt = batch["depth_gt"][..., None]
        depth = resize_bilinear(out["depth"].astype(jnp.float32),
                                gt.shape[1:3], align_corners=True)
        loss_depth = sig_loss_weight * sigloss(
            depth, gt, max_depth=sig_max_depth)
        metrics = {"loss_depth": loss_depth}
        total = loss_depth
        if adaptive:
            loss_slope = slope_ce_weight * softmax_ce_ignore(
                out["slope_logits"].astype(jnp.float32), batch["pe_k_gt"])
            metrics["loss_slope"] = loss_slope
            total = total + loss_slope
        metrics["loss"] = total
        return total, (new_stats, metrics)

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state, batch, rng):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (new_stats, metrics)), grads = grad_fn(
            state.params, state.batch_stats, batch, rng)
        metrics["grad_norm"] = optax_global_norm(grads)
        new_state = state.apply_gradients(grads, new_stats)
        return new_state, metrics

    return train_step


def make_zoo_train_step(model, sig_loss_weight: float = 10.0,
                        aux_loss_indices=(), aux_loss_weights=(),
                        class_ce_weight: float = 0.0,
                        chamfer_weight: float = 0.0,
                        donate: bool = True, bf16: bool = False):
    """Train step for the toolbox model zoo (ZooDepther archs).

    Loss composition per the reference `_base_/models/*.py` configs:
      * SigLoss * sig_loss_weight on the final depth (10 for adabins/
        binsformer/dpt, 1.0 for bts/densedepth);
      * BinsFormer aux supervision: SigLoss (and chamfer when enabled) on
        decoder layers `aux_loss_indices` scaled by `aux_loss_weights`
        (binsformer.py train_cfg aux_index=[2,5], aux_weight=[1/4,1/2]);
      * scene-class CE * class_ce_weight on the class-query logits when the
        batch carries 'scene_class' (binsformer.py loss_class 1e-2). The
        reference's aux-layer classify branch is dead debug code
        (binsformer_head.py:370-371 calls embed()/exit()); we apply the CE
        at the final layer only, which is what its main-loss path does;
      * bin-center chamfer * chamfer_weight (chamferloss.py; the shipped
        binsformer config declares it OFF).
    """

    def loss_fn(params, batch_stats, batch, rng):
        from gedepth_tpu.models.losses_extra import bins_chamfer_loss

        apply_params = params
        img = batch["img"]
        if bf16:
            apply_params = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x, params)
            img = img.astype(jnp.bfloat16)
        variables = {"params": apply_params}
        mutable = []
        if batch_stats:
            variables["batch_stats"] = batch_stats
            mutable = ["batch_stats"]
        out, mutated = model.apply(
            variables, img, batch.get("cam_height"), True,
            rngs={"dropout": rng}, mutable=mutable)
        new_stats = mutated.get("batch_stats", batch_stats)
        if bf16 and new_stats:
            new_stats = jax.tree.map(lambda new, old: new.astype(old.dtype),
                                     new_stats, batch_stats)

        gt = batch["depth_gt"][..., None]

        def depth_loss(d):
            d = resize_bilinear(d.astype(jnp.float32), gt.shape[1:3],
                                align_corners=True)
            return sig_loss_weight * sigloss(d, gt)

        metrics = {}
        total = metrics["loss_depth"] = depth_loss(out["depth"])
        if chamfer_weight and out.get("bin_edges") is not None:
            lc = chamfer_weight * bins_chamfer_loss(
                out["bin_edges"].astype(jnp.float32), batch["depth_gt"],
                min_depth=model.min_depth, loss_weight=1.0)
            metrics["loss_chamfer"] = lc
            total = total + lc
        if (class_ce_weight and out.get("class_logits") is not None
                and "scene_class" in batch):
            logits = out["class_logits"].astype(jnp.float32)
            nll = -jax.nn.log_softmax(logits, axis=-1)
            labels = batch["scene_class"].astype(jnp.int32)
            lce = class_ce_weight * jnp.mean(
                jnp.take_along_axis(nll, labels[:, None], axis=1))
            metrics["loss_ce"] = lce
            total = total + lce
        aux = out.get("aux_layer_outs") or []
        for idx, w in zip(aux_loss_indices, aux_loss_weights):
            if idx >= len(aux):
                continue
            la = w * depth_loss(aux[idx]["depth"])
            if chamfer_weight and aux[idx].get("bin_edges") is not None:
                la = la + w * chamfer_weight * bins_chamfer_loss(
                    aux[idx]["bin_edges"].astype(jnp.float32),
                    batch["depth_gt"], min_depth=model.min_depth,
                    loss_weight=1.0)
            metrics[f"aux_loss_depth_{idx}"] = la
            total = total + la
        metrics["loss"] = total
        return total, (new_stats, metrics)

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state, batch, rng):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (new_stats, metrics)), grads = grad_fn(
            state.params, state.batch_stats, batch, rng)
        metrics["grad_norm"] = optax_global_norm(grads)
        new_state = state.apply_gradients(grads, new_stats)
        return new_state, metrics

    return train_step


def ground_mask_labels(img, depth_gt, depth_scale: float):
    """Ground-mask classes from the PE prior vs lidar GT, in-jit
    (reference loading.py:337-351 mask semantics, same formula as
    models.pretrain.ground_mask_gt): class 1 where |pe - gt|/gt <= 3% and
    gt > 0, else class 0. `img` channel 3 is pe/depth_scale post-Normalize.
    """
    pe = img[..., 3] * depth_scale
    err = jnp.where(depth_gt > 0,
                    jnp.abs(pe - depth_gt) / jnp.maximum(depth_gt, 1e-6),
                    jnp.inf)
    return (err <= 0.03).astype(jnp.int32)


def make_seg_train_step(model, depth_scale: float = 200.0,
                        aux_weight: float = 0.4, donate: bool = True):
    """Train step for arch='seg' (the ocrnet_hr18 analogue).

    Cascade CE: stage weights 0.4 (FCN aux) / 1.0 (OCR final) per the
    reference base config (configs/_base_/models/ocrnet_hr18.py
    loss_decode.loss_weight); per-class weights (0.2, 1.0) matching the
    in-tree ground-mask task (reference maskpe_head.py:83). Labels are the
    PE ground mask derived on the fly from the batch (`ground_mask_labels`).
    """
    from gedepth_tpu.models.pretrain import weighted_ce_ignore

    def loss_fn(params, batch_stats, batch, rng):
        variables = {"params": params}
        mutable = []
        if batch_stats:
            variables["batch_stats"] = batch_stats
            mutable = ["batch_stats"]
        out, mutated = model.apply(
            variables, batch["img"], batch.get("cam_height"), True,
            rngs={"dropout": rng}, mutable=mutable)
        new_stats = mutated.get("batch_stats", batch_stats)

        labels = ground_mask_labels(batch["img"], batch["depth_gt"],
                                    depth_scale)
        logits = out["seg_logits"]
        stage_w = ([aux_weight] * (len(logits) - 1)) + [1.0]
        metrics = {}
        total = 0.0
        for i, (lw, lg) in enumerate(zip(stage_w, logits)):
            li = lw * weighted_ce_ignore(lg, labels)
            metrics[f"loss_seg{i}"] = li
            total = total + li
        metrics["loss"] = total
        return total, (new_stats, metrics)

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state, batch, rng):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (new_stats, metrics)), grads = grad_fn(
            state.params, state.batch_stats, batch, rng)
        metrics["grad_norm"] = optax_global_norm(grads)
        new_state = state.apply_gradients(grads, new_stats)
        return new_state, metrics

    return train_step


def optax_global_norm(tree):
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.sum(x.astype(jnp.float32) ** 2) for x in leaves))


def make_eval_step(model, flip_tta: bool = True, bf16: bool = False,
                   ratio: float = 1.0):
    """Returns eval_step(params, batch_stats, batch) -> (B, H, W) depth.

    Flip TTA runs the horizontally flipped batch through the model and
    averages the un-flipped predictions (reference encoder_decoder.py:249-274
    + MultiScaleFlipAug). Depth is clamped to [min, max] and resized to the
    input resolution.

    bf16=True casts params and activations to bfloat16 for the forward
    (flax layers follow input/param dtypes); output depth returns in f32.
    Roughly halves HBM traffic on TPU at some numerical cost — validate
    against the f32 metrics before shipping numbers.

    ratio != 1.0 is one view of multi-scale TTA (reference tools/test.py
    --aug-test + test_time_aug.py:102-127): the input is bilinearly resized
    by `ratio` (all channels, incl. the PE planes) before the forward, and
    the prediction is resized back to the base resolution. The scaled size
    snaps to a multiple of 32 so every pyramid level stays even (a design
    choice, not reference semantics: the reference's --aug-test pokes
    `pipeline[1]` which in the shipped GEDepth configs is
    LoadKITTICamIntrinsic, i.e. multi-ratio TTA is silently broken there —
    it only ever worked for the toolbox configs; we implement what it
    intended). Each ratio is its own static shape, hence its own jit.

    PE consistency: the scaled view resamples the geometry-derived PE
    channels EXACTLY — raw PE interpolates in inverse-depth space (1/pe is
    affine in pixel coordinates, resize_pe_exact) and the clipped input
    channel is recomputed from the resampled raw PE with the load-time
    clip/normalise rule (resize_img5_scaled) — so every scaled view feeds
    the same ground-plane prior the offline precompute would produce at
    the scaled resolution. cam_height is scale-invariant and passes
    through. (Flip TTA is pure reindexing; PE channels flip exactly.)
    """
    pe_clip_scale = float(getattr(model, "depth_scale", 200.0))

    @jax.jit
    def eval_step(params, batch_stats, batch):
        if bf16:
            params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
            batch = dict(batch,
                         img=batch["img"].astype(jnp.bfloat16))
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        ch = batch.get("cam_height")

        img = batch["img"]
        base_hw = img.shape[1:3]
        if ratio != 1.0:
            sh = max(32, int(round(base_hw[0] * ratio / 32)) * 32)
            sw = max(32, int(round(base_hw[1] * ratio / 32)) * 32)
            img = resize_img5_scaled(img, (sh, sw), pe_clip_scale)

        def run(im):
            out = model.apply(variables, im, ch, False)
            d = out["depth"].astype(jnp.float32)
            d = jnp.clip(d, model.min_depth, model.max_depth)
            return resize_bilinear(d, base_hw, align_corners=True)

        pred = run(img)
        if flip_tta:
            pred_f = run(img[:, :, ::-1, :])[:, :, ::-1, :]
            pred = 0.5 * (pred + pred_f)
        return pred[..., 0]

    return eval_step


def resize_pe_exact(pe_raw, size, bound: float = 1e6):
    """Resample the raw plane-embedding channel EXACTLY under bilinear
    resize, by interpolating in inverse-depth space.

    The analytic ground-plane depth is pe(u, v) = c / (a·u + b·v + d)
    (geometry/plane.py plane_embedding_from_projection), so 1/pe is AFFINE
    in pixel coordinates and bilinear interpolation of 1/pe is exact under
    any coordinate remap — including across the horizon line where pe
    itself diverges (1/pe crosses zero smoothly there). Interpolating pe
    directly (what a naive all-channel resize does) smears the divergence.

    Zeros in the input are the sanitize_pe_raw NaN row on the horizon,
    whose true inverse IS 0, so the forward map is total; outputs whose
    inverse magnitude falls below 1/bound are re-clamped to ±bound·sign
    (with exact 0 kept at 0), mirroring sanitize_pe_raw.
    """
    f32 = pe_raw.astype(jnp.float32)
    inv = jnp.where(f32 == 0.0, 0.0, 1.0 / jnp.where(f32 == 0.0, 1.0, f32))
    inv = resize_bilinear(inv, size, align_corners=False)
    small = jnp.abs(inv) < (1.0 / bound)
    pe = jnp.where(small, jnp.sign(inv) * bound,
                   1.0 / jnp.where(small, 1.0, inv))
    return pe.astype(pe_raw.dtype)


def resize_img5_scaled(img, size, pe_clip_scale: float):
    """Scale the 5-channel model input to `size` with geometry-consistent
    PE channels (multi-scale TTA view).

    RGB (ch 0-2) resizes bilinearly; raw PE (ch 4) resamples exactly in
    inverse space (resize_pe_exact); the clipped/normalised PE input
    (ch 3) is RECOMPUTED from the resampled raw PE with the load-time rule
    (clip_pe_for_input + Normalize: keep (0, clip], divide by depth_scale;
    reference loading.py:397-403 + our data/transforms.py Normalize) —
    `pe_clip_scale` is that shared clip bound / divisor (model depth_scale:
    200 KITTI, 250 DDAD). 3-channel inputs pass through a plain resize.
    """
    if img.shape[-1] != 5:
        return resize_bilinear(img, size, align_corners=False)
    rgb = resize_bilinear(img[..., :3], size, align_corners=False)
    pe_raw = resize_pe_exact(img[..., 4:5], size)
    pr = pe_raw.astype(jnp.float32)
    pe_in = jnp.where((pr > 0) & (pr <= pe_clip_scale),
                      pr / pe_clip_scale, 0.0).astype(img.dtype)
    return jnp.concatenate([rgb, pe_in, pe_raw], axis=-1)


def slide_positions(size: int, tile: int, stride: int):
    """Static window starts covering [0, size) (mmseg slide_inference
    grid: ceil((size - tile) / stride) + 1 windows, the last one pulled
    back flush with the border so every pixel is covered)."""
    if tile >= size:
        return [0]
    n = -(-(size - tile) // stride) + 1
    return [min(i * stride, size - tile) for i in range(n)]


def make_slide_eval_step(model, tile, stride, flip_tta: bool = True,
                         bf16: bool = False):
    """Sliding-window eval step: returns eval_step(params, batch_stats,
    batch) -> (B, H, W) depth.

    The reference declares test_cfg mode='slide' but leaves it
    NotImplementedError (encoder_decoder.py:218-222, mmseg's design); this
    implements what it intended, TPU-style: the window grid is static for
    a given input shape, every crop runs the SAME compiled forward at the
    (tile_h, tile_w) shape, and overlapping predictions are averaged via
    an accumulate/count pair (mmseg slide_inference semantics). Use when
    an image is larger than the trained crop and 'whole' mode would see
    unfamiliar absolute positions, or to bound activation memory on very
    large inputs (each forward is tile-sized regardless of image size).

    Depth is clamped per-crop (the reference clamps per-forward in
    encode_decode); flip TTA wraps the whole slide like 'whole' mode.
    """
    th, tw = int(tile[0]), int(tile[1])
    sh, sw = int(stride[0]), int(stride[1])
    if sh > th or sw > tw:
        raise ValueError(f"stride {stride} must not exceed tile {tile} "
                         "(uncovered gaps)")

    @jax.jit
    def eval_step(params, batch_stats, batch):
        if bf16:
            params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
            batch = dict(batch, img=batch["img"].astype(jnp.bfloat16))
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        ch = batch.get("cam_height")

        img = batch["img"]
        B, H, W = img.shape[0], img.shape[1], img.shape[2]
        if th > H or tw > W:
            raise ValueError(f"slide tile {(th, tw)} larger than input "
                             f"{(H, W)}; use mode='whole'")

        positions = [(y0, x0) for y0 in slide_positions(H, th, sh)
                     for x0 in slide_positions(W, tw, sw)]

        def run(im):
            # one lax.scan over the stacked crops keeps a single copy of
            # the model in the HLO no matter how many windows there are
            crops = jnp.stack([im[:, y0:y0 + th, x0:x0 + tw, :]
                               for (y0, x0) in positions])

            def body(_, crop):
                out = model.apply(variables, crop, ch, False)
                d = out["depth"].astype(jnp.float32)
                d = jnp.clip(d, model.min_depth, model.max_depth)
                return 0, resize_bilinear(d, (th, tw), align_corners=True)

            _, ds = jax.lax.scan(body, 0, crops)
            acc = jnp.zeros((B, H, W, 1), jnp.float32)
            cnt = jnp.zeros((1, H, W, 1), jnp.float32)
            for i, (y0, x0) in enumerate(positions):
                acc = acc.at[:, y0:y0 + th, x0:x0 + tw, :].add(ds[i])
                cnt = cnt.at[:, y0:y0 + th, x0:x0 + tw, :].add(1.0)
            return acc / cnt

        pred = run(img)
        if flip_tta:
            pred_f = run(img[:, :, ::-1, :])[:, :, ::-1, :]
            pred = 0.5 * (pred + pred_f)
        return pred[..., 0]

    return eval_step
