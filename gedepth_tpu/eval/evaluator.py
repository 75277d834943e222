"""Evaluation harness: TTA inference + reference-exact metric protocol.

KITTI protocol (reference kitti.py:502-552, BASELINE.md):
  * input kb-cropped to 352x1216 (no GT crop at load; GT reloaded full-res
    at eval), flip-TTA averaged predictions,
  * GT kb-cropped, garg mask, range (1e-3, 80), per-image 9 metrics,
  * nanmean aggregation over images.

DDAD protocol (reference ddad.py:216-254):
  * input resized to 384x640, no TTA,
  * prediction bilinearly upsampled (align_corners=True) to the full-res GT,
  * range mask only (1e-3, 200).

The device side runs at fixed shapes (EvalLoader pads the tail batch); the
per-image metric math runs in numpy for bit-parity with the reference.
"""
from __future__ import annotations

import numpy as np

from gedepth_tpu.core.metrics import (
    masked_metrics, aggregate_metrics, eval_kb_crop, eval_crop_mask,
    calculate_metrics, METRIC_NAMES)


def allgather_per_image(per_image):
    """Concatenate per-image metric tuples across processes.

    The multi-host analogue of the reference's collect_results_cpu
    (depth/apis/test.py:227-231), without the tmpdir/pickle dance: each
    process NaN-pads its (n_local, 9) metric rows to the max local count,
    one `process_allgather` moves them over the ICI/DCN fabric, and the
    padding rows are dropped on every host. All processes return the same
    full list (no rank-0-only results — callers don't need a broadcast)."""
    from jax.experimental import multihost_utils

    width = len(per_image[0]) if per_image else len(METRIC_NAMES)
    arr = np.asarray(per_image, np.float32).reshape(-1, width)
    counts = np.asarray(multihost_utils.process_allgather(
        np.asarray([arr.shape[0]], np.int32))).reshape(-1)
    maxn = int(counts.max())
    if maxn == 0:
        return []
    pad = np.full((maxn - arr.shape[0], width), np.nan, np.float32)
    gathered = np.asarray(multihost_utils.process_allgather(
        np.concatenate([arr, pad], axis=0)))
    gathered = gathered.reshape(-1, maxn, width)
    rows = []
    for p, cnt in enumerate(counts):
        for r in gathered[p][:int(cnt)]:
            rows.append(tuple(float(x) for x in r))
    return rows
from gedepth_tpu.data import (
    Compose, KBCrop, Normalize, DDADResize, EvalLoader)
from gedepth_tpu.ops.resize import resize_bilinear
from gedepth_tpu.train.steps import make_eval_step, make_slide_eval_step


def build_test_pipeline(data_cfg):
    """Deterministic test-time pipeline for a DataConfig."""
    if data_cfg.dataset == "ddad":
        return Compose([
            DDADResize(data_cfg.ddad_resize or (384, 640), resize_gt=False),
            Normalize(depth_scale=250.0),
        ])
    if data_cfg.dataset == "kitti":
        return Compose([
            KBCrop(*data_cfg.eval_size, crop_gt=False),
            Normalize(depth_scale=200.0),
        ])
    # synthetic: already at target size
    return Compose([Normalize(depth_scale=200.0)])


class SegEvaluator:
    """Ground-mask segmentation eval (arch='seg', ocrnet_hr18 analogue).

    Mirrors the reference's dormant mask-PE IoU machinery
    (kitti.py:27-98,387-461): per-image intersection/union per class
    against the PE ground mask derived from the sample's PE channel and
    the lidar GT (same 3%-agreement formula the training labels use),
    aggregated into mIoU / per-class IoU / pixel accuracy. Only pixels
    with valid lidar are scored.
    """

    key_metric = "miou"
    rule = "greater"

    def __init__(self, model, dataset, data_cfg, batch_size=1,
                 process_index=None, process_count=None):
        import jax

        self.model = model
        self.dataset = dataset
        self.data_cfg = data_cfg
        self.batch_size = batch_size
        self.pipeline = build_test_pipeline(data_cfg)
        self.depth_scale = 250.0 if data_cfg.dataset == "ddad" else 200.0
        self.process_index = (jax.process_index() if process_index is None
                              else process_index)
        self.process_count = (jax.process_count() if process_count is None
                              else process_count)

    def run(self, params, batch_stats, max_images=None, progress=None,
            on_prediction=None, compute_metrics=True):
        import jax
        import jax.numpy as jnp

        model = self.model

        @jax.jit
        def seg_step(params, batch_stats, img, ch):
            variables = {"params": params}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            out = model.apply(variables, img, ch, False)
            return jnp.argmax(out["seg_logits"][-1], axis=-1)

        multihost = self.process_count > 1
        if multihost:
            params = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)),
                                  params)
            batch_stats = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)),
                                       batch_stats)
        n_cls = self.model.num_classes
        inter = np.zeros(n_cls)
        union = np.zeros(n_cls)
        correct = total = 0
        done = 0
        loader = EvalLoader(self.dataset, self.pipeline, self.batch_size,
                            shard_index=self.process_index if multihost else 0,
                            shard_count=self.process_count if multihost else 1)
        for batch, valid in loader:
            preds = np.asarray(seg_step(
                params, batch_stats, jnp.asarray(batch["img"]),
                jnp.asarray(batch["cam_height"])
                if "cam_height" in batch else None))
            for row in range(preds.shape[0]):
                if not valid[row]:
                    continue
                index = int(batch["index"][row])
                if on_prediction is not None:
                    on_prediction(index, preds[row])
                img = batch["img"][row]
                if hasattr(self.dataset, "load_gt"):
                    gt = self.dataset.load_gt(index)
                else:
                    gt = self.dataset[index].get("depth_gt")
                if gt is None or not compute_metrics:
                    continue
                if gt.shape != preds[row].shape:  # kitti full-res GT
                    gt = eval_kb_crop(gt, *self.data_cfg.eval_size)
                pe = img[..., 3] * self.depth_scale
                label = ((np.abs(pe - gt) <= 0.03 * gt) & (gt > 0))
                vmask = gt > 0
                p, l = preds[row][vmask], label[vmask].astype(np.int64)
                for c in range(n_cls):
                    inter[c] += np.sum((p == c) & (l == c))
                    union[c] += np.sum((p == c) | (l == c))
                correct += np.sum(p == l)
                total += p.size
                done += 1
                if progress is not None and done % progress == 0:
                    print(f"  eval {done}/{len(self.dataset)}", flush=True)
                if max_images is not None and done >= max_images:
                    break
            if max_images is not None and done >= max_images:
                break
        if multihost:
            # sum the confusion counts across processes (the seg analogue
            # of collect_results_cpu); every process returns the same agg
            from jax.experimental import multihost_utils
            packed = np.concatenate(
                [inter, union, [correct, total]]).astype(np.float64)
            packed = np.asarray(
                multihost_utils.process_allgather(packed)).reshape(
                    self.process_count, -1).sum(axis=0)
            inter, union = packed[:n_cls], packed[n_cls:2 * n_cls]
            correct, total = packed[-2], packed[-1]
        iou = inter / np.maximum(union, 1)
        agg = {"miou": float(iou.mean()),
               "acc": float(correct / max(total, 1))}
        for c in range(n_cls):
            agg[f"iou_cls{c}"] = float(iou[c])
        return agg, []


class Evaluator:
    key_metric = "abs_rel"
    rule = "less"

    def __init__(self, model, dataset, data_cfg, batch_size=1,
                 flip_tta=None, ms_ratios=(), device_metrics=False,
                 bf16=False, mode=None, slide_tile=None, slide_stride=None,
                 data_mesh=None, process_index=None, process_count=None):
        """ms_ratios: extra multi-scale TTA ratios (reference --aug-test);
        the predictions of every ratio (each at base resolution, each
        flip-averaged when flip TTA is on) are averaged uniformly —
        reference aug_test (encoder_decoder.py:249-274) sums over views.

        device_metrics=True computes the 9 per-image metrics on the TPU
        via `batched_masked_metrics_jax` (one jitted call per batch) instead
        of the per-image numpy path; GT load + crop/mask stay on host (the
        protocol's full-res GT reload). Same numbers to float tolerance —
        see test_metrics.py device/numpy agreement test.

        bf16=True runs the jitted eval forward in bfloat16 (depth
        clamps / final resize stay f32 — make_eval_step); metric
        deltas quantified in tests/test_composite_deltas.py.

        mode='slide' runs sliding-window inference (the reference's
        declared-but-NotImplemented test_cfg mode, encoder_decoder.py:
        218-222) with window `slide_tile` and step `slide_stride`
        (defaults: the config's train crop size / half of it); overlaps
        are averaged. Incompatible with ms_ratios.

        data_mesh: a 1-D local-device Mesh — eval batches shard over its
        data axis so a full-split eval uses every chip (batch_size must be
        a multiple of the mesh size); identical metrics to the
        single-device path, tests/test_multidevice_eval.py.

        process_index / process_count: multi-host eval — this process runs
        the strided dataset shard and `run` allgathers per-image metric
        rows across processes before aggregation (the reference's
        multi_gpu_test + collect_results_cpu, depth/apis/test.py:148-232).
        Defaults to jax.process_index()/process_count() so multi-host runs
        shard automatically; pass 0/1 to force a full local eval."""
        import jax

        self.model = model
        self.dataset = dataset
        self.data_cfg = data_cfg
        self.batch_size = batch_size
        self.device_metrics = device_metrics
        self.data_mesh = data_mesh
        self.process_index = (jax.process_index() if process_index is None
                              else process_index)
        self.process_count = (jax.process_count() if process_count is None
                              else process_count)
        if data_mesh is not None:
            assert batch_size % data_mesh.devices.size == 0, (
                f"batch_size {batch_size} must be a multiple of the eval "
                f"mesh size {data_mesh.devices.size}")
        flip = data_cfg.eval_flip_tta if flip_tta is None else flip_tta
        mode = mode or getattr(data_cfg, "eval_mode", "whole")
        if mode == "slide":
            assert not ms_ratios, "slide mode does not compose with " \
                "multi-scale TTA (pick one)"
            tile = slide_tile or data_cfg.crop_size
            stride = slide_stride or (tile[0] // 2, tile[1] // 2)
            self.eval_steps = [make_slide_eval_step(
                model, tile, stride, flip_tta=flip, bf16=bf16)]
        else:
            ratios = tuple(ms_ratios) or (1.0,)
            self.eval_steps = [make_eval_step(model, flip_tta=flip, ratio=r,
                                              bf16=bf16)
                               for r in ratios]
        self.eval_step = self.eval_steps[0]
        self.pipeline = build_test_pipeline(data_cfg)

    def _gt_for(self, index):
        if hasattr(self.dataset, "load_gt"):
            return self.dataset.load_gt(index)
        # synthetic: the sample carries its GT
        return self.dataset[index]["depth_gt"]

    def _gt_mask_for(self, pred, index):
        """Host-side protocol prep: (gt, valid_mask, pred') aligned shapes."""
        gt = self._gt_for(index)
        if self.data_cfg.dataset == "kitti":
            gt = eval_kb_crop(gt, *self.data_cfg.eval_size)
            mask = eval_crop_mask(gt, self.model.min_depth,
                                  self.model.max_depth,
                                  garg_crop=self.data_cfg.garg_crop,
                                  eigen_crop=self.data_cfg.eigen_crop)
            return gt, mask, pred
        if self.data_cfg.dataset == "ddad":
            pred_up = np.asarray(resize_bilinear(
                pred[None, :, :, None].astype(np.float32), gt.shape,
                align_corners=True))[0, :, :, 0]
            mask = (gt > self.model.min_depth) & (gt < self.model.max_depth)
            return gt, mask, pred_up
        mask = eval_crop_mask(gt, self.model.min_depth, self.model.max_depth,
                              garg_crop=self.data_cfg.garg_crop,
                              eigen_crop=self.data_cfg.eigen_crop)
        return gt, mask, pred

    def _device_metrics_batch(self, rows):
        """rows: list of (gt, mask, pred) with identical shapes -> list of
        9-metric dicts computed on device in one jitted call."""
        import jax
        import jax.numpy as jnp
        from gedepth_tpu.core.metrics import batched_masked_metrics_jax

        if not hasattr(self, "_dev_metrics_fn"):
            self._dev_metrics_fn = jax.jit(batched_masked_metrics_jax)
        gt = jnp.asarray(np.stack([r[0] for r in rows]))
        mask = jnp.asarray(np.stack([r[1] for r in rows]))
        pred = jnp.asarray(np.stack([r[2] for r in rows]))
        vals = np.asarray(self._dev_metrics_fn(gt, pred, mask))
        # same shape as calculate_metrics: per-image tuples in
        # METRIC_NAMES order
        return [tuple(row) for row in vals]

    def _metrics_for(self, pred, index):
        gt = self._gt_for(index)
        if self.data_cfg.dataset == "kitti":
            gt = eval_kb_crop(gt, *self.data_cfg.eval_size)
            mask = eval_crop_mask(gt, self.model.min_depth,
                                  self.model.max_depth,
                                  garg_crop=self.data_cfg.garg_crop,
                                  eigen_crop=self.data_cfg.eigen_crop)
            return calculate_metrics(gt[mask], pred[mask])
        if self.data_cfg.dataset == "ddad":
            # upsample pred to GT resolution, align_corners=True
            pred_up = np.asarray(resize_bilinear(
                pred[None, :, :, None].astype(np.float32), gt.shape,
                align_corners=True))[0, :, :, 0]
            mask = (gt > self.model.min_depth) & (gt < self.model.max_depth)
            return calculate_metrics(gt[mask], pred_up[mask])
        # synthetic: straight range mask
        mask = eval_crop_mask(gt, self.model.min_depth, self.model.max_depth,
                              garg_crop=self.data_cfg.garg_crop,
                              eigen_crop=self.data_cfg.eigen_crop)
        return calculate_metrics(gt[mask], pred[mask])

    def _finalize(self, per_image):
        if self.process_count > 1:
            per_image = allgather_per_image(per_image)
        return (aggregate_metrics(per_image) if per_image else {}), per_image

    def run(self, params, batch_stats, max_images=None, progress=None,
            on_prediction=None, compute_metrics=True):
        """Evaluate; optionally stream predictions to `on_prediction(index,
        pred)` (used by --show-dir / --format-only dumps).

        Multi-host (process_count > 1): each process evaluates its strided
        dataset shard on its own devices and the per-image metric rows are
        allgathered at the end — all processes return the same aggregate.
        `max_images` then bounds images PER PROCESS."""
        import jax
        import jax.numpy as jnp

        multihost = self.process_count > 1
        if multihost:
            # One host fetch per eval run: params/batch_stats are replicated
            # across the global mesh, so every process can read its local
            # replica and re-place it on its own devices — the per-rank
            # model replica of the reference's multi_gpu_test.
            params = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)),
                                  params)
            batch_stats = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)),
                                       batch_stats)

        batch_sharding = None
        if self.data_mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            batch_sharding = NamedSharding(
                self.data_mesh, P(self.data_mesh.axis_names[0]))

        loader = EvalLoader(self.dataset, self.pipeline, self.batch_size,
                            shard_index=self.process_index if multihost else 0,
                            shard_count=self.process_count if multihost else 1)
        n_shard = len(loader) * self.batch_size
        per_image = []
        done = 0
        for batch, valid in loader:
            jb = {k: jnp.asarray(v) for k, v in batch.items()
                  if k in ("img", "cam_height")}
            if batch_sharding is not None:
                # shard the eval batch over the (local) data mesh so the
                # full-split eval uses every chip
                jb = {k: jax.device_put(v, batch_sharding)
                      for k, v in jb.items()}
            # np.asarray of a jax array is a read-only view — accumulate
            # into a fresh host buffer
            preds = np.array(self.eval_steps[0](params, batch_stats, jb))
            if len(self.eval_steps) > 1:
                for step in self.eval_steps[1:]:
                    preds += np.asarray(step(params, batch_stats, jb))
                preds /= len(self.eval_steps)
            device_rows = []
            for row in range(preds.shape[0]):
                if not valid[row]:
                    continue
                index = int(batch["index"][row])
                if on_prediction is not None:
                    on_prediction(index, preds[row])
                if compute_metrics:
                    if self.device_metrics:
                        device_rows.append(
                            self._gt_mask_for(preds[row], index))
                    else:
                        per_image.append(self._metrics_for(preds[row], index))
                done += 1
                if progress is not None and done % progress == 0:
                    print(f"  eval {done}/{n_shard}", flush=True)
                if max_images is not None and done >= max_images:
                    if device_rows:
                        per_image.extend(
                            self._device_metrics_batch(device_rows))
                    return self._finalize(per_image)
            if device_rows:
                per_image.extend(self._device_metrics_batch(device_rows))
        return self._finalize(per_image)
