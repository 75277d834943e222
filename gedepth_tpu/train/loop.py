"""Iteration-based training loop.

Replaces the reference's mmcv IterBasedRunner + hook stack (SURVEY.md §1 L4):
explicit loop with periodic eval (best-abs_rel tracking, rule 'less'),
orbax checkpointing (keep-N), JSONL text logging (tools/analyze_logs.py
consumes it) and optional TensorBoard scalars.
"""
from __future__ import annotations

import json
import os
import os.path as osp
import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from gedepth_tpu.configs.base import ExperimentConfig
from gedepth_tpu.data import (
    Compose, KBCrop, NYUCrop, RandomRatioResize, PadToSize, RandomRotate,
    RandomFlip, RandomCrop, ColorAug, Normalize, DDADResize, TrainLoader,
    SyntheticGroundDataset, KittiDataset, DDADDataset, NYUDataset)
from gedepth_tpu.data.wrappers import RepeatDataset
from gedepth_tpu.eval import Evaluator
from gedepth_tpu.eval.evaluator import SegEvaluator
from gedepth_tpu.parallel import create_mesh_for_batch, shard_batch
from gedepth_tpu.train.optim import make_optimizer
from gedepth_tpu.train.state import create_train_state
from gedepth_tpu.train.steps import make_seg_train_step, make_train_step
from gedepth_tpu.train.checkpoint import CheckpointKeeper, save_params_only


def build_train_pipeline(cfg: ExperimentConfig):
    d = cfg.data
    norm_scale = cfg.model.depth_scale
    if d.dataset == "ddad":
        return Compose([
            DDADResize(d.ddad_resize or (384, 640)),
            RandomRatioResize(d.ratio_range),
            PadToSize(*d.crop_size),
            RandomRotate(0.5, d.rotate_degree),
            RandomFlip(d.flip_prob),
            RandomCrop(d.crop_size),
            ColorAug(0.5),
            Normalize(depth_scale=norm_scale),
        ])
    if d.dataset == "kitti":
        return Compose([
            KBCrop(*d.eval_size, crop_gt=True),
            RandomRatioResize(d.ratio_range),
            PadToSize(*d.eval_size),
            RandomRotate(0.5, d.rotate_degree),
            RandomFlip(d.flip_prob),
            RandomCrop(d.crop_size),
            ColorAug(0.5),
            Normalize(depth_scale=norm_scale),
        ])
    if d.dataset in ("sunrgbd", "cityscapes", "nuscenes", "custom"):
        # toolbox extras: generic rotate/flip/crop/color pipeline (no
        # dataset-specific crop — their reference configs are per-user)
        return Compose([
            RandomRotate(0.5, d.rotate_degree),
            RandomFlip(d.flip_prob),
            RandomCrop(d.crop_size),
            ColorAug(0.5),
            Normalize(depth_scale=norm_scale),
        ])
    if d.dataset == "nyu":
        # reference configs/_base_/datasets/nyu.py train pipeline
        return Compose([
            NYUCrop(),
            RandomRotate(0.5, d.rotate_degree),
            RandomFlip(d.flip_prob),
            RandomCrop(d.crop_size),
            ColorAug(0.5),
            Normalize(depth_scale=norm_scale),
        ])
    # synthetic
    return Compose([
        RandomFlip(d.flip_prob),
        RandomCrop(d.crop_size),
        ColorAug(0.5),
        Normalize(depth_scale=norm_scale),
    ])


def build_datasets(cfg: ExperimentConfig):
    d = cfg.data
    use_pe = cfg.model.pe_variant != "none"
    adaptive = cfg.model.pe_variant == "adaptive"
    if d.dataset == "kitti":
        train = KittiDataset(d.data_root, d.train_split,
                             depth_scale=d.gt_depth_scale, use_pe=use_pe,
                             load_slope_gt=adaptive,
                             pe_clip=cfg.model.depth_scale,
                             min_depth=cfg.model.min_depth,
                             max_depth=cfg.model.max_depth,
                             garg_crop=d.garg_crop, eigen_crop=d.eigen_crop)
        test = KittiDataset(d.data_root, d.test_split,
                            depth_scale=d.gt_depth_scale, use_pe=use_pe,
                            load_slope_gt=False, test_mode=True,
                            pe_clip=cfg.model.depth_scale,
                            min_depth=cfg.model.min_depth,
                            max_depth=cfg.model.max_depth,
                            garg_crop=d.garg_crop, eigen_crop=d.eigen_crop)
    elif d.dataset == "ddad":
        train = DDADDataset(d.data_root, d.train_split, use_pe=use_pe,
                            load_slope_gt=adaptive,
                            pe_clip=cfg.model.depth_scale,
                            min_depth=cfg.model.min_depth,
                            max_depth=cfg.model.max_depth)
        test = DDADDataset(d.data_root, d.test_split, use_pe=use_pe,
                           load_slope_gt=False, test_mode=True,
                           pe_clip=cfg.model.depth_scale,
                           min_depth=cfg.model.min_depth,
                           max_depth=cfg.model.max_depth)
    elif d.dataset in ("nyu", "sunrgbd", "nuscenes"):
        from gedepth_tpu.data import SUNRGBDDataset, NuScenesDataset
        cls = {"nyu": NYUDataset, "sunrgbd": SUNRGBDDataset,
               "nuscenes": NuScenesDataset}[d.dataset]
        extra = ({"scene_classes": True}
                 if d.dataset == "nyu" and d.scene_classes else {})
        train = cls(d.data_root, d.train_split,
                    depth_scale=d.gt_depth_scale,
                    min_depth=cfg.model.min_depth,
                    max_depth=cfg.model.max_depth, **extra)
        test = cls(d.data_root, d.test_split,
                   depth_scale=d.gt_depth_scale, test_mode=True,
                   min_depth=cfg.model.min_depth,
                   max_depth=cfg.model.max_depth)
    elif d.dataset == "cityscapes":
        from gedepth_tpu.data import CityscapesDataset
        train = CityscapesDataset(d.data_root, d.train_split,
                                  min_depth=cfg.model.min_depth,
                                  max_depth=cfg.model.max_depth)
        test = CityscapesDataset(d.data_root, d.test_split, test_mode=True,
                                 min_depth=cfg.model.min_depth,
                                 max_depth=cfg.model.max_depth)
    elif d.dataset == "custom":
        from gedepth_tpu.data import CustomDepthDataset
        # qualitative inference folder: no GT, eval-only
        train = CustomDepthDataset(d.data_root)
        test = CustomDepthDataset(d.data_root)
    else:
        h, w = d.crop_size
        train = SyntheticGroundDataset(size=d.synthetic_size, height=h,
                                       width=w, use_pe=use_pe,
                                       depth_scale=cfg.model.depth_scale,
                                       max_depth=cfg.model.max_depth)
        eh, ew = d.eval_size
        test = SyntheticGroundDataset(size=max(d.synthetic_size // 4, 2),
                                      height=eh, width=ew, use_pe=use_pe,
                                      depth_scale=cfg.model.depth_scale,
                                      max_depth=cfg.model.max_depth, seed=1)
    if d.repeat_times > 1:
        train = RepeatDataset(train, d.repeat_times)
    return train, test


class JsonlLogger:
    def __init__(self, path):
        os.makedirs(osp.dirname(osp.abspath(path)), exist_ok=True)
        self.f = open(path, "a")

    def log(self, record: dict):
        self.f.write(json.dumps(record) + "\n")
        self.f.flush()


def train(cfg: ExperimentConfig, work_dir: Optional[str] = None,
          max_iters: Optional[int] = None, eval_max_images: Optional[int] = None,
          resume_state=None, load_backbone_from: Optional[str] = None,
          resume_from: Optional[str] = None):
    """Run training; returns (state, best_metrics).

    Multi-host (after jax.distributed.initialize, tools/train.py
    --multihost): every process runs this same function — the TrainLoader
    materialises only this process's batch rows, eval shards the test split
    across processes (per-image metrics allgathered), and file outputs
    (JSONL/TB/best-npz) are written by process 0 only. Orbax checkpoint
    saves stay collective (every process calls save; orbax coordinates the
    writes). Mirrors the reference's DistributedSampler + rank-0 hooks
    (depth/datasets/builder.py:123-125, depth/apis/train.py)."""
    is_main = jax.process_index() == 0
    work_dir = work_dir or osp.join(cfg.work_dir, cfg.name)
    os.makedirs(work_dir, exist_ok=True)
    from gedepth_tpu.utils.tensorboard import TensorboardLogger
    from gedepth_tpu.utils.env import collect_env
    if is_main:
        logger = JsonlLogger(osp.join(work_dir, "train.log.jsonl"))
        tb = TensorboardLogger(osp.join(work_dir, "tb"))
        logger.log({"mode": "env",
                    **{k: str(v) for k, v in collect_env().items()}})
    else:  # non-main processes: no file writes, no duplicate logs
        class _Null:
            def log(self, *a, **k): pass

            def scalars(self, *a, **k): pass
        logger = tb = _Null()
    max_iters = max_iters or cfg.train.max_iters

    model = cfg.model.build()
    train_ds, test_ds = build_datasets(cfg)
    pipeline = build_train_pipeline(cfg)
    loader = TrainLoader(train_ds, pipeline, cfg.train.global_batch,
                         seed=cfg.train.seed,
                         shard_index=jax.process_index(),
                         shard_count=jax.process_count(),
                         num_workers=cfg.train.num_workers,
                         sampling=cfg.train.sampling)

    mesh = create_mesh_for_batch(cfg.train.global_batch)
    tx, schedule = make_optimizer(
        cfg.optim.max_lr, max_iters, cfg.optim.warmup_iters,
        cfg.optim.warmup_ratio, cfg.optim.min_lr_ratio,
        cfg.optim.weight_decay, cfg.optim.betas, cfg.optim.grad_clip_norm)

    batch_iter = iter(loader)
    first = shard_batch(next(batch_iter), mesh)
    if resume_state is not None:
        state = resume_state
    else:
        state = create_train_state(model, tx, first["img"],
                                   jax.random.PRNGKey(cfg.train.seed),
                                   first.get("cam_height"))
    if resume_from:
        from gedepth_tpu.train.checkpoint import restore_checkpoint
        state = restore_checkpoint(resume_from, state)
        if is_main:
            print(f"resumed from {resume_from} at iter "
                  f"{int(state.step)}", flush=True)
    if load_backbone_from:
        # stage-1 ground-mask pretrain overlay (the reference hardcodes
        # pretrain/pe_checkpoint.pth at tools/train.py:65-81; we make it
        # an explicit flag)
        from gedepth_tpu.models.pretrain import overlay_backbone
        from gedepth_tpu.train.checkpoint import load_params_only
        src, _ = load_params_only(
            load_backbone_from, {"backbone": state.params["backbone"]})
        state = state.replace(
            params=overlay_backbone(state.params, src))
        if is_main:
            print(f"overlaid backbone from {load_backbone_from}", flush=True)

    from gedepth_tpu.models.zoo import ZOO_ARCHS
    from gedepth_tpu.train.steps import make_zoo_train_step
    arch = getattr(model, "arch", "")
    if arch == "seg":
        train_step = make_seg_train_step(model, cfg.model.depth_scale)
        evaluator = SegEvaluator(model, test_ds, cfg.data)
    elif arch in ZOO_ARCHS:
        train_step = make_zoo_train_step(
            model, cfg.optim.sig_loss_weight,
            cfg.optim.aux_loss_indices, cfg.optim.aux_loss_weights,
            cfg.optim.class_ce_weight, cfg.optim.chamfer_weight,
            bf16=cfg.train.bf16_compute)
        evaluator = Evaluator(model, test_ds, cfg.data)
    else:
        train_step = make_train_step(
            model, cfg.optim.sig_loss_weight, cfg.optim.slope_ce_weight,
            bf16=cfg.train.bf16_compute)
        evaluator = Evaluator(model, test_ds, cfg.data)
    # save-best metric: TrainConfig.save_best (reference checkpoint_config
    # save_best="abs_rel", eval_hooks.py greater/less rules); the
    # evaluator's own key is the fallback for metrics it doesn't publish
    # (a depth name on a seg run, or empty).
    less_is_better = {"abs_rel", "sq_rel", "rmse", "rmse_log", "log_10",
                      "silog"}
    published = ({"miou", "acc"} if evaluator.key_metric == "miou"
                 else less_is_better | {"a1", "a2", "a3"})
    key = cfg.train.save_best
    if key not in published:
        key = evaluator.key_metric
    sign = 1.0 if key in less_is_better else -1.0

    rng = jax.random.PRNGKey(cfg.train.seed + 1)
    best = {key: sign * float("inf")}
    keeper = None  # lazy async CheckpointKeeper (one manager per run)
    t_last = time.time()
    step0 = int(state.step)
    batch = first
    for it in range(step0, max_iters):
        rng, sub = jax.random.split(rng)
        state, metrics = train_step(state, batch, sub)
        if it + 1 < max_iters:
            batch = shard_batch(next(batch_iter), mesh)

        if (it + 1) % cfg.train.log_interval == 0:
            m = {k: float(v) for k, v in metrics.items()}
            m.update(iter=it + 1, lr=float(schedule(jnp.asarray(it))),
                     time=round(time.time() - t_last, 3), mode="train")
            t_last = time.time()
            logger.log(m)
            tb.scalars(it + 1, m, prefix="train/")
            if is_main:
                print(f"iter {it+1}/{max_iters} loss={m['loss']:.4f} "
                      f"lr={m['lr']:.2e}", flush=True)

        is_last = (it + 1) == max_iters
        if (it + 1) % cfg.train.eval_interval == 0 or is_last:
            agg, _ = evaluator.run(state.params, state.batch_stats,
                                   max_images=eval_max_images)
            agg_rec = {k: float(v) for k, v in agg.items()}
            agg_rec.update(iter=it + 1, mode="val")
            logger.log(agg_rec)
            tb.scalars(it + 1, agg_rec, prefix="val/")
            if is_main:
                print(f"eval @ {it+1}: " + " ".join(
                    f"{k}={agg[k]:.4f}" for k in (key, "rmse", "acc")
                    if k in agg), flush=True)
            if sign * agg[key] < sign * best.get(key, float("inf")):
                # eval metrics are allgathered, so `best` stays identical on
                # every process; only process 0 writes the npz
                best = dict(agg_rec)
                if is_main:
                    save_params_only(osp.join(work_dir, f"best_{key}.npz"),
                                     state.params, state.batch_stats)

        if (it + 1) % cfg.train.checkpoint_interval == 0 or is_last:
            # orbax saves are COLLECTIVE in multi-host runs: every process
            # must call save(); orbax routes the actual writes
            if keeper is None:
                keeper = CheckpointKeeper(osp.join(work_dir, "ckpts"),
                                          cfg.train.max_keep_ckpts)
            keeper.save(state, it + 1)

    if keeper is not None:
        keeper.close()
    return state, best
