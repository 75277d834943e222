#!/usr/bin/env python
"""Stage-1 ground-mask pretraining CLI (produces the backbone overlay that
the reference ships as pretrain/pe_checkpoint.pth).

Usage:
  python tools/pretrain_pe_mask.py <config-name> [--max-iters N]
      [--work-dir DIR] [--options ...]

Saves <work_dir>/pe_mask_backbone.npz; pass it to tools/train.py via
--load-backbone-from.
"""
import argparse
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("config")
    parser.add_argument("--max-iters", type=int, default=None)
    parser.add_argument("--work-dir", default=None)
    parser.add_argument("--options", nargs="*", default=None)
    args = parser.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from gedepth_tpu.configs import get_config
    from gedepth_tpu.models.pretrain import (
        GroundMaskPretrain, ground_mask_gt, weighted_ce_ignore,
        extract_backbone)
    from gedepth_tpu.train import make_optimizer, create_train_state
    from gedepth_tpu.train.checkpoint import save_params_only
    from gedepth_tpu.train.loop import (
        build_datasets, build_train_pipeline, JsonlLogger)
    from gedepth_tpu.data import TrainLoader
    from gedepth_tpu.parallel import create_mesh_for_batch, shard_batch
    from tools.train import apply_options

    cfg = get_config(args.config)
    cfg = apply_options(cfg, args.options)
    work_dir = args.work_dir or osp.join(cfg.work_dir,
                                         cfg.name + "_pe_mask_pretrain")
    os.makedirs(work_dir, exist_ok=True)
    logger = JsonlLogger(osp.join(work_dir, "train.log.jsonl"))
    max_iters = args.max_iters or cfg.train.max_iters

    model = GroundMaskPretrain(
        embed_dims=cfg.model.embed_dims, depths=cfg.model.depths,
        num_heads=cfg.model.num_heads, window=cfg.model.window,
        drop_path_rate=cfg.model.drop_path_rate,
        neck_channels=cfg.model.neck_channels,
        neck_embed_dim=cfg.model.neck_embed_dim,
        neck_num_points=cfg.model.neck_num_points)

    train_ds, _ = build_datasets(cfg)
    pipeline = build_train_pipeline(cfg)
    loader = TrainLoader(train_ds, pipeline, cfg.train.global_batch,
                         seed=cfg.train.seed, sampling=cfg.train.sampling)
    mesh = create_mesh_for_batch(cfg.train.global_batch)
    tx, schedule = make_optimizer(
        cfg.optim.max_lr, max_iters, cfg.optim.warmup_iters,
        cfg.optim.warmup_ratio, cfg.optim.min_lr_ratio,
        cfg.optim.weight_decay, cfg.optim.betas, cfg.optim.grad_clip_norm)

    batch_iter = iter(loader)
    first = shard_batch(next(batch_iter), mesh)
    state = create_train_state(model, tx, first["img"],
                               jax.random.PRNGKey(cfg.train.seed),
                               first.get("cam_height"))

    def loss_fn(params, batch_stats, batch, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        logits, mutated = model.apply(
            variables, batch["img"], None, True,
            rngs={"dropout": rng}, mutable=["batch_stats"])
        # mask GT: PE input channel (denormalised) vs depth GT
        pe = batch["img"][..., 4]
        gt = batch["depth_gt"]
        err = jnp.abs(pe - gt) / jnp.maximum(gt, 1e-6)
        labels = jnp.where((gt > 0) & (err <= 0.03), 1.0, 0.0)
        loss = weighted_ce_ignore(logits, labels)
        return loss, (mutated["batch_stats"], loss)

    @jax.jit
    def train_step(state, batch, rng):
        (_, (new_stats, loss)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch,
                                   rng)
        return state.apply_gradients(grads, new_stats), loss

    rng = jax.random.PRNGKey(cfg.train.seed + 1)
    batch = first
    t0 = time.time()
    for it in range(max_iters):
        rng, sub = jax.random.split(rng)
        state, loss = train_step(state, batch, sub)
        if it + 1 < max_iters:
            batch = shard_batch(next(batch_iter), mesh)
        if (it + 1) % cfg.train.log_interval == 0:
            rec = {"iter": it + 1, "mask_ce": float(loss),
                   "time": round(time.time() - t0, 2), "mode": "train"}
            t0 = time.time()
            logger.log(rec)
            print(f"iter {it+1}/{max_iters} mask_ce={rec['mask_ce']:.4f}",
                  flush=True)

    # final ground-mask IoU eval (reference maskpe_eval buckets,
    # kitti.py:387-461: per-image IoU vs the "PE within 5% of lidar" GT,
    # plus >=60 / >=75 bucket fractions)
    from gedepth_tpu.eval.mask_iou import (
        MaskIoUAccumulator, pe_ground_truth_mask)

    @jax.jit
    def infer(params, batch_stats, img):
        logits = model.apply({"params": params, "batch_stats": batch_stats},
                             img, None, False)
        return jnp.argmax(logits, axis=-1)

    acc = MaskIoUAccumulator()
    for _ in range(4):
        b = next(batch_iter)
        pred = np.asarray(infer(state.params, state.batch_stats,
                                jnp.asarray(b["img"])))
        pe = np.asarray(b["img"])[..., 4]
        gt = np.asarray(b["depth_gt"])
        for i in range(pred.shape[0]):
            acc.add(pred[i] == 1, pe_ground_truth_mask(pe[i], gt[i]))
    summary = acc.summary()
    logger.log({"mode": "val", **summary})
    print(f"ground-mask IoU: miou={summary['miou']:.2f} "
          f">=60: {summary['frac_over_60']:.2f} "
          f">=75: {summary['frac_over_75']:.2f} (n={summary['n']})",
          flush=True)

    out = osp.join(work_dir, "pe_mask_backbone.npz")
    save_params_only(out, extract_backbone(state.params))
    print(f"saved backbone overlay to {out}")


if __name__ == "__main__":
    main()
