"""Named experiment presets mirroring the reference's shipped configs."""
from __future__ import annotations

import dataclasses

from gedepth_tpu.configs.base import (
    ModelConfig, DataConfig, OptimConfig, TrainConfig, ExperimentConfig)


def _kitti_data():
    return DataConfig()


def _ddad_data():
    return DataConfig(
        dataset="ddad", data_root="data/DDAD",
        train_split="splits/ddad_train_split.txt",
        test_split="splits/ddad_val_split.txt",
        crop_size=(384, 640), eval_size=(384, 640),
        garg_crop=False, eigen_crop=False, eval_flip_tta=False,
        flip_prob=0.0, ddad_resize=(384, 640))


def _nyu_data():
    # reference configs/_base_/datasets/nyu.py
    return DataConfig(
        dataset="nyu", data_root="data/nyu",
        train_split="splits/nyu_train.txt", test_split="splits/nyu_test.txt",
        gt_depth_scale=1000.0, crop_size=(416, 544), eval_size=(416, 544),
        garg_crop=False, eigen_crop=True, flip_prob=0.5,
        eval_flip_tta=True)


def _ddad_model(variant):
    return ModelConfig(pe_variant=variant, max_depth=200.0,
                       depth_scale=250.0, default_cam_height=1.55)


# Production training presets prepare batches with 4 worker processes:
# measured (tools/bench_loader.py, round 5) the KITTI aug chain + PNG
# decode costs ~87 ms/sample/core, so a v5e-8 host needing
# 8 chips x batch 2 / 0.567 s/step = 28.2 samples/s wants >= 3 cores'
# worth; 4 workers gives ~46 samples/s (1.6x margin) on v5e host CPUs.
# Single-chip/smoke runs keep the default 0 (one prefetch thread,
# 11.5 samples/s >> the 3.5 one chip needs); on a 1-core box workers
# only add pool overhead.
def _train_kitti(**kw):
    return TrainConfig(num_workers=4, **kw)


_PRESETS = {
    # DepthFormer-SwinL baseline (no ground embedding), KITTI
    "depthformer_baseline_kitti": lambda: ExperimentConfig(
        name="depthformer_baseline_kitti",
        model=ModelConfig(pe_variant="none"), data=_kitti_data(),
        train=_train_kitti()),
    # configs/depthformer/depthformer_v.py
    "gedepth_vanilla_kitti": lambda: ExperimentConfig(
        name="gedepth_vanilla_kitti",
        model=ModelConfig(pe_variant="vanilla"), data=_kitti_data(),
        train=_train_kitti()),
    # configs/depthformer/depthformer_a.py
    "gedepth_adaptive_kitti": lambda: ExperimentConfig(
        name="gedepth_adaptive_kitti",
        model=ModelConfig(pe_variant="adaptive"), data=_kitti_data(),
        train=_train_kitti()),
    # TPU-native flagship: same GEDepth-Adaptive recipe with the windowed
    # deformable-attention neck (dense tiled local attention, no gathers —
    # ops/msda.py), scanned Swin block pairs (4x smaller HLO), and HI
    # self-attention queries starting at transformer level 1 (the
    # Mask2Former pixel-decoder design; finest grid stays value+lateral
    # only). hi_min_level=1 measured +20% on-chip (13.3 -> 16.0 img/s
    # bf16 @ 352x1216) with training dynamics indistinguishable from
    # level 0 at two model scales (NOTES.md r3). This is the intended
    # train-from-scratch production config on TPU; the
    # 'gedepth_adaptive_kitti' preset keeps exact mmcv-MSDA semantics for
    # converted-checkpoint parity evals.
    "gedepth_adaptive_kitti_tpu": lambda: ExperimentConfig(
        name="gedepth_adaptive_kitti_tpu",
        model=ModelConfig(pe_variant="adaptive", neck_sampling="windowed",
                          swin_scan=True, neck_hi_min_level=1),
        data=_kitti_data(),
        train=_train_kitti()),
    # Checkpoint-compatible fast mode: the REFERENCE parameter tree
    # (learned cross-attn reference points, unscaled mmcv offset bias —
    # loads the same converted .pth state dicts as 'gedepth_adaptive_kitti')
    # routed through the dense windowed Pallas sampler by clamping each
    # sample's displacement from its query grid center to +-radius level
    # pixels (models/hahi.py windowed_compat). Radius 6 default: abs-rel
    # delta vs the exact gather path is 4.7e-4 on converted Swin-S-scale
    # weights and stays 4.8e-4 with sampling offsets scaled to 4x their
    # init reach (tests/test_compat_stress.py); only an 8x-reach stress
    # crosses 1e-3 (1.6e-3). Verify per checkpoint with
    # models/hahi.compat_delta_px — drop to radius 4 (faster) when it
    # clears, lift to 8 for paranoid parity (7e-4 even at 8x reach).
    # swin_scan only changes the param LAYOUT (stacked pairs), not
    # values — checkpoint loading adapts either layout automatically
    # (swin.adapt_swin_layout).
    "gedepth_adaptive_kitti_compat": lambda: ExperimentConfig(
        name="gedepth_adaptive_kitti_compat",
        model=ModelConfig(pe_variant="adaptive",
                          neck_sampling="windowed_compat",
                          neck_window_radius=6, swin_scan=True),
        data=_kitti_data(),
        train=_train_kitti()),
    # THE parity serving config (round-5 north star, PARITY.md): the
    # compat parameter tree (loads converted reference checkpoints
    # unchanged) with the Swin backbone + decode-head convs in bf16 and
    # the HAHI/PE/slope/fusion metric path in f32
    # (ModelConfig.bf16_scope='backbone_head'; the caller casts the
    # matching param subtrees via
    # apis.inference.cast_params_bf16(scope='backbone_head')).
    # Conjunction numbers (round 5): 10.81 img/s on one v5e at 352x1216
    # batch 1 (>= the 10 img/s = 5x-A100 bar) with a measured COMBINED
    # abs-rel delta vs exact f32 of 5.9e-4 at init offset reach and
    # 7.0e-4 at 4x reach on stressed converted weights
    # (tests/test_compat_stress.py; only the 8x stress bound exceeds
    # 1e-3 at 2.6e-3). Full-bf16 serving (2.2e-3) busts the budget —
    # that is why this scope exists. bf16 HAHI would double the delta to
    # the budget edge (1.0e-3); bf16 head convs add nothing because the
    # fusion d*(1-y)+pe promotes back to f32 (NOTES.md round-5 table).
    # R sweep at this scope: R=6 9.68 img/s (delta 5.0e-4), R=5 10.81
    # (5.9e-4), R=4 10.86 (6.6e-4) — R=5 is the knee: R=4 buys ~nothing
    # and gives up stress margin. Per-checkpoint procedure unchanged:
    # run models/hahi.compat_delta_px and lift R if it flags.
    "gedepth_adaptive_kitti_parity": lambda: ExperimentConfig(
        name="gedepth_adaptive_kitti_parity",
        model=ModelConfig(pe_variant="adaptive",
                          neck_sampling="windowed_compat",
                          neck_window_radius=5, swin_scan=True,
                          bf16_scope="backbone_head"),
        data=_kitti_data(),
        train=_train_kitti()),
    # configs/depthformer/depthformer_v_ddad.py
    "gedepth_vanilla_ddad": lambda: ExperimentConfig(
        name="gedepth_vanilla_ddad", model=_ddad_model("vanilla"),
        data=_ddad_data(),
        optim=OptimConfig(warmup_iters=0),
        train=TrainConfig(max_iters=38400, global_batch=32,
                          num_workers=4)),
    # configs/depthformer/depthformer_a_ddad.py
    "gedepth_adaptive_ddad": lambda: ExperimentConfig(
        name="gedepth_adaptive_ddad", model=_ddad_model("adaptive"),
        data=_ddad_data(),
        optim=OptimConfig(warmup_iters=0),
        train=TrainConfig(max_iters=38400, global_batch=32,
                          num_workers=4)),
    # TPU-native DDAD flagship (same windowed-neck + scanned-Swin recipe
    # as gedepth_adaptive_kitti_tpu, DDAD data/recipe constants)
    "gedepth_adaptive_ddad_tpu": lambda: ExperimentConfig(
        name="gedepth_adaptive_ddad_tpu",
        model=dataclasses.replace(_ddad_model("adaptive"),
                                  neck_sampling="windowed", swin_scan=True,
                                  neck_hi_min_level=1),
        data=_ddad_data(),
        optim=OptimConfig(warmup_iters=0),
        train=TrainConfig(max_iters=38400, global_batch=32,
                          num_workers=4)),
    # ---- legacy toolbox model zoo (reference configs/_base_/models/*) ----
    # AdaBins: EfficientNet + mViT adaptive bins (_base_/models/adabins.py;
    # SigLoss loss_weight=10)
    "adabins_nyu": lambda: ExperimentConfig(
        name="adabins_nyu",
        model=ModelConfig(arch="adabins", backbone_variant="b0",
                          head_channels=128, n_bins=256, max_depth=10.0),
        data=_nyu_data(),
        optim=OptimConfig(sig_loss_weight=10.0),
        train=TrainConfig(max_iters=38400, global_batch=16)),
    # BTS: ResNet-50 + local planar guidance (_base_/models/bts.py;
    # SigLoss loss_weight=1.0 — explicit in the reference config)
    "bts_kitti": lambda: ExperimentConfig(
        name="bts_kitti",
        model=ModelConfig(arch="bts", backbone_variant="50",
                          head_channels=128, max_depth=80.0),
        data=_kitti_data()),
    # DPT: ViT-Base + reassemble/fusion head (_base_/models/dpt.py sets no
    # loss_decode -> the base head's default SigLoss loss_weight=10
    # applies, decode_head.py:306-308)
    "dpt_kitti": lambda: ExperimentConfig(
        name="dpt_kitti",
        model=ModelConfig(arch="dpt", head_channels=256, max_depth=80.0),
        data=_kitti_data(),
        optim=OptimConfig(sig_loss_weight=10.0)),
    # BinsFormer: Swin-T + bin-query transformer (_base_/models/
    # binsformer.py: SigLoss 10, aux layers [2,5] weights [1/4,1/2],
    # scene-class CE 1e-2, chamfer declared OFF)
    "binsformer_nyu": lambda: ExperimentConfig(
        name="binsformer_nyu",
        model=ModelConfig(arch="binsformer", n_bins=64, max_depth=10.0),
        data=dataclasses.replace(_nyu_data(), scene_classes=True),
        optim=OptimConfig(sig_loss_weight=10.0,
                          aux_loss_indices=(2, 5),
                          aux_loss_weights=(0.25, 0.5),
                          class_ce_weight=1e-2),
        train=TrainConfig(max_iters=38400, global_batch=16)),
    # DenseDepth: ResNet-50 + UpSample-chain (_base_/models/densedepth.py)
    "densedepth_kitti": lambda: ExperimentConfig(
        name="densedepth_kitti",
        model=ModelConfig(arch="densedepth", backbone_variant="50",
                          head_channels=128, max_depth=80.0),
        data=_kitti_data()),
    # OCRNet-HR18 (_base_/models/ocrnet_hr18.py): HRNet-W18 + FCN/OCR
    # cascade on the PE ground-mask segmentation task (the in-tree seg use;
    # eval = mask mIoU via SegEvaluator). pe_variant='vanilla' makes the
    # data layer load the PE channel the labels derive from.
    "ocrnet_hr18_kitti": lambda: ExperimentConfig(
        name="ocrnet_hr18_kitti",
        model=ModelConfig(arch="seg", backbone_variant="w18",
                          head_channels=64, pe_variant="vanilla"),
        data=_kitti_data()),
    # Swin-T smoke config on synthetic data (tests / CI / benchmarks)
    "smoke_synthetic": lambda: ExperimentConfig(
        name="smoke_synthetic",
        model=ModelConfig(
            embed_dims=48, depths=(1, 1, 2, 1), num_heads=(2, 4, 8, 16),
            neck_channels=(64, 48, 96, 192, 384), neck_embed_dim=128,
            neck_num_points=4, drop_path_rate=0.1, pe_variant="adaptive"),
        data=DataConfig(dataset="synthetic", crop_size=(96, 192),
                        eval_size=(96, 192), synthetic_size=16),
        optim=OptimConfig(warmup_iters=10),
        train=TrainConfig(max_iters=50, global_batch=2, eval_interval=25,
                          checkpoint_interval=25)),
}


def list_configs():
    return sorted(_PRESETS)


def get_config(name: str, **overrides) -> ExperimentConfig:
    if name not in _PRESETS:
        raise KeyError(
            f"unknown config {name!r}; available: {', '.join(list_configs())}")
    cfg = _PRESETS[name]()
    if overrides:
        cfg = dataclasses.replace(cfg, **overrides)
    return cfg
