"""Typed experiment configuration.

Replaces the reference's mmcv Config + `_base_` inheritance with plain frozen
dataclasses: explicit, greppable, and trivially serialisable into checkpoints.
Recipe constants mirror the shipped GEDepth configs
(configs/depthformer/depthformer_{v,a}[_ddad].py — see SURVEY.md §2.2).
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple


@dataclass(frozen=True)
class ModelConfig:
    # architecture family: 'gedepth' (DepthFormer+HAHI+PE) or a zoo arch
    # ('adabins' | 'bts' | 'dpt' | 'binsformer' | 'densedepth')
    arch: str = "gedepth"
    backbone_variant: str = ""        # zoo: resnet depth / efficientnet size
    backbone_embed_dims: int = 0      # zoo: 0 = arch default
    backbone_depth: int = 0           # zoo: 0 = arch default
    n_bins: int = 256                 # zoo: adabins/binsformer bins
    # backbone (Swin-L defaults)
    embed_dims: int = 192
    depths: Tuple[int, ...] = (2, 2, 18, 2)
    num_heads: Tuple[int, ...] = (6, 12, 24, 48)
    window: int = 7
    drop_path_rate: float = 0.3
    swin_scan: bool = False   # scan Swin block pairs (smaller HLO/compile)
    # neck
    neck_channels: Tuple[int, ...] = (64, 192, 384, 768, 1536)
    neck_embed_dim: int = 512
    neck_num_points: int = 8
    # 'bilinear' (reference semantics) | 'nearest' | 'windowed' (TPU-native
    # dense fast mode, train-from-scratch parameter tree) |
    # 'windowed_compat' (reference parameter tree + dense windowed sampling
    # with clamped displacements — loads converted reference checkpoints;
    # see gedepth_tpu/ops/msda.py and models/hahi.py)
    neck_sampling: str = "bilinear"
    neck_window_radius: int = 4
    # bf16 VALUE maps through the windowed sampler (halved band DMA;
    # offsets/weights/projections stay f32) — models/depther.py
    neck_value_bf16: bool = False
    # HI self-attention queries start at this transformer level
    # (hahi.py hi_min_level; train-from-scratch knob, params unchanged)
    neck_hi_min_level: int = 0
    # remat granularity: rematerialise Swin blocks / the MSDA sampling
    # tensors in the backward pass. Defaults trade recompute for ~100x
    # less live activation HBM (ops/msda.py); turning either off is only
    # viable at small crops/batches and is swept in NOTES.md.
    swin_remat: bool = True
    neck_msda_remat: bool = True
    # Mixed-precision serving scope (models/depther.py bf16_scope): run
    # this scope in bf16 and keep the PE/fusion/head metric path f32.
    # 'backbone' is the parity-grade serving precision: combined
    # windowed_compat(R=6)+bf16-backbone abs-rel delta vs exact f32 is
    # 5.0e-4 on stressed converted weights (1x-4x offset reach,
    # tests/test_composite_deltas.py round-5 table) — within the 0.001
    # released-checkpoint budget that full bf16 (2.2e-3) busts.
    bf16_scope: str = "none"      # 'none' | 'backbone' | 'backbone_neck'
    # head
    head_channels: int = 64
    min_depth: float = 1e-3
    max_depth: float = 80.0
    # PE subsystem
    pe_variant: str = "adaptive"          # 'none' | 'vanilla' | 'adaptive'
    depth_scale: float = 200.0
    vanilla_pe_multiplier: float = 200.0  # reference hardcodes 200
    default_cam_height: float = 1.65

    def build(self):
        if self.arch == "seg":
            # ocrnet_hr18 analogue (reference
            # configs/_base_/models/ocrnet_hr18.py): HRNet + FCN/OCR
            # cascade on the PE ground-mask task. ocr channel widths scale
            # with head_channels (default 64 -> the reference 512/256).
            from gedepth_tpu.models.segmentation import SegOCRNet
            return SegOCRNet(
                backbone_arch=self.backbone_variant or "w18",
                ocr_channels=8 * self.head_channels,
                ocr_key_channels=4 * self.head_channels,
                pe_variant=self.pe_variant,
                min_depth=self.min_depth, max_depth=self.max_depth,
                default_cam_height=self.default_cam_height)
        if self.arch != "gedepth":
            from gedepth_tpu.models.zoo import ZooDepther
            return ZooDepther(
                arch=self.arch, backbone_variant=self.backbone_variant,
                backbone_embed_dims=self.backbone_embed_dims,
                backbone_depth=self.backbone_depth,
                min_depth=self.min_depth, max_depth=self.max_depth,
                head_channels=self.head_channels, n_bins=self.n_bins,
                default_cam_height=self.default_cam_height)
        from gedepth_tpu.models import GEDepth
        return GEDepth(
            embed_dims=self.embed_dims, depths=self.depths,
            num_heads=self.num_heads, window=self.window,
            drop_path_rate=self.drop_path_rate,
            swin_scan=self.swin_scan,
            neck_channels=self.neck_channels,
            neck_embed_dim=self.neck_embed_dim,
            neck_num_points=self.neck_num_points,
            neck_sampling=self.neck_sampling,
            neck_window_radius=self.neck_window_radius,
            neck_value_bf16=self.neck_value_bf16,
            neck_hi_min_level=self.neck_hi_min_level,
            swin_remat=self.swin_remat,
            neck_msda_remat=self.neck_msda_remat,
            bf16_scope=self.bf16_scope,
            head_channels=self.head_channels,
            min_depth=self.min_depth, max_depth=self.max_depth,
            pe_variant=self.pe_variant, depth_scale=self.depth_scale,
            vanilla_pe_multiplier=self.vanilla_pe_multiplier,
            default_cam_height=self.default_cam_height)


@dataclass(frozen=True)
class DataConfig:
    dataset: str = "kitti"                # 'kitti' | 'ddad' | 'synthetic'
    data_root: str = "data/kitti"
    train_split: str = "splits/kitti_eigen_train.txt"
    test_split: str = "splits/kitti_eigen_test.txt"
    gt_depth_scale: float = 256.0         # png divisor
    crop_size: Tuple[int, int] = (352, 704)
    eval_size: Tuple[int, int] = (352, 1216)
    ratio_range: Tuple[float, float] = (0.5, 2.0)
    rotate_degree: float = 2.5
    flip_prob: float = 0.5
    garg_crop: bool = True
    eigen_crop: bool = False
    eval_flip_tta: bool = True
    # 'whole' (reference shipped configs) or 'slide' (sliding-window
    # inference — the reference's declared-but-NotImplemented test_cfg
    # mode, encoder_decoder.py:218-222). Slide window/step default to
    # crop_size / half of it; override via Evaluator or tools/test.py.
    eval_mode: str = "whole"
    # DDAD specifics
    ddad_resize: Optional[Tuple[int, int]] = None   # (384, 640) for DDAD
    # epoch lengthening: wrap the train dataset in RepeatDataset
    # (reference dataset_wrappers.py / configs' RepeatDataset times=...)
    repeat_times: int = 1
    # NYU: derive per-sample scene-class labels from the split paths
    # (reference nyu_binsformer.py:98-105; the BinsFormer class-CE loss
    # consumes them)
    scene_classes: bool = False
    # synthetic fallback
    synthetic_size: int = 64


@dataclass(frozen=True)
class OptimConfig:
    max_lr: float = 1e-4
    betas: Tuple[float, float] = (0.9, 0.999)
    weight_decay: float = 0.01
    warmup_iters: int = 16 * 1600
    warmup_ratio: float = 1.0 / 1000
    min_lr_ratio: float = 1e-8
    grad_clip_norm: float = 35.0
    sig_loss_weight: float = 1.0
    slope_ce_weight: float = 0.08
    # ---- zoo loss composition (reference _base_/models/*.py) ----
    # BinsFormer aux supervision: SigLoss (and chamfer when enabled) on
    # decoder layers aux_loss_indices with these weights, on top of the
    # final layer's full loss (binsformer.py train_cfg aux_index=[2,5],
    # aux_weight=[1/4, 1/2])
    aux_loss_indices: Tuple[int, ...] = ()
    aux_loss_weights: Tuple[float, ...] = ()
    # scene-classification CE on the class query (binsformer.py
    # loss_class weight 1e-2; needs batch['scene_class'] — NYUDataset
    # scene_classes=True). NOTE: the reference's own aux-layer classify
    # branch is dead debug code (binsformer_head.py:370-371 embed()/exit()
    # would crash) — we implement what the config declares.
    class_ce_weight: float = 0.0
    # AdaBins/BinsFormer bin-center chamfer (chamferloss.py; binsformer
    # ships it OFF: with_loss_chamfer=False, weight 1e-1)
    chamfer_weight: float = 0.0


@dataclass(frozen=True)
class TrainConfig:
    max_iters: int = 1600 * 48
    global_batch: int = 16                # 8 GPUs x 2 in the reference
    eval_interval: int = 800
    checkpoint_interval: int = 800
    max_keep_ckpts: int = 2
    log_interval: int = 10
    seed: int = 0
    save_best: str = "abs_rel"            # rule: less
    # Opt-in bf16 mixed-precision training: the model forward/backward
    # runs in bfloat16 (params/inputs cast at the apply boundary; master
    # params, optimizer state, losses, grads, and BN running stats stay
    # f32). Off by default: f32 matches the reference's training numerics
    # and the bitwise-reproducibility contract.
    bf16_compute: bool = False
    num_workers: int = 0                  # >1: multi-process batch prep
                                          # (reference builder.py
                                          # workers_per_gpu); 0 = one
                                          # background prefetch thread
    # 'epoch': per-epoch permutation without replacement (the reference
    # DistributedSampler's semantics, builder.py:123-125). 'replacement':
    # i.i.d. uniform draws per step (pre-round-5 behavior, opt-in).
    sampling: str = "epoch"


@dataclass(frozen=True)
class ExperimentConfig:
    name: str = "gedepth_adaptive_kitti"
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    work_dir: str = "work_dirs"

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)
