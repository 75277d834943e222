from gedepth_tpu.core.metrics import (
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
