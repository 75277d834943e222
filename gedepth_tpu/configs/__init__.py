from gedepth_tpu.configs.base import (
    ModelConfig, DataConfig, OptimConfig, TrainConfig, ExperimentConfig,
)
from gedepth_tpu.configs.presets import get_config, list_configs
