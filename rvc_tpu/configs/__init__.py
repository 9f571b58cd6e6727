"""Configuration system.

Per-sample-rate model/data/train hyperparameters mirroring the reference's
JSON config surface (`/root/reference/rvc/configs/{32000,40000,48000}.json`)
as frozen dataclasses, plus the device/pipeline chunking config
(`/root/reference/rvc/configs/config.py:24-56`).
"""

from rvc_tpu.configs.config import (
    DataConfig,
    ModelConfig,
    TrainConfig,
    RVCConfig,
    PipelineConfig,
    get_config,
    config_from_dict,
    config_to_dict,
)

__all__ = [
    "DataConfig",
    "ModelConfig",
    "TrainConfig",
    "RVCConfig",
    "PipelineConfig",
    "get_config",
    "config_from_dict",
    "config_to_dict",
]
