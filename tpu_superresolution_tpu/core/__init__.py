from .config import (
    ModelConfig,
    MSResUNetConfig,
    UNet2DConfig,
    SwinIRConfig,
    HATConfig,
    HATFastConfig,
    DATConfig,
    TrainConfig,
    DataConfig,
    EvalConfig,
    register_model,
    build_model,
    model_registry,
)
from .dtypes import Policy, DEFAULT_POLICY

__all__ = [
    "ModelConfig",
    "MSResUNetConfig",
    "UNet2DConfig",
    "SwinIRConfig",
    "HATConfig",
    "HATFastConfig",
    "DATConfig",
    "TrainConfig",
    "DataConfig",
    "EvalConfig",
    "register_model",
    "build_model",
    "model_registry",
    "Policy",
    "DEFAULT_POLICY",
]
