from .torch_convert import (
    convert_dat,
    convert_hat,
    convert_msresunet,
    convert_swinir,
    extract_state_dict,
    infer_config,
    load_torch_checkpoint,
)

__all__ = [
    "convert_dat",
    "convert_hat",
    "convert_msresunet",
    "convert_swinir",
    "extract_state_dict",
    "infer_config",
    "load_torch_checkpoint",
]
