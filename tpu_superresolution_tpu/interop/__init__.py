from .torch_convert import (
    convert_dat,
    convert_hat,
    convert_msresunet,
    convert_swinir,
    extract_state_dict,
    infer_config,
    load_torch_checkpoint,
)
from .torch_export import export_state_dict, save_torch_checkpoint

__all__ = [
    "convert_dat",
    "convert_hat",
    "convert_msresunet",
    "convert_swinir",
    "export_state_dict",
    "extract_state_dict",
    "infer_config",
    "load_torch_checkpoint",
    "save_torch_checkpoint",
]
