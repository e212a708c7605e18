from .torch_convert import (
    extract_state_dict,
    convert_msresunet,
    convert_swinir,
    load_torch_checkpoint,
)

__all__ = [
    "extract_state_dict",
    "convert_msresunet",
    "convert_swinir",
    "load_torch_checkpoint",
]
