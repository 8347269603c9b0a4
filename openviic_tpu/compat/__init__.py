from openviic_tpu.compat.torch_import import (
    convert_torch_state_dict,
    load_reference_checkpoint,
)

__all__ = ["convert_torch_state_dict", "load_reference_checkpoint"]
