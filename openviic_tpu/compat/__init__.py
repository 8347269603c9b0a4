from openviic_tpu.compat.torch_import import (
    convert_torch_state_dict,
    load_reference_checkpoint,
)
from openviic_tpu.compat.migrate import (
    import_reference_checkpoint,
    load_reference_vocab,
)

__all__ = [
    "convert_torch_state_dict",
    "load_reference_checkpoint",
    "import_reference_checkpoint",
    "load_reference_vocab",
]
