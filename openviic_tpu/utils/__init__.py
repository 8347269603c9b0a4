from openviic_tpu.utils.compile_cache import maybe_enable_compilation_cache
from openviic_tpu.utils.logging import setup_logger

__all__ = ["maybe_enable_compilation_cache", "setup_logger"]
