from openviic_tpu.config.node import ConfigNode
from openviic_tpu.config.loader import get_config

__all__ = ["ConfigNode", "get_config"]
