"""Flax model zoo: attention kernels, encoders, decoders, architectures.

Importing this package registers every module into the builder registries
(same names as the reference — SURVEY.md §2.4)."""

from openviic_tpu.models import attention  # noqa: F401
from openviic_tpu.models import text_embedding  # noqa: F401
from openviic_tpu.models import vision_embedding  # noqa: F401
from openviic_tpu.models import encoders  # noqa: F401
from openviic_tpu.models import decoders  # noqa: F401
from openviic_tpu.models import architectures  # noqa: F401
from openviic_tpu.models import language_models  # noqa: F401
from openviic_tpu.models.base import BaseTransformer  # noqa: F401
