from openviic_tpu.training import trainer  # noqa: F401  (registers trainers)
from openviic_tpu.training.trainer import BaseTrainer, enTrainer, viTrainer

__all__ = ["BaseTrainer", "viTrainer", "enTrainer"]
