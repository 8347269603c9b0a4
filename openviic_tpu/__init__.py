"""OpenViIC-TPU: a TPU-native Vietnamese image-captioning framework.

A ground-up JAX/Flax/Pallas rebuild with the capabilities of the reference
PyTorch framework `hieunghia-pat/OpenViIC` (see SURVEY.md): registry-built
transformer captioners over pre-extracted region/grid visual features,
cross-entropy + self-critical (SCST) training, jit-compiled batched beam
search with a device-resident KV cache, and a bundled caption evaluation
suite (BLEU, METEOR, ROUGE-L, CIDEr).

Design stance (TPU-first, not a port):
 - functional Flax modules instead of stateful torch buffers;
 - decode state is an explicit pytree threaded through `lax.scan`;
 - static shapes everywhere so XLA compiles once;
 - data parallelism via one `jax.sharding.Mesh`, collectives by XLA;
 - fused Pallas attention kernels behind the attention registry.
"""

__version__ = "0.1.0"

from openviic_tpu.config import get_config  # noqa: F401
from openviic_tpu.registry import Registry  # noqa: F401
