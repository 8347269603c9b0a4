from openviic_tpu.parallel.runtime import initialize_distributed
from openviic_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    make_sharded_xe_step,
    param_shardings,
    replicate_sharding,
)
from openviic_tpu.parallel.ring_attention import (
    ring_attention,
    ring_self_attention,
)
from openviic_tpu.parallel.ulysses import (
    ulysses_attention,
    ulysses_self_attention,
)
from openviic_tpu.parallel.pipeline import (
    pipeline_apply,
    pipelined_encoder_apply,
    stack_layer_params,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicate_sharding",
    "param_shardings",
    "make_sharded_xe_step",
    "initialize_distributed",
    "ring_attention",
    "ring_self_attention",
    "ulysses_attention",
    "ulysses_self_attention",
    "pipeline_apply",
    "pipelined_encoder_apply",
    "stack_layer_params",
]
