from openviic_tpu.ops.pallas_attention import fused_attention, pallas_enabled

__all__ = ["fused_attention", "pallas_enabled"]
