from a3t_tpu.ops.fused_logmel import fused_logmel

__all__ = ["fused_logmel"]
