from a3t_tpu.ops.fused_logmel import fused_logmel
from a3t_tpu.ops.banded_attention import banded_attention

__all__ = ["fused_logmel", "banded_attention"]
