from a3t_tpu.models.mlm import A3TModelConfig, A3TMLMModel, EncoderConfig
from a3t_tpu.models.conformer import ConformerStack

__all__ = ["A3TModelConfig", "A3TMLMModel", "EncoderConfig", "ConformerStack"]
