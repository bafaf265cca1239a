from a3t_tpu.compat.torch_import import (
    convert_encoder_state,
    convert_model_state,
)

__all__ = ["convert_encoder_state", "convert_model_state"]
