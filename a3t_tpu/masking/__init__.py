from a3t_tpu.masking.spans import random_spans_noise_mask
from a3t_tpu.masking.alignment import (
    phones_masking,
    segment_positions,
    masked_positions_from_boundary,
)

__all__ = [
    "random_spans_noise_mask",
    "phones_masking",
    "segment_positions",
    "masked_positions_from_boundary",
]
