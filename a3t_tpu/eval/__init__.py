from a3t_tpu.eval.mcd import (
    mcep_from_wav,
    dtw_path,
    mcd_between_waveforms,
    evaluate_masked_reconstruction,
)

__all__ = [
    "mcep_from_wav",
    "dtw_path",
    "mcd_between_waveforms",
    "evaluate_masked_reconstruction",
]
