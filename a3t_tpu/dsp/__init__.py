from a3t_tpu.dsp.mel import mel_filterbank, hz_to_mel, mel_to_hz
from a3t_tpu.dsp.stft import stft, frame_signal, hann_window, num_frames
from a3t_tpu.dsp.frontend import (
    LinearSpectrogramFrontend,
    LogMelConfig,
    LogMelFrontend,
    LogSpectrogramFrontend,
)
from a3t_tpu.dsp.normalize import GlobalMVN, UtteranceMVN

__all__ = [
    "mel_filterbank",
    "hz_to_mel",
    "mel_to_hz",
    "stft",
    "frame_signal",
    "hann_window",
    "num_frames",
    "LogMelConfig",
    "LogMelFrontend",
    "LinearSpectrogramFrontend",
    "LogSpectrogramFrontend",
    "GlobalMVN",
    "UtteranceMVN",
]
