from a3t_tpu.inference.sedit import (
    SpeechEditor,
    UtteranceAlignment,
    FileAlignmentSource,
    words2phns,
    diff_phone_spans,
    duration_adjust_factor,
)
from a3t_tpu.inference.durations import load_duration_fn, make_fs2_duration_fn

__all__ = [
    "SpeechEditor",
    "UtteranceAlignment",
    "FileAlignmentSource",
    "words2phns",
    "diff_phone_spans",
    "duration_adjust_factor",
    "load_duration_fn",
    "make_fs2_duration_fn",
]
