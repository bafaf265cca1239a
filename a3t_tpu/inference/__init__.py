from a3t_tpu.inference.sedit import (
    SpeechEditor,
    UtteranceAlignment,
    FileAlignmentSource,
    words2phns,
    diff_phone_spans,
    duration_adjust_factor,
)

__all__ = [
    "SpeechEditor",
    "UtteranceAlignment",
    "FileAlignmentSource",
    "words2phns",
    "diff_phone_spans",
    "duration_adjust_factor",
]
