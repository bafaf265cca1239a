from a3t_tpu.align.native import NativeAligner, align_corpus

__all__ = ["NativeAligner", "align_corpus"]
