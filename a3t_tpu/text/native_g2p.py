"""ctypes driver for the native C++ letter-to-sound engine (native/g2p).

Drop-in for :func:`a3t_tpu.text.g2p.letter_to_sound`; the C++ engine uses
NRL-style context-sensitive rules and is the OOV path equivalent of the
reference's english2phoneme binary (tools/english2phoneme)."""

from __future__ import annotations

import ctypes
import os
import subprocess

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                           "g2p")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "liba3t_g2p.so"))

_lib = None


def _load():
    global _lib
    if _lib is None:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                           check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.g2p_word.restype = ctypes.c_int
        lib.g2p_word.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                 ctypes.c_int]
        _lib = lib
    return _lib


def letter_to_sound(word: str) -> list[str]:
    """Word -> ARPAbet phones via the native rule engine."""
    lib = _load()
    buf = ctypes.create_string_buffer(1024)
    n = lib.g2p_word(word.encode(), buf, 1024)
    if n <= 0:
        return ["AH0"]
    return buf.value.decode().split()
