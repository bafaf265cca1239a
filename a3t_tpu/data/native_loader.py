"""ctypes driver for the native threaded WAV batch loader (native/loader).

Replaces per-utterance Python wav decoding in the batch-assembly hot path:
the C++ thread pool decodes a whole batch of files straight into the
(B, max_samples) float32 buffer the train step consumes.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                           "loader")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "liba3t_loader.so"))

_lib = None


def _load():
    global _lib
    if _lib is None:
        src = os.path.abspath(os.path.join(_NATIVE_DIR, "loader.cc"))
        stale = (os.path.exists(_LIB_PATH) and os.path.exists(src)
                 and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH))
        if not os.path.exists(_LIB_PATH) or stale:
            subprocess.run(["make", "-B", "-C", os.path.abspath(_NATIVE_DIR)],
                           check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.loader_new.restype = ctypes.c_void_p
        lib.loader_new.argtypes = [ctypes.c_int]
        lib.loader_free.argtypes = [ctypes.c_void_p]
        lib.loader_register.restype = ctypes.c_int
        lib.loader_register.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                        ctypes.c_int64]
        lib.loader_probe.restype = ctypes.c_int
        lib.loader_probe.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32)]
        lib.loader_load_batch.restype = ctypes.c_int
        lib.loader_load_batch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64)]
        lib.loader_load_batch_i16.restype = ctypes.c_int
        lib.loader_load_batch_i16.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int16),
            ctypes.POINTER(ctypes.c_int64)]
        _lib = lib
    return _lib


class NativeWavLoader:
    """Thread-pooled batch decoding of registered wav paths."""

    def __init__(self, paths: Sequence[str], n_threads: int = 4):
        self.lib = _load()
        self.handle = self.lib.loader_new(n_threads)
        self.paths = list(paths)
        blob = b"\0".join(p.encode() for p in self.paths) + b"\0"
        n = self.lib.loader_register(self.handle, blob, len(blob))
        if n != len(self.paths):
            raise ValueError(f"registered {n} of {len(self.paths)} paths")
        self.index = {p: i for i, p in enumerate(self.paths)}

    def __del__(self):
        try:
            if getattr(self, "handle", None):
                self.lib.loader_free(self.handle)
        except Exception:
            pass

    def probe(self) -> tuple[np.ndarray, np.ndarray]:
        """(n_samples, sample_rate) arrays for all registered paths
        (parallel header reads — the wav-header length scan used by the
        bucket batcher)."""
        n = len(self.paths)
        ns = np.zeros(n, np.int64)
        sr = np.zeros(n, np.int32)
        errs = self.lib.loader_probe(
            self.handle, ns.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            sr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        if errs:
            bad = [self.paths[i] for i in np.nonzero(ns < 0)[0][:3]]
            raise IOError(f"{errs} unreadable wavs, e.g. {bad}")
        return ns, sr

    def load_batch(
        self, indices: Sequence[int], max_samples: int,
        out: np.ndarray | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Decode ``indices`` into a (B, max_samples) float32 buffer."""
        idx = np.asarray(indices, np.int32)
        b = len(idx)
        if out is None:
            out = np.empty((b, max_samples), np.float32)
        assert out.shape == (b, max_samples) and out.dtype == np.float32
        lengths = np.zeros(b, np.int64)
        errs = self.lib.loader_load_batch(
            self.handle, idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            b, max_samples,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        if errs:
            raise IOError(f"{errs} failed reads in batch")
        return out, lengths.astype(np.int32)

    def load_batch_i16(
        self, indices: Sequence[int], max_samples: int,
        out: np.ndarray | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Decode ``indices`` into a (B, max_samples) int16 PCM buffer —
        the batcher's audio_int16 wire format, bulk-copied for 16-bit
        sources (no float round trip)."""
        idx = np.asarray(indices, np.int32)
        b = len(idx)
        if out is None:
            out = np.empty((b, max_samples), np.int16)
        assert out.shape == (b, max_samples) and out.dtype == np.int16
        lengths = np.zeros(b, np.int64)
        errs = self.lib.loader_load_batch_i16(
            self.handle, idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            b, max_samples,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        if errs:
            raise IOError(f"{errs} failed reads in batch")
        return out, lengths.astype(np.int32)
