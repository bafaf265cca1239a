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
        srcs = [os.path.abspath(os.path.join(_NATIVE_DIR, n))
                for n in ("loader.cc", "flac.cc", "flac.h")]

        def needs_build():
            return not os.path.exists(_LIB_PATH) or any(
                os.path.exists(s)
                and os.path.getmtime(s) > os.path.getmtime(_LIB_PATH)
                for s in srcs)

        if needs_build():
            # serialize concurrent builders and link to a temp name +
            # atomic rename: `make -B` relinking the .so in place would
            # truncate the inode other processes have dlopen-mapped
            import fcntl

            lock_path = _LIB_PATH + ".lock"
            with open(lock_path, "w") as lock:
                fcntl.flock(lock, fcntl.LOCK_EX)
                if needs_build():  # recheck under the lock
                    tmp = _LIB_PATH + f".tmp.{os.getpid()}"
                    subprocess.run(
                        ["make", "-B", "-C", os.path.abspath(_NATIVE_DIR),
                         f"TARGET={os.path.basename(tmp)}"],
                        check=True, capture_output=True)
                    os.replace(tmp, _LIB_PATH)
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
        lib.loader_read_file.restype = ctypes.c_int
        lib.loader_read_file.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32)]
        _lib = lib
    return _lib


def read_file(path: str) -> tuple[int, np.ndarray]:
    """Single-file native decode (wav or flac): (fs, float32 in [-1, 1]).

    The fast path behind ``fileio.read_wav`` for FLAC — the pure-Python
    decoder is correct but slow at corpus scale.  Raises IOError if the
    native library can't parse the file.
    """
    lib = _load()
    ns = ctypes.c_int64()
    sr = ctypes.c_int32()
    enc = path.encode()
    if not lib.loader_read_file(enc, None, 0, ctypes.byref(ns),
                                ctypes.byref(sr)):
        raise IOError(f"native probe failed: {path}")
    out = np.empty(ns.value, np.float32)
    if not lib.loader_read_file(
            enc, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ns.value, ctypes.byref(ns), ctypes.byref(sr)):
        raise IOError(f"native decode failed: {path}")
    return int(sr.value), out


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

    def _load_batch(self, fn, dtype, cptr, indices, max_samples, out):
        idx = np.asarray(indices, np.int32)
        b = len(idx)
        if out is None:
            out = np.empty((b, max_samples), dtype)
        assert out.shape == (b, max_samples) and out.dtype == dtype
        lengths = np.zeros(b, np.int64)
        errs = fn(
            self.handle, idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            b, max_samples, out.ctypes.data_as(ctypes.POINTER(cptr)),
            lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        if errs:
            raise IOError(f"{errs} failed reads in batch")
        return out, lengths.astype(np.int32)

    def load_batch(
        self, indices: Sequence[int], max_samples: int,
        out: np.ndarray | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Decode ``indices`` into a (B, max_samples) float32 buffer."""
        return self._load_batch(self.lib.loader_load_batch, np.float32,
                                ctypes.c_float, indices, max_samples, out)

    def load_batch_i16(
        self, indices: Sequence[int], max_samples: int,
        out: np.ndarray | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Decode ``indices`` into a (B, max_samples) int16 PCM buffer —
        the batcher's audio_int16 wire format, bulk-copied for 16-bit
        sources (no float round trip)."""
        return self._load_batch(self.lib.loader_load_batch_i16, np.int16,
                                ctypes.c_int16, indices, max_samples, out)
