"""Kaldi-style data-directory IO (reference: espnet2/fileio/).

Supports the file formats the A3T recipes actually use
(egs2/vctk/sedit/, dump/raw/{set}/):

* ``wav.scp``       — ``uttid /path/to/file.wav`` (sound)
* ``text``          — ``uttid PHN1 PHN2 ...`` (space-joined tokens)
* ``mfa_start``     — ``uttid 0.12 0.31 ...`` (float sequences, text_float)
* ``mfa_end``       — same
* ``utt2spk``       — ``uttid spk``
* ``*_shape``       — ``uttid 123,80`` (collect-stats output)
* ``feats.scp``-style npy pointers (npy)

WAV IO uses scipy (PCM16/24/32/float); FLAC uses the framework's own codec
(a3t_tpu/data/flac.py — the image has no libsndfile), dispatched on the
container magic so scp entries may mix formats, like the reference's
soundfile reads (espnet2/fileio/sound_scp.py).
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np


def read_2column_text(path: str) -> dict[str, str]:
    """uttid<space>rest-of-line -> {uttid: rest} (fileio/read_text.py:10)."""
    out: dict[str, str] = {}
    with open(path, encoding="utf-8") as f:
        for ln, line in enumerate(f, 1):
            parts = line.rstrip("\n").split(maxsplit=1)
            if not parts:
                continue
            if len(parts) == 1:
                out[parts[0]] = ""
            else:
                out[parts[0]] = parts[1]
    return out


def load_num_sequence_text(path: str, dtype=np.float32) -> dict[str, np.ndarray]:
    """uttid v1 v2 ... -> {uttid: array} (fileio/read_text.py:38)."""
    text = read_2column_text(path)
    out = {}
    for k, v in text.items():
        vals = v.replace(",", " ").split()
        out[k] = np.asarray([float(x) for x in vals], dtype=dtype)
    return out


def write_num_sequence_text(path: str, data: dict[str, np.ndarray]):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        for k in sorted(data):
            vals = " ".join(str(x) for x in np.asarray(data[k]).tolist())
            f.write(f"{k} {vals}\n")


def write_2column_text(path: str, data: dict[str, str]):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        for k in sorted(data):
            f.write(f"{k} {data[k]}\n")


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------

def read_wav(path: str, always_float: bool = True) -> tuple[int, np.ndarray]:
    """Read a PCM/float WAV or FLAC; returns (fs, float32 in [-1, 1]).

    Dispatches on the container magic, so ``wav.scp`` entries may mix
    formats — matching the reference's soundfile-based SoundScpReader
    (espnet2/fileio/sound_scp.py), whose recipes store FLAC by default
    (format_wav_scp.sh ``audio_format=flac``).
    """
    with open(path, "rb") as f:
        head = f.read(21)
    magic = head[:4]
    if magic == b"fLaC":
        # STREAMINFO channel count (bits 4-2 of byte 20): the native decoder
        # emits channel 0 only, so route multi-channel files to the Python
        # twin, which returns the full (n, ch) array for to_mono to downmix
        streaminfo_first = len(head) >= 21 and (head[4] & 0x7F) == 0
        n_ch = ((head[20] >> 1) & 0x07) + 1 if streaminfo_first else 0
        if always_float and n_ch == 1:
            try:  # C++ decoder (native/loader/flac.cc): fast path
                from a3t_tpu.data.native_loader import read_file

                return read_file(path)
            except Exception:
                pass  # no toolchain / malformed probe — try the Python twin
        from a3t_tpu.data.flac import read_flac

        fs, data, bps = read_flac(path)
        if always_float:
            data = data.astype(np.float32) / float(1 << (bps - 1))
        return fs, data

    from scipy.io import wavfile

    fs, data = wavfile.read(path)
    if always_float and data.dtype.kind == "i":
        data = data.astype(np.float32) / float(np.iinfo(data.dtype).max + 1)
    elif always_float and data.dtype.kind == "u":  # uint8 wav
        data = (data.astype(np.float32) - 128.0) / 128.0
    elif data.dtype != np.float32:
        data = data.astype(np.float32)
    return int(fs), data


def write_wav(path: str, fs: int, data: np.ndarray, pcm16: bool = True):
    from scipy.io import wavfile

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    if pcm16:
        clipped = np.clip(np.asarray(data), -1.0, 1.0)
        wavfile.write(path, fs, (clipped * 32767.0).astype(np.int16))
    else:
        wavfile.write(path, fs, np.asarray(data, np.float32))


class SoundScpReader:
    """wav.scp reader: reader[uttid] -> (fs, float32 waveform)
    (fileio/sound_scp.py equivalent)."""

    def __init__(self, path: str):
        self.data = read_2column_text(path)

    def __getitem__(self, key: str) -> tuple[int, np.ndarray]:
        return read_wav(self.data[key])

    def __contains__(self, key):
        return key in self.data

    def __len__(self):
        return len(self.data)

    def keys(self) -> Iterator[str]:
        return iter(self.data)


class NpyScpReader:
    """scp of .npy paths: reader[uttid] -> ndarray."""

    def __init__(self, path: str):
        self.data = read_2column_text(path)

    def __getitem__(self, key: str) -> np.ndarray:
        return np.load(self.data[key])

    def __contains__(self, key):
        return key in self.data

    def __len__(self):
        return len(self.data)

    def keys(self) -> Iterator[str]:
        return iter(self.data)
