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

WAV IO uses scipy (PCM16/24/32/float); there is no libsndfile in the image,
so FLAC sources must be converted at prep time (the reference recipes also
convert via format_wav_scp.sh, egs2/TEMPLATE/.../format_wav_scp.sh).
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
    """Read a PCM/float WAV; returns (fs, float32 array in [-1, 1])."""
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
