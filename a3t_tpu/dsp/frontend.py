"""Log-mel front-end (the reference's LogMelFbank, on-device).

Chain (espnet2/tts/feats_extract/log_mel_fbank.py:88-106):
    stft -> power -> amp = sqrt(clamp(power, 1e-10))
         -> mel = clamp(amp @ melmat.T, 1e-10) -> log10 -> zero padded frames

Two execution paths:

* ``__call__`` — jnp.fft.rfft-based, used as the numerical reference and on
  CPU meshes.
* ``fused`` — DFT-as-matmul formulation (see dsp/stft.py dft_matrices) whose
  two matmuls (frame @ DFT, amp @ mel) ride the MXU; the Pallas kernel in
  ops/fused_logmel.py pushes this further by never materializing frames or
  the linear spectrogram in HBM.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from a3t_tpu.dsp.mel import mel_filterbank
from a3t_tpu.dsp.stft import (
    dft_matrices,
    frame_lengths as _frame_lengths,
    frame_signal,
    num_frames as _num_frames,
    padded_window,
    stft as _stft,
)


@dataclasses.dataclass(frozen=True)
class LogMelConfig:
    """Front-end settings.

    Defaults are the 24 kHz A3T recipe values
    (egs2/vctk/sedit/run.sh:11-13, mlm.sh:60-66); the 16 kHz corpora use
    fs=16000, n_fft=1024, hop=200, win=800 (espnet2/tasks/mlm.py:544-548).
    """

    fs: int = 24000
    n_fft: int = 2048
    hop_length: int = 300
    win_length: int = 1200
    n_mels: int = 80
    fmin: float = 80.0
    fmax: float = 7600.0
    log_base: float = 10.0

    @property
    def n_freqs(self) -> int:
        return 1 + self.n_fft // 2

    def num_frames(self, n_samples: int) -> int:
        return _num_frames(n_samples, self.hop_length)

    def seconds_to_frames(self, t: np.ndarray) -> np.ndarray:
        """Alignment time (sec) -> frame index: floor(fs * t / hop).

        Matches the reference conversion (espnet2/train/collate_fn.py:236-237).
        """
        return np.floor(self.fs * np.asarray(t) / self.hop_length).astype(np.int32)


class LogMelFrontend:
    """Stateless callable computing log10-mel features on-device."""

    def __init__(self, config: LogMelConfig = LogMelConfig()):
        self.config = config
        c = config
        self.melmat = mel_filterbank(
            c.fs, c.n_fft, c.n_mels, c.fmin, c.fmax
        ).T  # (n_freqs, n_mels)
        self.window = padded_window(c.n_fft, c.win_length)
        self._dft = None  # lazily built (n_fft x n_freqs x2) cos/sin bases

    def output_size(self) -> int:
        return self.config.n_mels

    def frame_lengths(self, sample_lengths: jnp.ndarray) -> jnp.ndarray:
        return _frame_lengths(sample_lengths, self.config.hop_length)

    def _finish(self, amp: jnp.ndarray, sample_lengths) -> tuple:
        melmat = jnp.asarray(self.melmat, amp.dtype)
        mel = jnp.maximum(amp @ melmat, 1e-10)
        feats = jnp.log10(mel)
        if sample_lengths is not None:
            flens = self.frame_lengths(sample_lengths)
            n_f = feats.shape[1]
            valid = jnp.arange(n_f)[None, :] < flens[:, None]
            feats = jnp.where(valid[..., None], feats, 0.0)
        else:
            flens = jnp.full((feats.shape[0],), feats.shape[1], jnp.int32)
        return feats, flens

    def __call__(self, audio: jnp.ndarray, sample_lengths=None):
        """audio (B, S) -> (feats (B, F, n_mels), frame_lengths (B,))."""
        c = self.config
        spec = _stft(audio, c.n_fft, c.hop_length, c.win_length, self.window)
        power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
        amp = jnp.sqrt(jnp.maximum(power, 1e-10))
        return self._finish(amp, sample_lengths)

    def fused(self, audio: jnp.ndarray, sample_lengths=None):
        """Matmul-DFT path: framing + two MXU matmuls, no FFT op."""
        c = self.config
        if self._dft is None:
            self._dft = dft_matrices(c.n_fft, c.win_length)
        w_cos, w_sin = (jnp.asarray(m) for m in self._dft)
        frames = frame_signal(audio, c.n_fft, c.hop_length)
        re = frames @ w_cos
        im = frames @ w_sin
        amp = jnp.sqrt(jnp.maximum(re * re + im * im, 1e-10))
        return self._finish(amp, sample_lengths)


class LinearSpectrogramFrontend(LogMelFrontend):
    """Amplitude linear spectrogram (espnet2 LinearSpectrogram choice,
    registered in tasks/mlm.py:58-67): stft -> |.| with no mel/log."""

    def output_size(self) -> int:
        return self.config.n_freqs

    def _finish(self, amp, sample_lengths):
        feats = amp
        if sample_lengths is not None:
            flens = self.frame_lengths(sample_lengths)
            valid = jnp.arange(feats.shape[1])[None, :] < flens[:, None]
            feats = jnp.where(valid[..., None], feats, 0.0)
        else:
            flens = jnp.full((feats.shape[0],), feats.shape[1], jnp.int32)
        return feats, flens


class LogSpectrogramFrontend(LinearSpectrogramFrontend):
    """log(amp) linear spectrogram (espnet2 LogSpectrogram choice)."""

    def _finish(self, amp, sample_lengths):
        feats, flens = super()._finish(jnp.log(jnp.maximum(amp, 1e-10)),
                                       sample_lengths)
        return feats, flens


def extract_corpus_mels(frontend, wavs, chunk: int = 32):
    """Batched whole-corpus mel extraction for offline trainers.

    Truncates each waveform to a whole number of hops, pads every
    utterance to one shared bucket (rounded up to a multiple of
    ``64 * hop`` so the jitted front-end compiles once), and runs the
    corpus through it ``chunk`` utterances per device call — per-utt
    dispatch through a remote-compile tunnel costs more than the compute.

    Returns ``(truncated_wavs, mels)`` with ``mels[i]`` of shape
    ``(len(wav_i) // hop, n_mels)``.
    """
    import jax

    hop = frontend.config.hop_length
    fe = jax.jit(lambda a: frontend(a)[0])
    trunc = []
    bucket = 0
    for wav in wavs:
        n = (len(wav) // hop) * hop
        bucket = max(bucket, n)
        trunc.append(np.asarray(wav[:n], np.float32))
    bucket = int(np.ceil(bucket / (64 * hop))) * 64 * hop
    mels: list = []
    for c0 in range(0, len(trunc), chunk):
        group = trunc[c0 : c0 + chunk]
        padded = np.zeros((chunk, bucket), np.float32)
        for j, wav in enumerate(group):
            padded[j, : len(wav)] = wav
        mel = np.asarray(fe(jnp.asarray(padded)))
        for j, wav in enumerate(group):
            mels.append(mel[j, : len(wav) // hop])
    return trunc, mels


def corpus_mvn(mels):
    """Per-dim mean/std over a list of (T_i, n_mels) arrays (std floored
    at 1e-5, matching GlobalMVN's guard)."""
    allm = np.concatenate(mels, axis=0)
    return allm.mean(axis=0), np.maximum(allm.std(axis=0), 1e-5)
