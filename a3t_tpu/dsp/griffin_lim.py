"""Griffin-Lim vocoder fallback (reference: espnet2's Spectrogram2Waveform
via tasks/tts.py:366-401 when no trained vocoder is available).

log10-mel -> linear amplitude via the mel pseudo-inverse, then iterative
phase reconstruction with jit-compiled STFT/ISTFT round trips.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from a3t_tpu.dsp.frontend import LogMelConfig
from a3t_tpu.dsp.mel import mel_filterbank
from a3t_tpu.dsp.stft import istft, stft


def mel_to_linear(logmel: jnp.ndarray, config: LogMelConfig) -> jnp.ndarray:
    """Invert log10-mel to a linear amplitude spectrogram (pseudo-inverse)."""
    melmat = mel_filterbank(
        config.fs, config.n_fft, config.n_mels, config.fmin, config.fmax
    )  # (n_mels, n_freqs)
    inv = np.linalg.pinv(melmat)  # (n_freqs, n_mels)... transposed application
    amp_mel = jnp.power(10.0, logmel)
    linear = amp_mel @ jnp.asarray(inv.T, logmel.dtype)
    return jnp.maximum(linear, 1e-10)


def griffin_lim(
    magnitude: jnp.ndarray,
    config: LogMelConfig,
    n_iters: int = 32,
    seed: int = 0,
) -> jnp.ndarray:
    """Phase reconstruction: magnitude (B, F, n_freqs) -> wav (B, S)."""
    c = config

    def step(i, spec_phase):
        wav = istft(magnitude * jnp.exp(1j * spec_phase), c.n_fft,
                    c.hop_length, c.win_length)
        re = stft(wav, c.n_fft, c.hop_length, c.win_length)
        re = re[:, : magnitude.shape[1]]
        return jnp.angle(re)

    key = jax.random.PRNGKey(seed)
    phase = jax.random.uniform(
        key, magnitude.shape, jnp.float32, -np.pi, np.pi)
    phase = jax.lax.fori_loop(0, n_iters, step, phase)
    return istft(magnitude * jnp.exp(1j * phase), c.n_fft, c.hop_length,
                 c.win_length)


import functools


@functools.partial(jax.jit, static_argnums=(1, 2))
def logmel_to_wav(
    logmel: jnp.ndarray, config: LogMelConfig, n_iters: int = 32
) -> jnp.ndarray:
    """Full Griffin-Lim vocoder: (B, F, n_mels) log10-mel -> (B, S) wav.

    Jitted as a whole: the complex exp/irfft chain must be compiled — some
    backends (the axon tunnel) lack eager complex kernels."""
    return griffin_lim(mel_to_linear(logmel, config), config, n_iters)
