"""JAX STFT with torch.stft-compatible semantics.

The reference front-end wraps ``torch.stft`` (espnet2/layers/stft.py:103) with
``center=True`` (reflect padding of ``n_fft // 2`` samples on each side),
``normalized=False``, ``onesided=True`` and a periodic Hann window of length
``win_length`` zero-padded symmetrically to ``n_fft``.  Frame ``t`` covers
``padded[t*hop : t*hop + n_fft]``; the frame count is
``1 + floor(n_samples / hop)``.

Everything here is pure ``jax.numpy`` with static shapes, so it jits cleanly
and runs on-device inside the training step — unlike the reference, which
does this on CPU inside the DataLoader collate function
(espnet2/train/collate_fn.py:220).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def hann_window(win_length: int, dtype=np.float32) -> np.ndarray:
    """Periodic Hann window (matches ``torch.hann_window``'s default)."""
    n = np.arange(win_length, dtype=np.float64)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)
    return w.astype(dtype)


def padded_window(n_fft: int, win_length: int, dtype=np.float32) -> np.ndarray:
    """Hann(win_length) zero-padded symmetrically to n_fft (torch.stft rule)."""
    if win_length > n_fft:
        raise ValueError(f"win_length {win_length} > n_fft {n_fft}")
    w = hann_window(win_length, dtype)
    left = (n_fft - win_length) // 2
    out = np.zeros(n_fft, dtype=dtype)
    out[left : left + win_length] = w
    return out


def num_frames(n_samples: int, hop_length: int) -> int:
    """Frame count of a centered STFT: 1 + floor(n_samples / hop)."""
    return 1 + n_samples // hop_length


def frame_lengths(sample_lengths: jnp.ndarray, hop_length: int) -> jnp.ndarray:
    """Per-utterance valid frame counts for centered STFT.

    Matches the reference's olens computation (espnet2/layers/stft.py:114-119
    with even win_length): ``ilens // hop + 1``.
    """
    return sample_lengths // hop_length + 1


def frame_signal(x: jnp.ndarray, n_fft: int, hop_length: int) -> jnp.ndarray:
    """Frame a batch of signals into overlapping windows.

    Args:
        x: (B, S) audio. S must be a multiple of hop_length for the canonical
           frame count; any S works, producing ``1 + S // hop`` frames.
    Returns:
        (B, F, n_fft) frames of the reflect-padded signal.
    """
    pad = n_fft // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    n_f = num_frames(x.shape[-1], hop_length)
    # Express framing as a strided patch extraction; XLA lowers this to an
    # efficient loop of dynamic slices rather than a huge gather.
    starts = np.arange(n_f) * hop_length
    idx = starts[:, None] + np.arange(n_fft)[None, :]
    return xp[:, idx]


def stft(
    x: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int | None = None,
    window: np.ndarray | None = None,
) -> jnp.ndarray:
    """Centered one-sided STFT of a batch of signals.

    Args:
        x: (B, S) float audio.
    Returns:
        complex64 (B, F, n_fft // 2 + 1) spectrogram, F = 1 + S // hop.
    """
    if win_length is None:
        win_length = n_fft
    if window is None:
        window = padded_window(n_fft, win_length)
    frames = frame_signal(x, n_fft, hop_length)
    frames = frames * jnp.asarray(window, dtype=frames.dtype)
    return jnp.fft.rfft(frames, n=n_fft, axis=-1)


def dft_matrices(
    n_fft: int, win_length: int | None = None, dtype=np.float32
) -> tuple[np.ndarray, np.ndarray]:
    """Real/imag DFT bases with the analysis window folded in.

    Returns (W_cos, W_sin), each (n_fft, n_fft // 2 + 1), such that for a raw
    (unwindowed) frame ``f``: ``Re(rfft(f * w)) = f @ W_cos`` and
    ``Im(rfft(f * w)) = f @ W_sin``.  Expressing the DFT as a matmul lets the
    whole STFT→mel chain ride the TPU MXU (and fuse with the mel projection)
    instead of XLA's scalar FFT path.
    """
    if win_length is None:
        win_length = n_fft
    w = padded_window(n_fft, win_length, np.float64)
    n = np.arange(n_fft)[:, None]
    k = np.arange(1 + n_fft // 2)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    w_cos = (np.cos(ang) * w[:, None]).astype(dtype)
    w_sin = (-np.sin(ang) * w[:, None]).astype(dtype)
    return w_cos, w_sin


def istft(
    spec: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int | None = None,
    length: int | None = None,
) -> jnp.ndarray:
    """Inverse STFT (overlap-add with window-square normalization).

    Mirrors ``torch.istft(center=True)``.  Used by Griffin-Lim and the
    spectrogram inversion debug path.

    Args:
        spec: complex (B, F, n_fft // 2 + 1).
    Returns:
        (B, S) real signal, S = length or (F - 1) * hop.
    """
    if win_length is None:
        win_length = n_fft
    window = jnp.asarray(padded_window(n_fft, win_length))
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1) * window

    b, n_f, _ = frames.shape
    out_len = n_fft + (n_f - 1) * hop_length

    idx = (np.arange(n_f) * hop_length)[:, None] + np.arange(n_fft)[None, :]
    flat_idx = idx.reshape(-1)
    sig = jnp.zeros((b, out_len), frames.dtype).at[:, flat_idx].add(
        frames.reshape(b, -1)
    )
    wsq = jnp.zeros((out_len,), frames.dtype).at[flat_idx].add(
        jnp.tile(window**2, (n_f, 1)).reshape(-1)
    )
    sig = sig / jnp.maximum(wsq, 1e-11)

    pad = n_fft // 2
    sig = sig[:, pad:-pad] if pad else sig
    if length is not None:
        sig = sig[:, :length]
    return sig
