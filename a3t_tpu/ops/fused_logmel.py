"""Fused STFT -> |.| -> mel -> log10 Pallas TPU kernel.

The log-mel front-end as two MXU matmuls with the nonlinearities fused in
VMEM: for each tile of frames,

    re   = frames @ (cos DFT * window)      (MXU)
    im   = frames @ (-sin DFT * window)     (MXU)
    amp  = sqrt(max(re^2 + im^2, 1e-10))    (VPU, stays in VMEM)
    mel += amp @ melmat                     (MXU, accumulated over freq blocks)
    out  = log10(max(mel, 1e-10))           (VPU, on the last freq block)

Compared to the unfused XLA path this never materializes the (F, 1+n_fft/2)
linear spectrogram in HBM — only frames in and (F, n_mels) out — and it
replaces XLA's TPU FFT (a scalar-unit affair) with systolic-array matmuls.
Numerics match a3t_tpu.dsp.LogMelFrontend (and therefore torch.stft) to
float32 rounding; the front-end needs no VJP because features are data
(model input + target), not a function of parameters.

The frequency axis is zero-padded to a lane multiple; padded bins get
amp = 1e-5 but hit zero rows of the padded mel matrix, contributing nothing.

STATUS: experimental, NOT the production path.  On a v5e chip this kernel
measures 3-4x slower than expressing the same chain as two plain XLA
matmuls (LogMelFrontend.fused; docs/KERNEL_BENCH.json frontend_* rows) —
XLA's own fusion of DFT-matmul + elementwise + mel-matmul beats this
hand-written schedule, and the front-end is ~free in the full training step
either way (docs/STEP_BENCH.json nofrontend vs prod).  Kept for its golden
tests and as a Pallas reference; nothing enables it by default.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from a3t_tpu.dsp.frontend import LogMelConfig
from a3t_tpu.dsp.mel import mel_filterbank
from a3t_tpu.dsp.stft import dft_matrices, frame_signal


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=8)
def _tables(config: LogMelConfig, k_block: int, lane: int = 128):
    """Padded (W_cos, W_sin, melmat) numpy tables for one config."""
    c = config
    n_freq = c.n_freqs
    k_pad = _round_up(n_freq, k_block)
    m_pad = _round_up(c.n_mels, lane)

    w_cos, w_sin = dft_matrices(c.n_fft, c.win_length)
    melmat = mel_filterbank(c.fs, c.n_fft, c.n_mels, c.fmin, c.fmax)  # (M, K)

    w_cos_p = np.zeros((c.n_fft, k_pad), np.float32)
    w_sin_p = np.zeros((c.n_fft, k_pad), np.float32)
    mel_p = np.zeros((k_pad, m_pad), np.float32)
    w_cos_p[:, :n_freq] = w_cos
    w_sin_p[:, :n_freq] = w_sin
    mel_p[:n_freq, : c.n_mels] = melmat.T
    return w_cos_p, w_sin_p, mel_p


def _kernel(frames_ref, wcos_ref, wsin_ref, mel_ref, out_ref):
    kb = pl.program_id(2)
    n_kb = pl.num_programs(2)

    f = frames_ref[0]
    re = jnp.dot(f, wcos_ref[:], preferred_element_type=jnp.float32)
    im = jnp.dot(f, wsin_ref[:], preferred_element_type=jnp.float32)
    amp = jnp.sqrt(jnp.maximum(re * re + im * im, 1e-10))
    partial = jnp.dot(amp, mel_ref[:], preferred_element_type=jnp.float32)

    @pl.when(kb == 0)
    def _():
        out_ref[0] = partial

    @pl.when(kb > 0)
    def _():
        out_ref[0] += partial

    @pl.when(kb == n_kb - 1)
    def _():
        out_ref[0] = jnp.log(jnp.maximum(out_ref[0], 1e-10)) / np.log(10.0)


def fused_logmel(
    audio: jnp.ndarray,
    config: LogMelConfig,
    sample_lengths=None,
    tile_f: int = 64,
    k_block: int = 256,
    interpret: bool | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """audio (B, S) -> (log10-mel (B, F, n_mels), frame_lengths (B,)).

    Drop-in replacement for ``LogMelFrontend.__call__``.  ``interpret``
    defaults to True off-TPU so tests run on CPU meshes.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    c = config
    w_cos, w_sin, melmat = (jnp.asarray(t) for t in _tables(c, k_block))
    k_pad = w_cos.shape[1]
    m_pad = melmat.shape[1]

    frames = frame_signal(audio, c.n_fft, c.hop_length)  # (B, F, n_fft)
    b, n_f, n_fft = frames.shape
    f_pad = _round_up(n_f, tile_f)
    if f_pad != n_f:
        frames = jnp.pad(frames, ((0, 0), (0, f_pad - n_f), (0, 0)))

    grid = (b, f_pad // tile_f, k_pad // k_block)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, tile_f, n_fft), lambda bi, fb, kb: (bi, fb, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (n_fft, k_block), lambda bi, fb, kb: (0, kb),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (n_fft, k_block), lambda bi, fb, kb: (0, kb),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (k_block, m_pad), lambda bi, fb, kb: (kb, 0),
                memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_f, m_pad), lambda bi, fb, kb: (bi, fb, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, f_pad, m_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * f_pad * n_fft * k_pad * 2
            + 2 * b * f_pad * k_pad * m_pad,
            bytes_accessed=frames.size * 4 + b * f_pad * m_pad * 4,
            transcendentals=b * f_pad * m_pad,
        ),
        interpret=interpret,
    )(frames, w_cos, w_sin, melmat)

    feats = out[:, :n_f, : c.n_mels]
    if sample_lengths is not None:
        flens = sample_lengths // c.hop_length + 1
        valid = jnp.arange(n_f)[None, :] < flens[:, None]
        feats = jnp.where(valid[..., None], feats, 0.0)
    else:
        flens = jnp.full((b,), n_f, jnp.int32)
    return feats, flens
