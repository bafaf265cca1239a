"""DSP front-end numeric tests.

The STFT path is golden-tested against torch.stft (the reference's backend,
espnet2/layers/stft.py:103); the mel filterbank against librosa's documented
Slaney construction via properties and a spot-check of hand-computed values.
"""

import numpy as np
import pytest
import jax.numpy as jnp

import torch

from a3t_tpu.dsp import (
    LogMelConfig,
    LogMelFrontend,
    frame_signal,
    hann_window,
    mel_filterbank,
    num_frames,
    stft,
)
from a3t_tpu.dsp.stft import dft_matrices, istft, padded_window


CONFIGS = [
    dict(n_fft=2048, hop=300, win=1200),  # 24 kHz A3T recipe
    dict(n_fft=1024, hop=200, win=800),  # 16 kHz corpora
    dict(n_fft=512, hop=128, win=512),
]


@pytest.mark.parametrize("cfg", CONFIGS)
def test_stft_matches_torch(cfg, rng):
    n = cfg["hop"] * 20
    x = rng.standard_normal((2, n)).astype(np.float32)

    ours = np.asarray(stft(jnp.asarray(x), cfg["n_fft"], cfg["hop"], cfg["win"]))

    window = torch.hann_window(cfg["win"])
    ref = torch.stft(
        torch.from_numpy(x),
        n_fft=cfg["n_fft"],
        hop_length=cfg["hop"],
        win_length=cfg["win"],
        window=window,
        center=True,
        normalized=False,
        onesided=True,
        return_complex=True,
    ).transpose(1, 2)

    assert ours.shape == tuple(ref.shape)
    assert ours.shape[1] == num_frames(n, cfg["hop"])
    np.testing.assert_allclose(ours.real, ref.real.numpy(), atol=2e-2, rtol=1e-4)
    np.testing.assert_allclose(ours.imag, ref.imag.numpy(), atol=2e-2, rtol=1e-4)


def test_hann_window_matches_torch():
    for n in (256, 801, 1200):
        np.testing.assert_allclose(
            hann_window(n), torch.hann_window(n).numpy(), atol=1e-6
        )


def test_frame_signal_shapes(rng):
    x = rng.standard_normal((3, 3000)).astype(np.float32)
    frames = frame_signal(jnp.asarray(x), 512, 128)
    assert frames.shape == (3, 1 + 3000 // 128, 512)


def test_dft_matrices_match_rfft(rng):
    n_fft, win = 512, 400
    f = rng.standard_normal((4, n_fft)).astype(np.float32)
    w_cos, w_sin = dft_matrices(n_fft, win)
    re = f @ w_cos
    im = f @ w_sin
    ref = np.fft.rfft(f * padded_window(n_fft, win), n_fft)
    np.testing.assert_allclose(re, ref.real, atol=1e-3)
    np.testing.assert_allclose(im, ref.imag, atol=1e-3)


def test_mel_filterbank_properties():
    fb = mel_filterbank(24000, 2048, 80, fmin=80.0, fmax=7600.0)
    assert fb.shape == (80, 1025)
    assert (fb >= 0).all()
    # each filter is a single contiguous triangle
    for row in fb:
        nz = np.nonzero(row)[0]
        assert len(nz) > 0
        assert (np.diff(nz) == 1).all()
    # Slaney norm: peak of filter m ~= 2 / bandwidth — area under the
    # triangle in Hz is ~1 (trapezoid over bin spacing)
    bin_hz = 24000 / 2048
    areas = fb.sum(axis=1) * bin_hz
    assert np.all(areas[5:-5] > 0.7) and np.all(areas[5:-5] < 1.3)
    # centers increase monotonically
    centers = fb.argmax(axis=1)
    assert (np.diff(centers) >= 0).all()


def test_mel_scale_spot_values():
    from a3t_tpu.dsp import hz_to_mel, mel_to_hz

    # Slaney: linear below 1 kHz at 200/3 Hz per mel
    assert hz_to_mel(0.0) == 0.0
    np.testing.assert_allclose(hz_to_mel(1000.0), 15.0)
    np.testing.assert_allclose(mel_to_hz(15.0), 1000.0)
    np.testing.assert_allclose(hz_to_mel(200.0 / 3.0), 1.0)
    # log region round trip
    for f in (2000.0, 7600.0, 12000.0):
        np.testing.assert_allclose(mel_to_hz(hz_to_mel(f)), f, rtol=1e-10)
    # HTK formula
    np.testing.assert_allclose(hz_to_mel(1000.0, htk=True), 999.9855, atol=1e-3)


def test_frontend_matches_torch_pipeline(rng):
    """Full chain vs a torch re-computation using the same mel matrix
    (mirrors espnet2/tts/feats_extract/log_mel_fbank.py:88-106)."""
    cfg = LogMelConfig(fs=16000, n_fft=1024, hop_length=200, win_length=800)
    fe = LogMelFrontend(cfg)
    n = 200 * 40
    x = rng.standard_normal((2, n)).astype(np.float32) * 0.1
    lengths = np.array([n, n - 2 * 200], dtype=np.int32)

    feats, flens = fe(jnp.asarray(x), jnp.asarray(lengths))
    feats = np.asarray(feats)

    window = torch.hann_window(800)
    spec = torch.stft(
        torch.from_numpy(x), 1024, 200, 800, window=window, center=True,
        return_complex=True,
    ).transpose(1, 2)
    power = spec.real**2 + spec.imag**2
    amp = torch.sqrt(torch.clamp(power, min=1.0e-10))
    mel = torch.clamp(amp @ torch.from_numpy(fe.melmat), min=1e-10)
    ref = torch.log10(mel).numpy()

    assert feats.shape == ref.shape == (2, 1 + n // 200, 80)
    np.testing.assert_allclose(flens, lengths // 200 + 1)
    # padded frames zeroed
    assert np.abs(feats[1, int(flens[1]):]).max() == 0.0
    valid0 = feats[0]
    np.testing.assert_allclose(valid0, ref[0], atol=5e-3, rtol=1e-3)


def test_frontend_fused_path_matches(rng):
    cfg = LogMelConfig(fs=16000, n_fft=512, hop_length=128, win_length=512)
    fe = LogMelFrontend(cfg)
    x = rng.standard_normal((2, 128 * 30)).astype(np.float32) * 0.1
    a, _ = fe(jnp.asarray(x))
    b, _ = fe.fused(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-2)


def test_istft_roundtrip(rng):
    n_fft, hop, win = 512, 128, 512
    x = rng.standard_normal((1, 128 * 30)).astype(np.float32)
    spec = stft(jnp.asarray(x), n_fft, hop, win)
    y = np.asarray(istft(spec, n_fft, hop, win, length=x.shape[1]))
    # interior reconstruction is near-exact (COLA); edges differ slightly
    np.testing.assert_allclose(y[0, win:-win], x[0, win:-win], atol=1e-3)
