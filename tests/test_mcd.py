"""MCD harness tests: F0, CheapTrick envelope, exact sp2mc/freqt semantics,
DTW exactness, metric behavior, and the reference repo's own self-MCD golden
on real fixture speech."""

import os
import wave

import numpy as np
import pytest

from a3t_tpu.eval.mcd import (
    MCDConfig,
    cheaptrick_envelope,
    dtw_path,
    estimate_f0,
    freqt,
    freqt_matrix,
    mcd_between_waveforms,
    mcd_from_mceps,
    mcep_from_wav,
    middle_third_mask_str,
    sp2mc,
    spc2npow,
)

CFG = MCDConfig(mcep_dim=24, fftl=512, f0min=70, f0max=700)

REF_WAV = "/root/reference/test_utils/ctc_align_test.wav"


def _tone(freq, fs=16000, secs=0.5, amp=0.3):
    t = np.arange(int(fs * secs)) / fs
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float64)


def _load_wav(path):
    with wave.open(path) as w:
        fs = w.getframerate()
        x = np.frombuffer(w.readframes(w.getnframes()), np.int16)
    return x.astype(np.float64) / 32768.0, fs


def test_f0_on_synthetic_tones():
    for f in (110.0, 220.0, 330.0):
        f0 = estimate_f0(_tone(f), 16000, 5.0, 70, 700)
        voiced = f0[f0 > 0]
        assert len(voiced) > 0.8 * len(f0)
        np.testing.assert_allclose(np.median(voiced), f, rtol=0.02)
    # silence/noise -> unvoiced
    rng = np.random.default_rng(0)
    f0n = estimate_f0(rng.standard_normal(8000) * 0.01, 16000, 5.0, 70, 700)
    assert (f0n == 0).mean() > 0.9


def test_cheaptrick_recovers_harmonic_envelope():
    """A pulse train through a known resonance: the envelope at harmonic
    frequencies should follow the filter's magnitude response shape."""
    from scipy.signal import lfilter

    fs, f0 = 16000, 125.0
    n = fs // 2
    pulses = np.zeros(n)
    pulses[:: int(fs / f0)] = 1.0
    # single formant at 1 kHz
    r, wc = 0.95, 2 * np.pi * 1000 / fs
    a = [1.0, -2 * r * np.cos(wc), r * r]
    x = lfilter([1.0], a, pulses)

    f0_track = np.full(40, f0)
    env = cheaptrick_envelope(x, fs, f0_track, 5.0, 1024)
    freqs = np.arange(513) * fs / 1024
    mid = env[10:30].mean(axis=0)
    # the formant peak must sit near 1 kHz
    peak = freqs[np.argmax(mid)]
    assert abs(peak - 1000) < 150
    # and the envelope must fall off by >20 dB from peak to 6 kHz
    p_peak = 10 * np.log10(mid.max())
    p_tail = 10 * np.log10(mid[freqs > 6000].mean())
    assert p_peak - p_tail > 20


def test_freqt_matches_warped_grid_resampling(rng):
    """Two independent formulations of the all-pass warp must agree: the
    SPTK recursion (freqt) vs resampling the log spectrum on the warped
    frequency grid and re-extracting cepstra."""
    alpha, order, n_freq = 0.41, 20, 257
    # smooth random log spectrum from a low-order cepstrum
    c_true = rng.standard_normal(12) * np.exp(-np.arange(12))
    omega = np.linspace(0, np.pi, n_freq)
    logsp = c_true[0] + 2 * sum(
        c_true[k] * np.cos(k * omega) for k in range(1, 12))

    # path A: pysptk semantics on the power spectrum
    mc_a = sp2mc(np.exp(2 * logsp)[None], order, alpha)[0]

    # path B: evaluate log S at frequencies whose warped image is uniform
    warped = omega + 2.0 * np.arctan2(
        alpha * np.sin(omega), 1.0 - alpha * np.cos(omega))
    src = np.interp(omega, warped, omega)
    logsp_w = np.interp(src, omega, logsp)
    full = np.concatenate([logsp_w, logsp_w[-2:0:-1]])
    cep = np.fft.ifft(full).real
    mc_b = np.concatenate([[cep[0]], 2 * cep[1: order + 1]])

    np.testing.assert_allclose(mc_a, mc_b, atol=2e-3)


def test_freqt_matrix_is_linear_map(rng):
    c = rng.standard_normal((5, 257))
    direct = freqt(c, 12, 0.41)
    assert direct.shape == (5, 13)
    # linearity
    np.testing.assert_allclose(
        freqt(2 * c[0] + c[1], 12, 0.41),
        2 * direct[0] + direct[1], rtol=1e-10)


def test_sp2mc_reconstructs_flat_spectrum():
    env = np.ones((3, 257))
    mc = sp2mc(env, 10, 0.41)
    assert np.abs(mc).max() < 1e-8


def test_spc2npow_matches_naive():
    rng = np.random.default_rng(1)
    sp = rng.random((7, 129)) + 0.1
    got = spc2npow(sp)
    # naive per-frame loop (the reference's _spvec2pow)
    pows = []
    for row in sp:
        fftl2 = len(row) - 1
        p = row[0] + row[fftl2]
        for k in range(1, fftl2):
            p += 2.0 * row[k]
        pows.append(p / (2 * fftl2))
    pows = np.asarray(pows)
    ref = 10 * np.log10(pows / pows.mean())
    np.testing.assert_allclose(got, ref, rtol=1e-10)


def test_mcep_shapes_and_stability(rng):
    wav = _tone(220) + 0.01 * rng.standard_normal(8000)
    mc, pw = mcep_from_wav(wav, 16000, CFG)
    assert mc.shape[1] == CFG.mcep_dim + 1
    assert len(pw) == len(mc)
    assert np.isfinite(mc).all()


def test_empty_span_scores_nan(rng):
    """A zero-length replaced span (degenerate protocol mask on a 1-2
    token utterance) must score NaN, not crash the filter chain."""
    wav = _tone(220) + 0.01 * rng.standard_normal(8000)
    assert np.isnan(mcd_between_waveforms(wav[:0], wav, 16000, CFG))
    assert np.isnan(mcd_between_waveforms(wav, wav[:0], 16000, CFG))


def test_dtw_identical_sequences_diagonal(rng):
    x = rng.standard_normal((20, 4))
    pi, pj = dtw_path(x, x)
    np.testing.assert_array_equal(pi, pj)
    np.testing.assert_array_equal(pi, np.arange(20))


def test_dtw_alignment_with_time_warp(rng):
    x = rng.standard_normal((10, 3))
    y = np.repeat(x, 2, axis=0)  # time-stretched copy
    pi, pj = dtw_path(x, y)
    d = np.abs(x[pi] - y[pj]).max()
    assert d < 1e-12


def test_dtw_matches_bruteforce(rng):
    """Anti-diagonal vectorized DP == straightforward O(T^2) loop."""
    x = rng.standard_normal((12, 3))
    y = rng.standard_normal((15, 3))
    pi, pj = dtw_path(x, y)
    # brute-force accumulation
    d = np.sqrt(((x[:, None] - y[None]) ** 2).sum(-1))
    acc = np.full((13, 16), np.inf)
    acc[0, 0] = 0
    for i in range(1, 13):
        for j in range(1, 16):
            acc[i, j] = d[i - 1, j - 1] + min(
                acc[i - 1, j], acc[i - 1, j - 1], acc[i, j - 1])
    path_cost = d[pi, pj].sum()
    np.testing.assert_allclose(path_cost, acc[12, 15], rtol=1e-10)


def test_mcd_zero_for_identical_and_positive_for_different(rng):
    wav1 = _tone(220) + 0.01 * rng.standard_normal(8000)
    wav2 = _tone(500) + 0.01 * rng.standard_normal(8000)
    same = mcd_between_waveforms(wav1, wav1, 16000, CFG)
    diff = mcd_between_waveforms(wav1, wav2, 16000, CFG)
    assert same < 1e-8
    assert diff > 1.0
    wav3 = _tone(240) + 0.01 * rng.standard_normal(8000)
    closer = mcd_between_waveforms(wav1, wav3, 16000, CFG)
    assert closer < diff


def test_silence_stripping(rng):
    wav = np.concatenate([np.zeros(4000), _tone(220, secs=0.25),
                          np.zeros(4000)])
    mc, pw = mcep_from_wav(wav, 16000, CFG)
    voiced = (pw > CFG.power_threshold_db).sum()
    assert 0 < voiced < len(pw)


@pytest.mark.skipif(not os.path.exists(REF_WAV), reason="no reference mount")
def test_self_mcd_zero_on_real_speech():
    """The reference repo's own golden (test_mcd_calculate_py.bats): a
    real utterance against itself scores 0.00 dB."""
    x, fs = _load_wav(REF_WAV)
    cfg = MCDConfig(mcep_dim=41, fftl=1024, f0min=40, f0max=700)
    mcd = mcd_between_waveforms(x, x, fs, cfg)
    assert mcd < 1e-8


@pytest.mark.skipif(not os.path.exists(REF_WAV), reason="no reference mount")
def test_real_speech_f0_plausible():
    x, fs = _load_wav(REF_WAV)
    f0 = estimate_f0(x, fs, 5.0, 70, 400)
    voiced = f0[f0 > 0]
    assert len(voiced) > 50
    med = np.median(voiced)
    assert 80 < med < 300  # plausible speaking F0


def test_middle_third_mask_str():
    assert middle_third_mask_str("a b c d e f") == "a b [MASK] e f"
    assert "[MASK]" in middle_third_mask_str("x y")
