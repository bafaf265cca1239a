"""Mel-cepstral distortion (MCD) evaluation harness.

Reproduces the reference protocol (utils/mcd_calculate.py:152-211,
aggregate_output/sedit_mcd.py:37-135):

    wav -> low-cut filter -> spectral envelope -> mel-cepstrum (dim 80)
        -> silence stripping by frame power (-20 dB threshold)
        -> DTW alignment -> mean over path of 10/ln10 * sqrt(2 * sum diff^2)

The reference relies on C-backed pip packages (pyworld CheapTrick, pysptk
sp2mc, fastdtw) that are not in this image, so the harness is clean-room
numpy:

* the spectral envelope is a cepstrally-smoothed STFT power spectrum
  (CheapTrick-like smoothing without F0 adaptivity),
* sp2mc's all-pass frequency warping is implemented by resampling the log
  envelope on the warped frequency grid before the inverse DFT,
* DTW is the exact O(T^2) dynamic program (fastdtw approximates it).

Numbers are therefore *self-consistent* (same extractor on both sides of
every comparison, which is what an MCD gate needs) though not bit-identical
to pysptk's.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class MCDConfig:
    mcep_dim: int = 80  # sedit_mcd.py uses dim 80 (aggregate_output)
    fftl: int = 1024
    shiftms: float = 5.0
    power_threshold_db: float = -20.0
    lowcut_hz: float = 70.0
    cepstral_smoothing: int = 40  # quefrency cutoff for envelope smoothing


def mcep_alpha(fs: int) -> float:
    """Standard all-pass constants for mel warping per sample rate."""
    table = {8000: 0.312, 16000: 0.41, 22050: 0.455, 24000: 0.466,
             44100: 0.544, 48000: 0.554}
    if fs in table:
        return table[fs]
    # linear-ish fallback
    return float(np.clip(0.41 + (fs - 16000) / 8000 * 0.056, 0.3, 0.6))


def low_cut_filter(x: np.ndarray, fs: int, cutoff: float = 70.0) -> np.ndarray:
    """FIR high-pass (the reference's low_cut_filter)."""
    from scipy.signal import firwin, lfilter

    if cutoff <= 0:
        return x
    nyq = fs / 2.0
    fil = firwin(255, cutoff / nyq, pass_zero=False)
    return lfilter(fil, 1, x)


def _frames(x: np.ndarray, fs: int, fftl: int, shiftms: float) -> np.ndarray:
    hop = int(fs * shiftms / 1000.0)
    win = np.hanning(fftl)
    n_frames = max(1, (len(x) - fftl) // hop + 1)
    idx = np.arange(n_frames)[:, None] * hop + np.arange(fftl)[None, :]
    idx = np.minimum(idx, len(x) - 1)
    return x[idx] * win


def spectral_envelope(x: np.ndarray, fs: int, config: MCDConfig) -> np.ndarray:
    """Cepstrally-smoothed power-spectral envelope, (T, fftl//2+1)."""
    frames = _frames(x, fs, config.fftl, config.shiftms)
    spec = np.abs(np.fft.rfft(frames, config.fftl)) ** 2 + 1e-12
    logspec = np.log(spec)
    # cepstral smoothing: keep low quefrencies only
    cep = np.fft.irfft(logspec, config.fftl, axis=1)
    lifter = np.zeros(config.fftl)
    lifter[: config.cepstral_smoothing] = 1.0
    lifter[-config.cepstral_smoothing + 1:] = 1.0
    smooth = np.fft.rfft(cep * lifter, config.fftl, axis=1).real
    return np.exp(smooth)


def sp2mc(envelope: np.ndarray, order: int, alpha: float,
          fftl: int) -> np.ndarray:
    """Mel-cepstrum from a spectral envelope (pysptk.sp2mc equivalent).

    Resamples the log envelope on the all-pass-warped frequency grid
    ``w' = w + 2 atan(a sin w / (1 - a cos w))`` and takes the first
    ``order + 1`` cepstral coefficients of the warped log spectrum.
    """
    n_freq = envelope.shape[1]
    omega = np.linspace(0, np.pi, n_freq)
    # inverse warp: for each warped bin, the source (linear) frequency
    warped = omega + 2.0 * np.arctan2(
        alpha * np.sin(omega), 1.0 - alpha * np.cos(omega))
    # we need log S at frequencies whose *warped* position is uniform:
    # invert numerically by interpolation of the monotone mapping
    src = np.interp(omega, warped, omega)
    logsp = 0.5 * np.log(envelope)  # amplitude log
    warped_log = np.stack(
        [np.interp(src, omega, row) for row in logsp], axis=0)
    full = np.concatenate([warped_log, warped_log[:, -2:0:-1]], axis=1)
    cep = np.fft.ifft(full, axis=1).real
    mc = cep[:, : order + 1].copy()
    mc[:, 1:] *= 2.0  # one-sided cepstrum convention (c_k + c_{-k})
    return mc


def frame_power_db(envelope: np.ndarray) -> np.ndarray:
    """Normalized per-frame power in dB (the reference's spc2npow)."""
    power = envelope.sum(axis=1)
    mean_p = power.mean() + 1e-12
    return 10.0 * np.log10(power / mean_p + 1e-12)


def mcep_from_wav(
    wav: np.ndarray, fs: int, config: MCDConfig = MCDConfig()
) -> tuple[np.ndarray, np.ndarray]:
    """wav -> (mcep (T, dim+1), frame power dB (T,))."""
    x = low_cut_filter(np.asarray(wav, np.float64), fs, config.lowcut_hz)
    env = spectral_envelope(x, fs, config)
    mc = sp2mc(env, config.mcep_dim, mcep_alpha(fs), config.fftl)
    return mc, frame_power_db(env)


def dtw_path(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Exact DTW (euclidean local cost); returns aligned index arrays."""
    tx, ty = len(x), len(y)
    # pairwise distances
    d = np.sqrt(
        ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1))
    acc = np.full((tx + 1, ty + 1), np.inf)
    acc[0, 0] = 0.0
    for i in range(1, tx + 1):
        row_min = np.minimum(acc[i - 1, 1:], acc[i - 1, :-1])
        # acc[i, j] = d + min(acc[i-1,j], acc[i-1,j-1], acc[i,j-1]);
        # the horizontal dependency forces a scan
        prev = acc[i]
        prev[0] = np.inf
        best = row_min
        for j in range(1, ty + 1):
            m = min(best[j - 1], prev[j - 1])
            prev[j] = d[i - 1, j - 1] + m
    # backtrack
    path = []
    i, j = tx, ty
    while i > 0 and j > 0:
        path.append((i - 1, j - 1))
        steps = [(i - 1, j), (i - 1, j - 1), (i, j - 1)]
        costs = [acc[a, b] for a, b in steps]
        i, j = steps[int(np.argmin(costs))]
    path.reverse()
    p = np.asarray(path)
    return p[:, 0], p[:, 1]


def mcd_from_mceps(
    mc_cvt: np.ndarray, pow_cvt: np.ndarray,
    mc_gt: np.ndarray, pow_gt: np.ndarray,
    power_threshold_db: float = -20.0,
) -> float:
    """Silence-strip, DTW-align, average the frame-wise MCD
    (utils/mcd_calculate.py:179-210)."""
    cvt = mc_cvt[pow_cvt > power_threshold_db]
    gt = mc_gt[pow_gt > power_threshold_db]
    if len(cvt) == 0 or len(gt) == 0:
        return float("nan")
    pi, pj = dtw_path(cvt, gt)
    diff2sum = ((cvt[pi] - gt[pj]) ** 2).sum(axis=1)
    return float(np.mean(10.0 / np.log(10.0) * np.sqrt(2.0 * diff2sum)))


def mcd_between_waveforms(
    wav_cvt: np.ndarray, wav_gt: np.ndarray, fs: int,
    config: MCDConfig = MCDConfig(),
) -> float:
    mc_c, pw_c = mcep_from_wav(wav_cvt, fs, config)
    mc_g, pw_g = mcep_from_wav(wav_gt, fs, config)
    return mcd_from_mceps(mc_c, pw_c, mc_g, pw_g, config.power_threshold_db)


# ---------------------------------------------------------------------------
# protocol harness (aggregate_output/sedit_mcd.py:43-135)
# ---------------------------------------------------------------------------

def middle_third_mask_str(text: str) -> str:
    """The VCTK/LJSpeech protocol: replace the middle third of the words
    with [MASK]."""
    words = text.split()
    third = max(1, len(words) // 3)
    return " ".join(words[:third] + ["[MASK]"] + words[2 * third:])


def evaluate_masked_reconstruction(
    editor,
    alignment_source,
    dataset,
    uids,
    config: MCDConfig = MCDConfig(),
    texts: dict | None = None,
) -> dict:
    """Teacher-forced middle-third reconstruction MCD over ``uids``.

    For each utterance: mask the middle third, regenerate, vocode the
    *replaced span* only, and compute MCD against the ground-truth span
    audio — the reference's "replaced" split.
    Returns per-utt and mean MCD.
    """
    hop = editor.fe.config.hop_length
    fs = editor.fe.config.fs
    per_utt = {}
    for uid in uids:
        item = dataset[uid]
        wav = item["audio"]
        align = alignment_source(uid)
        text = texts[uid] if texts is not None else " ".join(item["phones"])
        masked = middle_third_mask_str(text)
        res = editor.reconstruct_masked_span(wav, align, text, masked)
        s, e = res.old_span_boundary
        if e <= s:
            continue
        gen_span = res.prediction[s * hop: e * hop]
        gt_span = wav[s * hop: e * hop]
        per_utt[uid] = mcd_between_waveforms(gen_span, gt_span, fs, config)
    vals = [v for v in per_utt.values() if np.isfinite(v)]
    return {
        "per_utt": per_utt,
        "mean_mcd": float(np.mean(vals)) if vals else float("nan"),
        "n": len(vals),
    }
