"""Miniature corpus generator — the e2e test fixture.

The reference CI trains on a bundled seconds-long corpus
(egs2/mini_an4, ci/test_integration_espnet2.sh:18-62).  This module writes
an equivalent tiny Kaldi-style data directory from synthesized audio:
harmonic "vowels" with known phone boundaries, so forced alignments are
exact by construction.
"""

from __future__ import annotations

import os

import numpy as np

from a3t_tpu.data.fileio import write_2column_text, write_num_sequence_text, write_wav

PHONES = ["AA", "IY", "UW", "EH", "OW", "AH", "EY", "AO"]


def generate_mini_corpus(
    out_dir: str,
    n_utts: int = 12,
    fs: int = 8000,
    n_phones_range: tuple[int, int] = (4, 9),
    phone_dur_range: tuple[float, float] = (0.08, 0.25),
    seed: int = 0,
) -> str:
    """Write wav.scp/text/mfa_start/mfa_end/utt2spk under ``out_dir``."""
    rng = np.random.default_rng(seed)
    wav_dir = os.path.join(out_dir, "wav")
    os.makedirs(wav_dir, exist_ok=True)

    formants = {p: 200.0 + 60.0 * i for i, p in enumerate(PHONES)}

    wav_scp, text, utt2spk = {}, {}, {}
    starts, ends = {}, {}
    for i in range(n_utts):
        uid = f"utt{i:03d}"
        n_ph = int(rng.integers(*n_phones_range))
        phs = [PHONES[int(k)] for k in rng.integers(0, len(PHONES), n_ph)]
        durs = rng.uniform(*phone_dur_range, n_ph)
        bounds = np.concatenate([[0.0], np.cumsum(durs)])

        total = int(bounds[-1] * fs) + 1
        t = np.arange(total) / fs
        wav = np.zeros(total, np.float32)
        for j, p in enumerate(phs):
            s, e = int(bounds[j] * fs), int(bounds[j + 1] * fs)
            f0 = formants[p]
            seg_t = t[s:e]
            wav[s:e] = 0.4 * np.sin(2 * np.pi * f0 * seg_t) + 0.1 * np.sin(
                2 * np.pi * 2.5 * f0 * seg_t
            )
        wav += 0.01 * rng.standard_normal(total).astype(np.float32)

        path = os.path.join(wav_dir, f"{uid}.wav")
        write_wav(path, fs, wav)
        wav_scp[uid] = path
        text[uid] = " ".join(phs)
        starts[uid] = np.round(bounds[:-1], 4)
        ends[uid] = np.round(bounds[1:], 4)
        utt2spk[uid] = f"spk{i % 3}"

    write_2column_text(os.path.join(out_dir, "wav.scp"), wav_scp)
    write_2column_text(os.path.join(out_dir, "text"), text)
    write_num_sequence_text(os.path.join(out_dir, "mfa_start"), starts)
    write_num_sequence_text(os.path.join(out_dir, "mfa_end"), ends)
    write_2column_text(os.path.join(out_dir, "utt2spk"), utt2spk)
    return out_dir
