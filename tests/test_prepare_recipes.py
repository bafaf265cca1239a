"""Real-corpus prep scripts driven end-to-end on synthetic fixtures.

Round-2 gap: recipes/{vctk,ljspeech}/prepare.py had never executed (no
egress to the corpora) and carried a silent 48 kHz-source / 24 kHz-config
mismatch.  These tests build miniature corpus layouts (VCTK wav48/txt
trees, LJSpeech metadata.csv) from synthesized audio and run the actual
scripts — format stage, g2p, native alignment — asserting the output data
dirs are consistent and at the target sample rate.
"""

import csv
import os
import runpy
import sys

import numpy as np
import pytest

from a3t_tpu.data.fileio import (
    load_num_sequence_text,
    read_2column_text,
    read_wav,
    write_wav,
)

REPO = os.path.join(os.path.dirname(__file__), "..")


def synth_word_wav(rng, fs, dur=0.6):
    """Speech-ish buzz: pulse train + noise, enough for flat-start EM."""
    t = np.arange(int(dur * fs)) / fs
    f0 = rng.uniform(100, 220)
    wav = 0.2 * np.sign(np.sin(2 * np.pi * f0 * t)) * np.sin(
        2 * np.pi * 4 * t) ** 2
    wav += 0.02 * rng.standard_normal(len(t))
    return wav.astype(np.float32)


def run_script(path, argv):
    old = sys.argv
    sys.argv = [path] + argv
    try:
        runpy.run_path(path, run_name="__main__")
    finally:
        sys.argv = old


@pytest.mark.slow
def test_vctk_prepare_formats_to_24k(tmp_path, rng):
    corpus = tmp_path / "VCTK-Corpus"
    words = ["PLEASE", "CALL", "STELLA", "ASK", "HER"]
    for spk in ("p225", "p226", "p227"):
        os.makedirs(corpus / "wav48" / spk)
        os.makedirs(corpus / "txt" / spk)
        for i in range(3):
            uid = f"{spk}_{i:03d}"
            write_wav(str(corpus / "wav48" / spk / f"{uid}.wav"), 48000,
                      np.concatenate([synth_word_wav(rng, 48000)
                                      for _ in range(2)]))
            text = " ".join(words[i : i + 2])
            with open(corpus / "txt" / spk / f"{uid}.txt", "w") as f:
                f.write(text + "\n")

    out = str(tmp_path / "out")
    run_script(os.path.join(REPO, "recipes", "vctk", "prepare.py"),
               ["--corpus", str(corpus), "--out", out,
                "--unseen-speakers", "p227", "--dev-per-spk", "1",
                "--target-fs", "24000"])

    for split, n_spk in (("tr_no_dev", 2), ("dev", 2), ("eval_unseen", 1)):
        d = os.path.join(out, split)
        scp = read_2column_text(os.path.join(d, "wav.scp"))
        assert len(scp) > 0
        fs, wav = read_wav(next(iter(scp.values())))
        assert fs == 24000  # the round-2 bug: stayed 48000
        texts = read_2column_text(os.path.join(d, "text"))
        assert set(texts) == set(scp)
        spks = set(read_2column_text(os.path.join(d, "utt2spk")).values())
        assert len(spks) == n_spk
        # alignment ran at the target rate and covers every phone
        starts = load_num_sequence_text(os.path.join(d, "mfa_start"))
        ends = load_num_sequence_text(os.path.join(d, "mfa_end"))
        mfa_text = read_2column_text(os.path.join(d, "mfa_text"))
        for uid in starts:
            n_ph = len(mfa_text[uid].split())
            assert len(starts[uid]) == n_ph == len(ends[uid])
            dur_samples = len(read_wav(scp[uid])[1]) / 24000
            assert 0 <= starts[uid][0] and ends[uid][-1] <= dur_samples + 0.1


@pytest.mark.slow
def test_ljspeech_prepare_runs(tmp_path, rng):
    corpus = tmp_path / "LJSpeech-1.1"
    os.makedirs(corpus / "wavs")
    rows = []
    for i in range(6):
        uid = f"LJ001-{i:04d}"
        write_wav(str(corpus / "wavs" / f"{uid}.wav"), 22050,
                  np.concatenate([synth_word_wav(rng, 22050)
                                  for _ in range(2)]))
        rows.append([uid, "Some text", "CALL STELLA NOW"])
    with open(corpus / "metadata.csv", "w", newline="") as f:
        csv.writer(f, delimiter="|").writerows(rows)

    out = str(tmp_path / "out")
    run_script(os.path.join(REPO, "recipes", "ljspeech", "prepare.py"),
               ["--corpus", str(corpus), "--out", out,
                "--dev-utts", "1", "--eval-utts", "1", "--fs", "16000"])

    d = os.path.join(out, "tr_no_dev")
    scp = read_2column_text(os.path.join(d, "wav.scp"))
    assert len(scp) == 4
    fs, _ = read_wav(next(iter(scp.values())))
    assert fs == 16000  # resampled by the format stage
    assert os.path.exists(os.path.join(d, "mfa_start"))
