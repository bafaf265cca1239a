"""Soak-recipe components: speech-like corpus synthesis + corpus-scale
aligner eval + record packing (recipes/soak/run.py stages 1-3)."""

import json
import os
import sys
import wave

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _load(path):
    f = wave.open(path)
    x = np.frombuffer(f.readframes(f.getnframes()), np.int16)
    return f.getframerate(), x.astype(np.float32) / 32768.0


def test_speechlike_corpus_structure(tmp_path):
    from a3t_tpu.data.fileio import load_num_sequence_text, read_2column_text
    from a3t_tpu.data.miniature import (
        SPEECHLIKE_PHONES, generate_speechlike_corpus)

    d = str(tmp_path / "data")
    generate_speechlike_corpus(d, n_utts=6, n_speakers=3, seed=3)
    wav_scp = read_2column_text(os.path.join(d, "wav.scp"))
    text = read_2column_text(os.path.join(d, "text"))
    starts = load_num_sequence_text(os.path.join(d, "mfa_start"))
    ends = load_num_sequence_text(os.path.join(d, "mfa_end"))
    assert len(wav_scp) == 6
    for uid, path in wav_scp.items():
        fs, x = _load(path)
        assert fs == 16000
        phones = text[uid].split()
        assert all(p in SPEECHLIKE_PHONES for p in phones)
        assert len(starts[uid]) == len(phones) == len(ends[uid])
        # boundaries are monotone and end within the waveform
        b = np.concatenate([starts[uid], ends[uid][-1:]])
        assert (np.diff(b) > 0).all()
        assert abs(ends[uid][-1] - len(x) / fs) < 0.01
        # audible signal, no clipping
        assert 0.02 < np.sqrt((x ** 2).mean()) < 0.5
        assert np.abs(x).max() <= 1.0


def test_speechlike_phones_are_spectrally_distinct(tmp_path):
    """A vowel and a fricative from the corpus occupy different bands —
    the property that makes masked reconstruction learnable."""
    from a3t_tpu.data.miniature import _noise_segment, _voiced_segment

    rng = np.random.default_rng(0)
    fs, n = 16000, 4000
    f0 = np.full(n, 120.0, np.float32)
    vowel = _voiced_segment(f0, fs, (270, 2290, 3010), 1.0)
    fric = _noise_segment((4000, 7800), fs, n, rng, 1.0)

    def centroid(x):
        spec = np.abs(np.fft.rfft(x)) ** 2
        freqs = np.fft.rfftfreq(len(x), 1.0 / fs)
        return (freqs * spec).sum() / spec.sum()

    assert centroid(vowel) < 1500.0
    assert centroid(fric) > 3500.0


def test_soak_stages_align_and_pack(tmp_path):
    """Stages 2-3 on a tiny corpus: aligner-vs-oracle stats come out finite
    and the packed records round-trip through the task's auto-detection."""
    import recipes.soak.run as soak

    class A:
        n_utts, n_speakers = 30, 2
        align_utts, align_mixtures = 24, 1

    train = str(tmp_path / "train")
    workdir = str(tmp_path)
    from a3t_tpu.data.miniature import generate_speechlike_corpus

    generate_speechlike_corpus(train, n_utts=A.n_utts,
                               n_speakers=A.n_speakers, seed=1)
    soak.stage2_align(A, train, workdir)
    stats = json.load(open(os.path.join(workdir, "aligner_eval.json")))
    assert stats["n_boundaries"] > 50
    assert np.isfinite(stats["median_ms"])
    assert stats["median_ms"] < 60.0  # sane even at tiny EM scale
    # oracle kept, aligner output installed
    assert os.path.exists(os.path.join(train, "mfa_start.oracle"))
    assert os.path.exists(os.path.join(train, "mfa_start"))

    records = str(tmp_path / "records")
    soak.stage3_pack(A, train, records)
    assert os.path.exists(os.path.join(records, "index.npz"))

    from a3t_tpu.data.records import RecordDataset

    ds = RecordDataset(records)
    assert len(ds) == A.n_utts
    item = ds[ds.uids[0]]
    assert item["audio"].ndim == 1 and len(item["phones"]) > 0
