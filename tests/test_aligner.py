"""Native C++ forced aligner tests: build, MFCC sanity, training
convergence, alignment accuracy on synthesized speech with known
boundaries."""

import os

import numpy as np
import pytest

from a3t_tpu.align import NativeAligner, align_corpus
from a3t_tpu.data.miniature import generate_mini_corpus


FS = 16000


def _synth(phones, durs, rng, fs=FS):
    """Synthesize distinct 'phones' as harmonic tones with known bounds."""
    freqs = {p: 150.0 + 90.0 * i for i, p in enumerate(sorted(set(phones)))}
    total = int(sum(durs) * fs)
    wav = np.zeros(total, np.float32)
    t0 = 0.0
    bounds = []
    for p, d in zip(phones, durs):
        s, e = int(t0 * fs), int((t0 + d) * fs)
        tt = np.arange(s, min(e, total)) / fs
        f0 = freqs[p]
        wav[s:len(tt) + s] = (0.4 * np.sin(2 * np.pi * f0 * tt)
                              + 0.15 * np.sin(2 * np.pi * 2 * f0 * tt))
        bounds.append((t0, t0 + d))
        t0 += d
    wav += 0.005 * rng.standard_normal(total).astype(np.float32)
    return wav, bounds


@pytest.fixture(scope="module")
def trained_aligner():
    rng = np.random.default_rng(7)
    phone_set = ["A", "B", "C", "D"]
    utts = []
    for _ in range(30):
        n = rng.integers(3, 7)
        phones = [phone_set[i] for i in rng.integers(0, 4, n)]
        durs = rng.uniform(0.08, 0.3, n)
        wav, _ = _synth(phones, durs, rng)
        utts.append((wav, phones))
    aligner = NativeAligner(phone_set, FS)
    lls = aligner.train(utts, n_iterations=8)
    return aligner, lls


def test_mfcc_extraction_shapes(trained_aligner, rng):
    aligner, _ = trained_aligner
    wav = rng.standard_normal(FS).astype(np.float32) * 0.1
    feats = aligner.extract(wav)
    assert feats.shape[1] == aligner.feat_dim == 39
    assert abs(feats.shape[0] - 98) <= 2  # ~10ms hop over 1s
    assert np.isfinite(feats).all()
    # CMN: static coefficients are zero-mean
    assert np.abs(feats[:, :13].mean(0)).max() < 1e-3


def test_training_likelihood_improves(trained_aligner):
    _, lls = trained_aligner
    assert np.isfinite(lls).all()
    assert lls[-1] > lls[0]  # EM increases per-frame likelihood


def test_alignment_accuracy(trained_aligner):
    aligner, _ = trained_aligner
    rng = np.random.default_rng(123)
    errs = []
    for _ in range(10):
        phones = [["A", "B", "C", "D"][i] for i in rng.integers(0, 4, 5)]
        durs = rng.uniform(0.1, 0.3, 5)
        wav, bounds = _synth(phones, durs, rng)
        start, end = aligner.align(wav, phones)
        assert len(start) == 5
        assert (end >= start).all()
        # interior boundary error vs ground truth
        for j in range(1, 5):
            errs.append(abs(start[j] - bounds[j][0]))
    errs = np.asarray(errs)
    # boundary error is bounded by the analysis window + delta context
    # (~25 ms + 40 ms feature smear); require median within 70 ms and the
    # bulk within 150 ms
    assert np.median(errs) < 0.07, errs
    assert np.mean(errs < 0.15) > 0.8, errs
    # alignment is deterministic
    phones = ["A", "B", "C"]
    wav, _ = _synth(phones, [0.2, 0.15, 0.25], np.random.default_rng(9))
    s1, _ = aligner.align(wav, phones)
    s2, _ = aligner.align(wav, phones)
    np.testing.assert_allclose(s1, s2)


def test_save_load_roundtrip(trained_aligner, tmp_path):
    aligner, _ = trained_aligner
    rng = np.random.default_rng(5)
    path = str(tmp_path / "model.bin")
    aligner.save(path)
    loaded = NativeAligner.load(path, FS)
    phones = ["A", "C", "B"]
    wav, _ = _synth(phones, [0.2, 0.2, 0.2], rng)
    s1, e1 = aligner.align(wav, phones)
    s2, e2 = loaded.align(wav, phones)
    np.testing.assert_allclose(s1, s2)
    np.testing.assert_allclose(e1, e2)


def test_align_corpus_writes_mfa_files(tmp_path):
    corpus = generate_mini_corpus(str(tmp_path / "d"), n_utts=10, fs=16000,
                                  seed=3)
    # remove the ground-truth alignments; regenerate with the native aligner
    for f in ("mfa_start", "mfa_end"):
        os.remove(os.path.join(corpus, f))
    out = align_corpus(corpus, sample_rate=16000, n_iterations=6)
    from a3t_tpu.data.fileio import load_num_sequence_text, read_2column_text

    text = read_2column_text(os.path.join(out, "mfa_text"))
    start = load_num_sequence_text(os.path.join(out, "mfa_start"))
    end = load_num_sequence_text(os.path.join(out, "mfa_end"))
    assert len(text) >= 8
    for uid in text:
        n = len(text[uid].split())
        assert len(start[uid]) == len(end[uid]) == n
        assert (np.diff(start[uid]) >= 0).all()
        assert (end[uid] >= start[uid]).all()


def test_gmm_mixture_splitting(trained_aligner):
    """Mixture doubling raises likelihood and keeps alignment quality."""
    rng = np.random.default_rng(21)
    phone_set = ["A", "B", "C", "D"]
    utts = []
    for _ in range(20):
        n = rng.integers(3, 6)
        phones = [phone_set[i] for i in rng.integers(0, 4, n)]
        durs = rng.uniform(0.1, 0.25, n)
        wav, _ = _synth(phones, durs, rng)
        utts.append((wav, phones))

    aligner = NativeAligner(phone_set, FS)
    lls = aligner.train(utts, n_iterations=5, n_mixtures=2)
    assert aligner.n_mixtures == 2
    # likelihood after the 2-mix block beats the 1-mix block's end
    assert lls[-1] >= lls[4] - 0.2

    # still aligns sensibly and round-trips through save/load
    wav, bounds = _synth(["A", "B", "C"], [0.2, 0.2, 0.2], rng)
    s1, e1 = aligner.align(wav, ["A", "B", "C"])
    assert (e1 >= s1).all()
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "m.bin")
        aligner.save(path)
        loaded = NativeAligner.load(path, FS)
        assert loaded.n_mixtures == 2
        s2, _ = loaded.align(wav, ["A", "B", "C"])
        np.testing.assert_allclose(s1, s2)


def test_optional_sp_alignment(trained_aligner):
    """Skippable 'sp' phones: absent pauses collapse to zero length,
    real pauses get frames."""
    rng = np.random.default_rng(33)
    phone_set = ["A", "B", "C", "SP"]
    # train with silence segments so SP has a model
    utts = []
    for _ in range(25):
        n = rng.integers(2, 4)
        phones, durs = [], []
        for k in range(n):
            phones.append(["A", "B", "C"][rng.integers(0, 3)])
            durs.append(rng.uniform(0.12, 0.3))
            if k < n - 1 and rng.random() < 0.5:
                phones.append("SP")
                durs.append(rng.uniform(0.05, 0.15))
        wav, _ = _synth_with_silence(phones, durs, rng)
        utts.append((wav, phones))
    aligner = NativeAligner(phone_set, FS)
    aligner.train(utts, n_iterations=8)

    # utterance WITH a real pause between A and B
    wav, bounds = _synth_with_silence(["A", "SP", "B"], [0.25, 0.12, 0.25],
                                      rng)
    s, e = aligner.align(wav, ["A", "SP", "B"], optional=[False, True, False])
    assert e[1] > s[1]  # pause detected

    # utterance WITHOUT a pause: sp collapses
    wav2, _ = _synth_with_silence(["A", "B"], [0.25, 0.25], rng)
    s2, e2 = aligner.align(wav2, ["A", "SP", "B"],
                           optional=[False, True, False])
    dur_sp = e2[1] - s2[1]
    assert dur_sp <= 0.05  # (near-)zero length
    assert e2[-1] > s2[-1]


def _synth_with_silence(phones, durs, rng, fs=FS):
    freqs = {"A": 170.0, "B": 260.0, "C": 350.0}
    total = int(sum(durs) * fs)
    wav = np.zeros(total, np.float32)
    t0 = 0.0
    bounds = []
    for p, d in zip(phones, durs):
        s, e = int(t0 * fs), int((t0 + d) * fs)
        if p != "SP":
            tt = np.arange(s, min(e, total)) / fs
            wav[s:len(tt) + s] = 0.4 * np.sin(2 * np.pi * freqs[p] * tt)
        bounds.append((t0, t0 + d))
        t0 += d
    wav += 0.004 * rng.standard_normal(total).astype(np.float32)
    return wav, bounds
