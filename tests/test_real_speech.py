"""Real-speech recipe (recipes/real_speech): corpus prep smoke test.

Stage 1 decodes the reference-bundled mini-AN4 sphere files + the fixture
wav, flat-starts the native aligner on them, and emits a full A3T corpus
dir whose token list extends a given base in-order (the grow_vocab
warm-start contract).  Skips when the reference mount is absent."""

import os
import subprocess
import sys

import numpy as np
import pytest

AN4_TAR = "/root/reference/egs2/mini_an4/asr1/downloads.tar.gz"

pytestmark = pytest.mark.skipif(
    not os.path.exists(AN4_TAR), reason="reference AN4 bundle not mounted")


@pytest.mark.slow
def test_stage1_prep(tmp_path):
    base_tokens = tmp_path / "base_tokens.txt"
    base_tokens.write_text(
        "<blank>\n<unk>\nAA\nAE\nAH\nEH\nIY\nK\nM\nN\nS\nT\n<sos/eos>\n")
    w = str(tmp_path / "work")
    r = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), "..", "recipes",
                      "real_speech", "run.py"),
         "--workdir", w, "--stage", "1", "--stop-stage", "1",
         "--init-params", str(tmp_path / "nonexistent"),
         "--base-tokens", str(base_tokens),
         "--align-mixtures", "1"],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]

    data = os.path.join(w, "data")
    for f in ("wav.scp", "text", "utt2spk", "mfa_start", "mfa_end",
              "tokens.txt"):
        assert os.path.exists(os.path.join(data, f)), f

    from a3t_tpu.data.fileio import (
        SoundScpReader, load_num_sequence_text, read_2column_text)

    scp = SoundScpReader(os.path.join(data, "wav.scp"))
    texts = read_2column_text(os.path.join(data, "text"))
    starts = load_num_sequence_text(os.path.join(data, "mfa_start"))
    ends = load_num_sequence_text(os.path.join(data, "mfa_end"))
    assert len(texts) >= 8  # 7 transcribed AN4 utts + the fixture
    assert "ctc_align_test" in texts
    for uid, t in texts.items():
        fs, wav = scp[uid]
        assert fs == 16000 and len(wav) > 1600
        phones = t.split()
        s, e = np.asarray(starts[uid]), np.asarray(ends[uid])
        assert len(s) == len(phones) == len(e)
        assert (e >= s).all() and e[-1] <= len(wav) / fs + 1e-3
        # monotone non-overlapping spans over non-skipped phones
        nz = e > s
        assert (np.diff(s[nz]) >= -1e-6).all()

    # token list extends the base in-order
    toks = [l.rstrip("\n") for l in open(os.path.join(data, "tokens.txt"))]
    base = [l.rstrip("\n") for l in open(base_tokens)]
    assert toks[: len(base)] == base
    phone_set = {p for t in texts.values() for p in t.split()}
    assert phone_set <= set(toks)
