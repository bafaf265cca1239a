"""Letter-to-sound tests (python fallback + native C++ engine)."""

import numpy as np
import pytest

from a3t_tpu.text.g2p import letter_to_sound as py_g2p
from a3t_tpu.text.native_g2p import letter_to_sound as native_g2p

ARPABET = {
    "AA", "AE", "AH", "AO", "AW", "AY", "B", "CH", "D", "DH", "EH", "ER",
    "EY", "F", "G", "HH", "IH", "IY", "JH", "K", "L", "M", "N", "NG", "OW",
    "OY", "P", "R", "S", "SH", "T", "TH", "UH", "UW", "V", "W", "Y", "Z",
    "ZH",
}


def _valid(phones):
    for p in phones:
        base = p.rstrip("012")
        assert base in ARPABET, f"invalid phone {p}"


CASES = {
    # word: phones that must appear (subsequence, base phones)
    "cat": ["K", "AE", "T"],
    "ship": ["SH", "IH", "P"],
    "think": ["TH", "IH", "NG", "K"],
    "phone": ["F", "OW", "N"],
    "quick": ["K", "W", "IH", "K"],
    "judge": ["JH"],
    "know": ["N", "OW"],
    "church": ["CH", "ER", "CH"],
    "see": ["S", "IY"],
    "day": ["D", "EY"],
    "boy": ["B", "OY"],
    "out": ["AW", "T"],
}


def _bases(phones):
    return [p.rstrip("012") for p in phones]


@pytest.mark.parametrize("engine", [py_g2p, native_g2p],
                         ids=["python", "native"])
def test_g2p_outputs_valid_arpabet(engine):
    for word in ["hello", "world", "extraordinary", "xylophone", "rhythm",
                 "queue", "gnome"]:
        phones = engine(word)
        assert len(phones) > 0
        _valid(phones)


def test_native_g2p_common_words():
    hits = 0
    for word, expect in CASES.items():
        got = _bases(native_g2p(word))
        # expected phones appear in order as a subsequence
        it = iter(got)
        if all(p in it for p in expect):
            hits += 1
    # the rule engine is approximate; require most common patterns correct
    assert hits >= len(CASES) * 0.75, (
        {w: native_g2p(w) for w in CASES})


def test_native_g2p_silent_letters():
    assert _bases(native_g2p("knee"))[0] == "N"
    assert _bases(native_g2p("wrist"))[0] == "R"
    # silent final e
    assert _bases(native_g2p("make"))[-1] == "K"


def test_native_g2p_handles_garbage():
    assert native_g2p("") == ["AH0"]
    assert len(native_g2p("zzzzqqq")) > 0
    _valid(native_g2p("a1b2c3"))


def test_native_g2p_agreement_floor():
    """Phone-level agreement floor vs the reference english2phoneme binary
    and the CMU dictionary (full eval: recipes/g2p_eval/run.py ->
    docs/G2P_EVAL.json).  Measured at round 3 after the behavioral
    rule-tuning pass: 0.94-0.95 vs the binary across seeds 0/7/21 (dev
    seed was 7; this floor uses held-out seed 21), 0.77-0.79 vs CMU (the
    binary itself scores 0.78-0.79 vs CMU — it emits literal doubled
    consonants, which CMU collapses)."""
    import os
    import sys

    import numpy as np

    if not os.path.exists("/root/reference/tools/english2phoneme/phoneme"):
        pytest.skip("no reference mount")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from recipes.g2p_eval.run import (
        accuracy,
        reference_g2p,
        sample_words,
    )

    cmu = sample_words(150, seed=21)
    words = list(cmu)
    ref = reference_g2p(words)
    ours = {w: native_g2p(w.lower()) for w in words}
    vs_bin = float(np.mean([accuracy(ours[w], ref[w]) for w in words]))
    vs_cmu = float(np.mean([accuracy(ours[w], cmu[w]) for w in words]))
    # measured 0.955/0.78 on this seed after pass 9; floor leaves slack
    # for future rule churn without letting a regression slip to pass-8
    # levels unnoticed (measured 0.964 on this seed after pass 11)
    assert vs_bin >= 0.93, vs_bin
    assert vs_cmu >= 0.73, vs_cmu


def test_cmu_dict_loader():
    """Parse the reference's shipped CMU pronouncing dictionary."""
    import os
    import pytest

    path = "/root/reference/tools/alignment/aligner/english/dict"
    if not os.path.exists(path):
        pytest.skip("no reference mount")
    from a3t_tpu.text.lexicon import build_lexicon, load_cmu_dict

    lex = load_cmu_dict(path)
    assert len(lex) > 100000
    assert lex["HELLO"][0].startswith("HH")
    # stress stripping + first-pronunciation policy
    lex2 = load_cmu_dict(path, strip_stress=True)
    assert all(not any(ch.isdigit() for ch in p) for p in lex2["HELLO"])

    from a3t_tpu.text.g2p import letter_to_sound

    built = build_lexicon(["hello", "zzxq"], letter_to_sound, base=lex)
    assert built["HELLO"] == lex["HELLO"]
    assert len(built["ZZXQ"]) > 0  # g2p fallback


def test_cmu_dict_roundtrip(tmp_path):
    from a3t_tpu.text.lexicon import load_cmu_dict, save_cmu_dict

    lex = {"CAT": ["K", "AE1", "T"], "DOG": ["D", "AO1", "G"]}
    p = str(tmp_path / "d.dict")
    save_cmu_dict(lex, p)
    assert load_cmu_dict(p) == lex
