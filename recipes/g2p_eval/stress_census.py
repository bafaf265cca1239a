"""Stress-engine census: classify every remaining native-vs-binary G2P
disagreement over the FULL dictionary.

docs/G2P_EVAL.md claims the residual ~1.4% phone disagreement (8%
exact-word) is the reference binary's *word-level stress engine* —
vowel-value flips driven by stress assignment/reduction — which context
rules cannot encode.  This census tests that claim on the population:
for each disagreeing word, does the consonant skeleton match (pure
vowel-quality disagreement = stress territory), and how does the
disagreement rate scale with word length (the stress engine's trigger)?

Writes docs/G2P_STRESS_CENSUS.json.

    python recipes/g2p_eval/stress_census.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.dirname(__file__))

from run import (  # noqa: E402  (recipes/g2p_eval/run.py)
    REF_DICT,
    bases,
    edit_distance,
    reference_g2p,
)

VOWELS = {"AA", "AE", "AH", "AO", "AW", "AY", "EH", "ER", "EY",
          "IH", "IY", "OW", "OY", "UH", "UW"}


def consonant_skeleton(phones: list[str]) -> list[str]:
    return [p for p in bases(phones) if p not in VOWELS]


def main() -> None:
    from a3t_tpu.text.lexicon import load_cmu_dict
    from a3t_tpu.text.native_g2p import letter_to_sound

    lex = load_cmu_dict(REF_DICT)
    words = sorted(w for w in lex if w.isalpha() and w.isascii())

    native = {w: letter_to_sound(w.lower()) for w in words}
    binary = {}
    chunk = 4000
    for i in range(0, len(words), chunk):
        binary.update(reference_g2p(words[i : i + chunk]))

    n_exact = 0
    diffs = []
    for w in words:
        a, b = bases(native[w]), bases(binary[w])
        if a == b:
            n_exact += 1
            continue
        diffs.append(w)

    # classify the disagreements
    vowel_only = []          # consonant skeletons identical
    skel_len_match = []      # same skeleton length, >=1 consonant differs
    structural = []          # skeleton length differs
    for w in diffs:
        sa, sb = consonant_skeleton(native[w]), consonant_skeleton(binary[w])
        if sa == sb:
            vowel_only.append(w)
        elif len(sa) == len(sb):
            skel_len_match.append(w)
        else:
            structural.append(w)

    # word-length profile: stress reduction triggers on longer words
    def len_hist(ws):
        h = {}
        for w in ws:
            k = min(len(w), 14)
            h[k] = h.get(k, 0) + 1
        return {str(k): h[k] for k in sorted(h)}

    total_by_len = {}
    for w in words:
        k = min(len(w), 14)
        total_by_len[k] = total_by_len.get(k, 0) + 1
    diff_by_len = {}
    for w in diffs:
        k = min(len(w), 14)
        diff_by_len[k] = diff_by_len.get(k, 0) + 1
    rate_by_len = {str(k): round(diff_by_len.get(k, 0) / total_by_len[k], 4)
                   for k in sorted(total_by_len)}

    # among vowel-only diffs: how many vowels flip per word
    flip_counts = []
    for w in vowel_only:
        a = [p for p in bases(native[w]) if p in VOWELS]
        b = [p for p in bases(binary[w]) if p in VOWELS]
        if len(a) == len(b):
            flip_counts.append(sum(x != y for x, y in zip(a, b)))

    report = {
        "n_words": len(words),
        "exact_word_match_pct": round(100.0 * n_exact / len(words), 2),
        "n_disagreements": len(diffs),
        "vowel_only": {
            "n": len(vowel_only),
            "pct_of_disagreements": round(
                100.0 * len(vowel_only) / max(len(diffs), 1), 1),
            "mean_vowel_flips": round(float(np.mean(flip_counts)), 2)
            if flip_counts else None,
        },
        "consonant_same_length": {
            "n": len(skel_len_match),
            "pct_of_disagreements": round(
                100.0 * len(skel_len_match) / max(len(diffs), 1), 1),
        },
        "structural": {
            "n": len(structural),
            "pct_of_disagreements": round(
                100.0 * len(structural) / max(len(diffs), 1), 1),
            "examples": structural[:10],
        },
        "disagreement_rate_by_word_length": rate_by_len,
        "len_hist_vowel_only": len_hist(vowel_only),
        "conclusion_test": ("stress-engine hypothesis holds if vowel_only "
                            "dominates and the rate grows with word length"),
    }
    out = os.path.join(os.path.dirname(__file__), "..", "..", "docs",
                       "G2P_STRESS_CENSUS.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
