"""G2P accuracy evaluation: native rule engine vs the reference binary.

The reference's letter-to-sound path for OOV words is the
``english2phoneme`` C binary (espnet2/bin/align_english.py:15) whose raw
character stream is post-processed to ARPAbet-with-stress at
align_english.py:69-98.  This harness measures, on a word sample drawn
from the CMU dictionary the reference ships
(tools/alignment/aligner/english/dict):

  * phone-level agreement between our native C++ engine
    (a3t_tpu/text/native_g2p.py -> native/g2p/g2p.cc) and the reference
    binary's post-processed output;
  * each engine's accuracy against the CMU dictionary pronunciation
    (the closest thing to ground truth available).

Writes docs/G2P_EVAL.json.

    python recipes/g2p_eval/run.py [--n-words 500] [--seed 0]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

REF_BINARY = "/root/reference/tools/english2phoneme/phoneme"
REF_DICT = "/root/reference/tools/alignment/aligner/english/dict"

TWO_CHAR = {"TH", "SH", "HH", "DH", "CH", "ZH", "NG"}


def parse_phoneme_stream(phons: str) -> list[str]:
    """Reference post-processing of the binary's char stream to ARPAbet
    (clean-room re-expression of align_english.py:69-98 format rules):
    lowercase chars are single consonants (j->JH, h->HH, else uppercased);
    uppercase pairs are two-char codes (WH->W, fricative set kept, AX->AH0,
    other vowels get stress '1')."""
    phons = phons.replace(" ", "").replace("\n", "")
    seq, j = [], 0
    while j < len(phons):
        ch = phons[j]
        if ch > "Z":  # lowercase: single consonant
            seq.append({"j": "JH", "h": "HH"}.get(ch, ch.upper()))
            j += 1
        else:
            p = phons[j : j + 2]
            if p == "WH":
                seq.append("W")
            elif p in TWO_CHAR:
                seq.append(p)
            elif p == "AX":
                seq.append("AH0")
            else:
                seq.append(p + "1")
            j += 2
    return seq


def reference_g2p(words: list[str]) -> dict[str, list[str]]:
    """Run the reference english2phoneme binary on a word list."""
    inp = "\n".join(words) + "\n"
    out = subprocess.run([REF_BINARY], input=inp, capture_output=True,
                         text=True, timeout=120).stdout
    lines = [ln for ln in out.splitlines() if ln.strip()
             and not ln.startswith("Enter ")]
    if len(lines) != len(words):
        raise RuntimeError(
            f"binary returned {len(lines)} lines for {len(words)} words")
    return {w: parse_phoneme_stream(ln) for w, ln in zip(words, lines)}


def bases(phones: list[str]) -> list[str]:
    return [p.rstrip("012") for p in phones]


def edit_distance(a: list[str], b: list[str]) -> int:
    dp = np.arange(len(b) + 1)
    for i in range(1, len(a) + 1):
        prev = dp.copy()
        dp[0] = i
        for j in range(1, len(b) + 1):
            dp[j] = min(prev[j] + 1, dp[j - 1] + 1,
                        prev[j - 1] + (a[i - 1] != b[j - 1]))
    return int(dp[len(b)])


def accuracy(hyp: list[str], ref: list[str]) -> float:
    """Phone accuracy: 1 - edit_distance / len(ref) (floored at 0)."""
    if not ref:
        return 0.0
    return max(0.0, 1.0 - edit_distance(bases(hyp), bases(ref)) / len(ref))


def sample_words(n: int, seed: int) -> dict[str, list[str]]:
    from a3t_tpu.text.lexicon import load_cmu_dict

    lex = load_cmu_dict(REF_DICT)
    words = sorted(w for w in lex
                   if w.isalpha() and w.isascii() and 3 <= len(w) <= 10)
    rng = np.random.default_rng(seed)
    picked = [words[i] for i in rng.permutation(len(words))[:n]]
    return {w: lex[w] for w in picked}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-words", type=int, default=500)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="docs/G2P_EVAL.json")
    ap.add_argument("--dump-misses", type=int, default=0,
                    help="print the N worst native-vs-binary disagreements")
    ap.add_argument("--full", action="store_true",
                    help="census mode: run the ENTIRE dictionary through "
                         "both engines (no sampling error; ~2 min); "
                         "writes docs/G2P_FULL.json unless --out is given")
    args = ap.parse_args()

    from a3t_tpu.text.native_g2p import letter_to_sound as native_g2p

    if args.full:
        from a3t_tpu.text.lexicon import load_cmu_dict

        lex = load_cmu_dict(REF_DICT)
        all_words = sorted(w for w in lex if w.isalpha() and w.isascii()
                           and 2 <= len(w) <= 16)
        cmu = {w: lex[w] for w in all_words}
        ref = {}
        for i in range(0, len(all_words), 5000):
            ref.update(reference_g2p(all_words[i:i + 5000]))
        if args.out == "docs/G2P_EVAL.json":
            args.out = "docs/G2P_FULL.json"
        args.seed = None
    else:
        cmu = sample_words(args.n_words, args.seed)
    words = list(cmu)
    if not args.full:
        ref = reference_g2p(words)
    ours = {w: native_g2p(w.lower()) for w in words}

    vs_bin = [accuracy(ours[w], ref[w]) for w in words]
    ours_vs_cmu = [accuracy(ours[w], cmu[w]) for w in words]
    bin_vs_cmu = [accuracy(ref[w], cmu[w]) for w in words]

    report = {
        "n_words": len(words),
        "seed": args.seed,
        "native_vs_reference_binary": round(float(np.mean(vs_bin)), 4),
        "native_vs_cmu_dict": round(float(np.mean(ours_vs_cmu)), 4),
        "reference_binary_vs_cmu_dict": round(float(np.mean(bin_vs_cmu)), 4),
        "exact_match_vs_binary_pct": round(
            100.0 * float(np.mean([bases(ours[w]) == bases(ref[w])
                                   for w in words])), 1),
        "metric": "per-word phone accuracy (1 - edit_distance/len(ref), "
                  "stress-stripped), averaged over words",
    }
    print(json.dumps(report, indent=1))
    if args.dump_misses:
        worst = sorted(words, key=lambda w: accuracy(ours[w], ref[w]))
        for w in worst[: args.dump_misses]:
            print(f"{w:12s} ours={' '.join(bases(ours[w]))!r:40s} "
                  f"bin={' '.join(bases(ref[w]))!r:40s} "
                  f"cmu={' '.join(bases(cmu[w]))!r}")
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
