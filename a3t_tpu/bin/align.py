"""Forced-alignment CLI (align_english.py batch-mode analogue).

    python -m a3t_tpu.bin.align --data-dir data/train --sample-rate 16000 \
        [--model aligner.bin] [--save-model aligner.bin] [--iters 10]

Reads wav.scp + text (phone strings; or words with --lexicon), trains or
loads monophone models, writes mfa_text/mfa_start/mfa_end.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser(description="A3T forced alignment")
    parser.add_argument("--data-dir", required=True)
    parser.add_argument("--out-dir", default=None)
    parser.add_argument("--sample-rate", type=int, default=16000)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--save-model", default=None)
    parser.add_argument("--lexicon", default=None,
                        help="word<space>PH1 PH2... file; text treated as "
                             "words when given")
    args = parser.parse_args(argv)

    lexicon = None
    if args.lexicon:
        lexicon = {}
        with open(args.lexicon, encoding="utf-8") as f:
            for line in f:
                parts = line.split()
                if len(parts) >= 2:
                    lexicon[parts[0].upper()] = parts[1:]

    from a3t_tpu.align import align_corpus

    out = align_corpus(
        args.data_dir, args.out_dir, lexicon=lexicon,
        sample_rate=args.sample_rate, n_iterations=args.iters,
        model_path=args.save_model)
    print(f"alignments written to {out}")


if __name__ == "__main__":
    main()
