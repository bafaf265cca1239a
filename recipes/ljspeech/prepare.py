"""LJSpeech data preparation (egs2/ljspeech/sedit local/data.sh analogue).

From an LJSpeech-1.1 checkout (metadata.csv + wavs/*.wav):
  1. write Kaldi-style data dirs (wav.scp, text) with a train/dev/eval split,
  2. phonemize the transcripts with the native g2p (lexicon built on the
     fly; the reference uses the CMU dict + english2phoneme),
  3. force-align with the native aligner -> mfa_text/mfa_start/mfa_end.

LJSpeech wavs are 22.05 kHz PCM; pass --fs to resample expectations (the
reference recipe trains LJSpeech sedit at fs=22050/hop=256 or 24k).

    python recipes/ljspeech/prepare.py --corpus /data/LJSpeech-1.1 \
        --out dump/ljspeech [--dev-utts 100 --eval-utts 100]
"""

import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--corpus", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--dev-utts", type=int, default=100)
    parser.add_argument("--eval-utts", type=int, default=100)
    parser.add_argument("--fs", type=int, default=22050,
                        help="training sample rate; sources are formatted "
                             "(resampled) to this before alignment "
                             "(reference mlm.sh stage 2 format_wav_scp.sh)")
    parser.add_argument("--skip-align", action="store_true")
    args = parser.parse_args()

    from a3t_tpu.data.fileio import write_2column_text
    from a3t_tpu.inference.sedit import clean_words
    from a3t_tpu.text.native_g2p import letter_to_sound

    meta = os.path.join(args.corpus, "metadata.csv")
    entries = []
    with open(meta, encoding="utf-8") as f:
        for row in csv.reader(f, delimiter="|"):
            uid, _, normalized = row[0], row[1], row[-1]
            wav = os.path.join(args.corpus, "wavs", uid + ".wav")
            if os.path.exists(wav):
                entries.append((uid, wav, normalized))
    entries.sort()

    splits = {
        "eval1": entries[: args.eval_utts],
        "dev": entries[args.eval_utts: args.eval_utts + args.dev_utts],
        "tr_no_dev": entries[args.eval_utts + args.dev_utts:],
    }

    lexicon: dict[str, list[str]] = {}
    for name, split in splits.items():
        d = os.path.join(args.out, name)
        wav_scp, text = {}, {}
        for uid, wav, transcript in split:
            phones = []
            for w in clean_words(transcript):
                wu = w.upper()
                if wu not in lexicon:
                    lexicon[wu] = letter_to_sound(w)
                phones.extend(lexicon[wu])
            if not phones:
                continue
            wav_scp[uid] = wav
            text[uid] = " ".join(phones)
        write_2column_text(os.path.join(d, "wav.scp"), wav_scp)
        write_2column_text(os.path.join(d, "text"), text)
        write_2column_text(os.path.join(d, "utt2spk"),
                           {u: "LJ" for u in wav_scp})
        # format stage: mono PCM16 @ --fs (resamples when --fs != 22050)
        from a3t_tpu.data.format_wav import format_data_dir

        report = format_data_dir(d, d, args.fs)
        print(f"{name}: {len(wav_scp)} utts (formatted -> {args.fs} Hz, "
              f"{report['source_fs_counts']})")

    with open(os.path.join(args.out, "lexicon.txt"), "w") as f:
        for w in sorted(lexicon):
            f.write(f"{w} {' '.join(lexicon[w])}\n")

    if not args.skip_align:
        from a3t_tpu.align import align_corpus

        model_path = os.path.join(args.out, "aligner.bin")
        for name in ("tr_no_dev", "dev", "eval1"):
            print(f"aligning {name}...")
            align_corpus(os.path.join(args.out, name),
                         sample_rate=args.fs, n_iterations=10,
                         model_path=model_path if name == "tr_no_dev" else None)


if __name__ == "__main__":
    main()
