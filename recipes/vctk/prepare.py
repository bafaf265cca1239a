"""VCTK data preparation (egs2/vctk/sedit local/data_vctk.sh analogue).

From a VCTK-Corpus checkout (wav48/<spk>/*.wav + txt/<spk>/*.txt):
  1. Kaldi-style dirs with speaker-aware train/dev splits (held-out
     speakers for the unseen-speaker MCD protocol),
  2. format stage: resample the 48 kHz source to --target-fs mono PCM16
     (the reference's mlm.sh stage 2 / format_wav_scp.sh sox pass;
     run.sh:11 trains VCTK at fs=24000),
  3. native-g2p phonemization, 4. native forced alignment at target fs.

    python recipes/vctk/prepare.py --corpus /data/VCTK-Corpus \
        --out dump/vctk [--unseen-speakers p225 p226 ...]
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--corpus", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--unseen-speakers", nargs="*",
                        default=["p225", "p226", "p227", "p228"])
    parser.add_argument("--dev-per-spk", type=int, default=5)
    parser.add_argument("--source-fs", type=int, default=48000,
                        help="expected corpus sample rate (wav48 = 48 kHz)")
    parser.add_argument("--target-fs", type=int, default=24000,
                        help="training sample rate (run.sh:11 fs=24000); "
                             "matches configs/a3t_conformer_24k.yaml")
    parser.add_argument("--skip-align", action="store_true")
    args = parser.parse_args()

    from a3t_tpu.data.fileio import write_2column_text
    from a3t_tpu.inference.sedit import clean_words
    from a3t_tpu.text.native_g2p import letter_to_sound

    wav_root = os.path.join(args.corpus, "wav48")
    txt_root = os.path.join(args.corpus, "txt")
    speakers = sorted(os.listdir(wav_root))

    lexicon: dict[str, list[str]] = {}

    def phonemize(transcript: str) -> str:
        phones = []
        for w in clean_words(transcript):
            wu = w.upper()
            if wu not in lexicon:
                lexicon[wu] = letter_to_sound(w)
            phones.extend(lexicon[wu])
        return " ".join(phones)

    splits = {"tr_no_dev": {}, "dev": {}, "eval_unseen": {}}
    spk_map = {k: {} for k in splits}
    for spk in speakers:
        wavs = sorted(glob.glob(os.path.join(wav_root, spk, "*.wav")))
        for i, wav in enumerate(wavs):
            uid = os.path.splitext(os.path.basename(wav))[0]
            txt = os.path.join(txt_root, spk, uid + ".txt")
            if not os.path.exists(txt):
                continue
            transcript = open(txt, encoding="utf-8").read().strip()
            phones = phonemize(transcript)
            if not phones:
                continue
            if spk in args.unseen_speakers:
                split = "eval_unseen"
            elif i < args.dev_per_spk:
                split = "dev"
            else:
                split = "tr_no_dev"
            splits[split][uid] = (wav, phones)
            spk_map[split][uid] = spk

    from a3t_tpu.data.format_wav import format_data_dir

    for name, data in splits.items():
        d = os.path.join(args.out, name)
        write_2column_text(os.path.join(d, "wav.scp"),
                           {u: v[0] for u, v in data.items()})
        write_2column_text(os.path.join(d, "text"),
                           {u: v[1] for u, v in data.items()})
        write_2column_text(os.path.join(d, "utt2spk"), spk_map[name])
        # format stage: 48 kHz source -> mono PCM16 @ target fs, in place
        report = format_data_dir(d, d, args.target_fs,
                                 expected_source_fs=args.source_fs)
        print(f"{name}: {len(data)} utts (formatted -> "
              f"{args.target_fs} Hz, {report['source_fs_counts']})")

    with open(os.path.join(args.out, "lexicon.txt"), "w") as f:
        for w in sorted(lexicon):
            f.write(f"{w} {' '.join(lexicon[w])}\n")

    if not args.skip_align:
        from a3t_tpu.align import align_corpus

        model_path = os.path.join(args.out, "aligner.bin")
        for name in splits:
            print(f"aligning {name}...")
            align_corpus(os.path.join(args.out, name),
                         sample_rate=args.target_fs, n_iterations=10,
                         model_path=model_path if name == "tr_no_dev" else None)


if __name__ == "__main__":
    main()
