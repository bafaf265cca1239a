"""Batch decoding for evaluation / listening tests
(aggregate_output/sedit_decode.py:39-98 analogue).

Task file format, one utterance per line:

    uid|new text (phones, [MASK] allowed)

Writes, per utterance: ``<uid>_full.wav`` (vocoded edited mel),
``<uid>_replaced.wav`` (edited span spliced into the original audio) and
``<uid>_gt_span.wav`` (ground-truth span) — the splits the MCD protocol
consumes (sedit_mcd.py's full/replaced/unreplaced outputs).

With ``--fs2-exp`` it additionally decodes the three FastSpeech2
comparison baselines per utterance (``<uid>_baseline{1,2,3}.wav``),
matching the reference's listening-test decode which emits sedit plus the
baseline systems per task file (aggregate_output/sedit_decode.py:39-98):
baseline1 = full-utterance FS2 TTS, baseline2 = TTS of only the edited
text spliced into the original mel, baseline3 = full-text TTS with the
edited-span slice spliced in (espnet2/bin/sedit_inference.py:160-260).
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser(description="A3T batch decode")
    parser.add_argument("--exp-dir", required=True)
    parser.add_argument("--data-dir", required=True)
    parser.add_argument("--task-file", required=True)
    parser.add_argument("--out-dir", required=True)
    parser.add_argument("--checkpoint", default="ave")
    parser.add_argument("--vocoder", default=None)
    parser.add_argument("--uniform-duration", type=float, default=0.1)
    parser.add_argument("--middle-third-mask", action="store_true",
                        help="ignore task text; run the MCD protocol mask")
    parser.add_argument("--fs2-exp", default=None,
                        help="FastSpeech2 exp dir; also decode "
                             "baseline1/2/3 per utterance")
    parser.add_argument("--fs2-checkpoint", default="ave")
    parser.add_argument("--spk-xvector", default=None,
                        help="spk2xvector npz for speaker-conditioned "
                             "baselines (needs data-dir/utt2spk)")
    args = parser.parse_args(argv)

    import numpy as np

    from a3t_tpu.bin.sedit import build_editor
    from a3t_tpu.data.fileio import read_2column_text, write_wav
    from a3t_tpu.eval.mcd import middle_third_mask_str

    ns = argparse.Namespace(
        exp_dir=args.exp_dir, data_dir=args.data_dir,
        checkpoint=args.checkpoint, vocoder=args.vocoder,
        duration_model=None, spk_xvector=None,
        uniform_duration=args.uniform_duration)
    editor, aligner, dataset, texts = build_editor(ns)
    hop = editor.fe.config.hop_length
    fs = editor.fe.config.fs
    os.makedirs(args.out_dir, exist_ok=True)

    baselines, spk2xv, utt2spk = None, None, {}
    if args.fs2_exp:
        from a3t_tpu.inference.baselines import FS2Baselines
        from a3t_tpu.tasks.fs2 import FS2Task

        fs2_model, fs2_vars, _, fs2_conv = FS2Task.build_model_from_dir(
            args.fs2_exp, which=args.fs2_checkpoint)
        baselines = FS2Baselines(fs2_model, fs2_vars, fs2_conv, editor.fe,
                                 vocoder=editor.vocoder)
        if args.spk_xvector:
            spk2xv = dict(np.load(args.spk_xvector))
            utt2spk = read_2column_text(
                os.path.join(args.data_dir, "utt2spk"))

    tasks = []
    with open(args.task_file, encoding="utf-8") as f:
        for line in f:
            if "|" in line:
                uid, new_text = line.rstrip("\n").split("|", 1)
                tasks.append((uid.strip(), new_text.strip()))
            elif line.strip():
                tasks.append((line.strip(), ""))

    for uid, new_text in tasks:
        old_str = texts[uid]
        if args.middle_third_mask or not new_text:
            new_text = middle_third_mask_str(old_str)
        wav = dataset[uid]["audio"]
        res = editor.edit(
            wav, aligner(uid), old_str, new_text,
            mask_reconstruct="[MASK]" in new_text)
        s, e = res.old_span_boundary
        write_wav(os.path.join(args.out_dir, f"{uid}_full.wav"), fs,
                  res.prediction)
        write_wav(os.path.join(args.out_dir, f"{uid}_replaced.wav"), fs,
                  res.origin_replaced)
        write_wav(os.path.join(args.out_dir, f"{uid}_gt_span.wav"), fs,
                  wav[s * hop:e * hop])
        print(uid, "spans", res.old_span_boundary, res.new_span_boundary)

        if baselines is not None:
            from a3t_tpu.inference.baselines import resolve_mask_str

            ali = aligner(uid)
            spembs = (spk2xv[utt2spk[uid]]
                      if spk2xv is not None and uid in utt2spk else None)
            resolved = resolve_mask_str(ali, old_str, new_text,
                                        editor.lexicon, editor.g2p)
            b1 = baselines.baseline1(resolved, prompt_wav=wav, spembs=spembs)
            # baseline2 synthesizes only the edited text: the added-span
            # phones of the resolved string
            from a3t_tpu.inference.sedit import diff_phone_spans

            new_phns, span_rep, span_add = diff_phone_spans(
                ali, old_str, new_text, editor.lexicon, editor.g2p)
            if "[MASK]" in new_text:
                tgt_phns = list(ali.phones)[span_rep[0]:span_rep[1]]
            else:
                tgt_phns = new_phns[span_add[0]:span_add[1]]
            b2 = baselines.baseline2(wav, ali, old_str, new_text,
                                     " ".join(tgt_phns), editor.lexicon,
                                     editor.mel, spembs=spembs)
            b3 = baselines.baseline3(wav, ali, old_str, new_text,
                                     editor.lexicon, editor.mel,
                                     spembs=spembs)
            for name, w in (("baseline1", b1), ("baseline2", b2),
                            ("baseline3", b3)):
                write_wav(os.path.join(args.out_dir, f"{uid}_{name}.wav"),
                          fs, np.asarray(w))


if __name__ == "__main__":
    main()
