"""Batch decoding for evaluation / listening tests
(aggregate_output/sedit_decode.py:39-98 analogue).

Task file format, one utterance per line:

    uid|new text (phones, [MASK] allowed)

Writes, per utterance: ``<uid>_full.wav`` (vocoded edited mel),
``<uid>_replaced.wav`` (edited span spliced into the original audio) and
``<uid>_gt_span.wav`` (ground-truth span) — the splits the MCD protocol
consumes (sedit_mcd.py's full/replaced/unreplaced outputs).
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
    args = parser.parse_args(argv)

    from a3t_tpu.bin.sedit import build_editor
    from a3t_tpu.data.fileio import write_wav
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


if __name__ == "__main__":
    main()
