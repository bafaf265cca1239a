"""One steps-vs-MCD curve point, evaluated off-chip while training runs.

Snapshots ``exp/checkpoints/epoch_N`` out of the live training directory
(epoch dirs are pruned to the newest ``keep_nbest``), forces the CPU
backend so the single-client TPU tunnel stays dedicated to the trainer,
and runs the stage-5 MCD gate protocol (replaced-span MCD, teacher-forced
— reference protocol sedit_mcd.py:43-135) on both eval splits.

    python recipes/soak/curve_eval.py --workdir /root/soak --epoch 110 \
        --vocoder /root/soak/vocoder

Writes ``<workdir>/curve_e<N>.json`` (consumed by assemble_mcd_report.py).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/root/soak")
    ap.add_argument("--exp-name", default="exp",
                    help="experiment dir name under the workdir")
    ap.add_argument("--epoch", type=int, required=True)
    ap.add_argument("--ckpt-name", default="",
                    help="evaluate a named checkpoint (e.g. ave_5best) "
                         "already present in the snapshot dir instead of "
                         "an epoch_N dir; --epoch then only tags outputs")
    ap.add_argument("--vocoder", default="",
                    help="trained vocoder dir; empty = Griffin-Lim")
    ap.add_argument("--eval-utts", type=int, default=8)
    ap.add_argument("--device", default="cpu",
                    help="jax platform ('cpu' to coexist with a live "
                         "TPU training run; '' = default backend)")
    # length-composition control (docs/QUALITY.md): restrict the eval to
    # utterances whose phone count falls in [min,max] — the reference's
    # VCTK protocol only ever measures the long regime
    ap.add_argument("--min-phones", type=int, default=0)
    ap.add_argument("--max-phones", type=int, default=0)
    ap.add_argument("--out", default="",
                    help="override the output json path")
    ap.add_argument("--spemb-source", default="context",
                    choices=("context", "speaker", "zero", "shuffle"),
                    help="x-vector fed to a spemb model at eval: 'context' "
                         "= leak-free context-only extraction from the "
                         "edited audio; 'speaker' = the speaker's averaged "
                         "training x-vector (the reference's spk2xvector "
                         "lookup, sedit_inference.py:203-210) — unseen "
                         "speakers have no training average and fall back "
                         "to context extraction; 'zero'/'shuffle' are "
                         "ablations (no embedding / a rotated wrong-speaker "
                         "assignment) that measure whether the conditioning "
                         "pathway is causally used")
    args = ap.parse_args()

    import jax

    if args.device:
        jax.config.update("jax_platforms", args.device)

    from a3t_tpu.bin.mcd_gate import run_gate
    from a3t_tpu.data.dataset import A3TDataset
    from a3t_tpu.data.fileio import read_2column_text
    from a3t_tpu.eval.mcd import MCDConfig
    from a3t_tpu.inference import FileAlignmentSource, SpeechEditor
    from a3t_tpu.tasks import MLMTask

    w = args.workdir
    exp = os.path.join(w, args.exp_name)
    snap = os.path.join(w, f"curve_ckpts_{args.exp_name}"
                        if args.exp_name != "exp" else "curve_ckpts")
    os.makedirs(os.path.join(snap, "checkpoints"), exist_ok=True)
    if args.ckpt_name:
        dst = os.path.join(snap, "checkpoints", args.ckpt_name)
        if not os.path.exists(dst):
            shutil.copytree(os.path.join(exp, "checkpoints",
                                         args.ckpt_name), dst)
    else:
        dst = os.path.join(snap, "checkpoints", f"epoch_{args.epoch}")
        if not os.path.exists(dst):
            src = os.path.join(exp, "checkpoints", f"epoch_{args.epoch}")
            shutil.copytree(src, dst)
    for name in ("config.yaml", "tokens.txt"):
        shutil.copy(os.path.join(exp, name), os.path.join(snap, name))

    model, variables, cfg, conv = MLMTask.build_model_from_dir(
        snap, which="ave" if args.ckpt_name.startswith("ave")
        else str(args.epoch))
    mcd_cfg = MCDConfig(shiftms=1000.0 * cfg.frontend.hop_length
                        / cfg.frontend.fs)

    vocoder = None
    if args.vocoder:
        from a3t_tpu.train.vocoder import load_vocoder

        vocoder = load_vocoder(args.vocoder)

    spemb_fn = None
    if getattr(cfg.model, "spemb_dim", 0) > 0:
        from a3t_tpu.dsp import LogMelFrontend
        from a3t_tpu.models.xvector import make_spemb_extractor

        spemb_fn = make_spemb_extractor(
            os.path.join(w, "exp_xvector"), LogMelFrontend(cfg.frontend))

    spk2xv = None
    if spemb_fn is not None and args.spemb_source in ("speaker", "shuffle"):
        xv_path = os.path.join(w, "exp_xvector", "spk2xvector.npz")
        spk2xv = {k: np.asarray(v, np.float32)
                  for k, v in np.load(xv_path).items()}

    report = {"checkpoint": args.ckpt_name or f"epoch_{args.epoch}",
              "vocoder": args.vocoder or "griffin-lim"}
    if spemb_fn is not None:
        report["spemb_source"] = args.spemb_source
    for split in ("eval_seen", "eval_unseen"):
        split_dir = os.path.join(w, "data", split)
        texts = read_2column_text(os.path.join(split_dir, "text"))
        lexicon = {p.upper(): [p] for t in texts.values()
                   for p in t.split()}
        editor = SpeechEditor(model, variables, cfg.frontend, conv,
                              lexicon=lexicon, vocoder=vocoder,
                              spemb_fn=spemb_fn)
        ds = A3TDataset(split_dir, conv)
        aligner = FileAlignmentSource(split_dir)
        uids = ds.uids
        if args.min_phones or args.max_phones:
            lo = args.min_phones or 0
            hi = args.max_phones or 10**9
            uids = [u for u in uids
                    if lo <= len(texts[u].split()) <= hi]
        if args.eval_utts:
            uids = uids[: args.eval_utts]
        spembs = None
        if spemb_fn is not None and args.spemb_source == "zero":
            dim = int(cfg.model.spemb_dim)
            spembs = {u: np.zeros(dim, np.float32) for u in uids}
        if spk2xv is not None:
            utt2spk = read_2column_text(os.path.join(split_dir, "utt2spk"))
            if split == "eval_seen":
                spembs = {u: spk2xv[utt2spk[u]] for u in uids
                          if utt2spk.get(u) in spk2xv}
            else:
                # the unseen split's voices are brand new (speaker_seed=99,
                # run.py stage1) but its utt2spk REUSES the training label
                # names, so the npz lookup would fetch the wrong voice.
                # Build leave-one-out within-split speaker averages instead
                # — the reference's spk2xvector likewise averages the eval
                # speakers' own utterances (generate_spk2xv over the dump).
                from a3t_tpu.models.xvector import (build_utt2xvector,
                                                    load_xvector)
                from a3t_tpu.dsp import LogMelFrontend

                xvm, xvv, mvn = load_xvector(os.path.join(w, "exp_xvector"))
                u2x = build_utt2xvector(
                    xvm, xvv, LogMelFrontend(cfg.frontend), ds, mel_mvn=mvn)
                spembs = {}
                for u in uids:
                    others = [o for o in ds.uids
                              if o != u and utt2spk.get(o) == utt2spk.get(u)]
                    if others:
                        spembs[u] = np.mean([u2x[o] for o in others], axis=0)
            if args.spemb_source == "shuffle":
                # wrong-speaker ablation: rotate the embeddings among the
                # eval uids so every utterance is conditioned on a
                # DIFFERENT speaker's average
                us = [u for u in uids if u in spembs]
                vals = [spembs[u] for u in us]
                n = len(us)
                for i, u in enumerate(us):
                    j = (i + 1) % n
                    while (utt2spk.get(us[j]) == utt2spk.get(u)
                           and j != i):
                        j = (j + 1) % n
                    spembs[u] = vals[j]
        out_dir = os.path.join(w, "mcd_out", args.exp_name,
                               f"curve_e{args.epoch}", split)
        result = run_gate(editor, texts, ds, aligner, uids, out_dir,
                          mcd_config=mcd_cfg, spembs=spembs)
        key = split.replace("eval_", "")
        report[key] = result
        print(f"   MCD [{key}] e{args.epoch} over {result['n']} utts: "
              f"{result['mean_mcd']:.2f} dB (vocoder ceiling "
              f"{result['vocoder_ceiling_mcd']:.2f} dB)", flush=True)

    tag = "" if args.exp_name == "exp" else f"{args.exp_name}_"
    out = args.out or os.path.join(w, f"{tag}curve_e{args.epoch}.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
