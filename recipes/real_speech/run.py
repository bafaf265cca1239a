"""Real-speech fine-tune + edit round-trip (VERDICT r3 item 2).

The environment's only real recorded English is the mini-AN4 bundle the
reference ships for CI (egs2/mini_an4/asr1/downloads.tar.gz, 8 utts of
16 kHz microphone speech) plus the 6.5 s ctc_align_test.wav fixture.
This recipe takes the 12k-corpus soak model (trained on synthetic
speech), fine-tunes it on those 9 real utterances via the vocab-growing
warm start, and runs the full editing stack on real audio: masked
reconstruction (middle-third MCD protocol, sedit_mcd.py analogue),
text-replacement editing, and prompt TTS
(espnet2/bin/sedit_inference.py:728-783 round-trip).

    python recipes/real_speech/run.py --workdir W --stage 1 --stop-stage 3 \
        --init-params artifacts/soak12k_params

Stages: 1 corpus prep (CPU: sph decode, native flat-start alignment),
2 fine-tune (TPU), 3 eval (reconstruction MCD + edit/prompt wavs,
writes <workdir>/REAL_SPEECH_DEMO.json).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "an4_aligner"))

FS = 16000


def stage1_prep(args, data_dir, workdir):
    """AN4 + fixture -> A3T corpus dir with native forced alignments."""
    from run import load_an4  # recipes/an4_aligner

    from a3t_tpu.align.native import NativeAligner
    from a3t_tpu.data.fileio import write_num_sequence_text, write_wav

    print("== stage 1: real-speech corpus prep ==", flush=True)
    utts, lexicon = load_an4(os.path.join(workdir, "raw"))
    os.makedirs(os.path.join(data_dir, "wav"), exist_ok=True)

    # words -> phones with an optional short pause between words (the
    # HVite optional-silence topology the native aligner reproduces)
    corpus = []
    for uid, wav, words in utts:
        phones, optional = [], []
        for i, w in enumerate(words):
            pron = lexicon[w]
            phones.extend(pron)
            optional.extend([False] * len(pron))
            if i != len(words) - 1:
                phones.append("sp")
                optional.append(True)
        corpus.append((uid, wav.astype(np.float32), phones, optional))

    phone_set = sorted({p for _, _, ph, _ in corpus for p in ph})
    aligner = NativeAligner(phone_set, FS)
    t0 = time.time()
    lls = aligner.train([(w, p) for _, w, p, _ in corpus],
                        n_iterations=8, n_mixtures=args.align_mixtures)
    print(f"   EM on {len(corpus)} real utts: ll/frame {lls[0]:.2f} -> "
          f"{lls[-1]:.2f} ({time.time() - t0:.0f}s)", flush=True)
    aligner.save(os.path.join(workdir, "aligner_real.bin"))

    scp, texts, u2s, starts, ends = {}, {}, {}, {}, {}
    for uid, wav, phones, optional in corpus:
        s, e = aligner.align(wav, phones, optional=optional)
        path = os.path.join(data_dir, "wav", uid + ".wav")
        write_wav(path, FS, wav)
        scp[uid] = path
        texts[uid] = " ".join(phones)
        u2s[uid] = uid.split("-")[1] if "-" in uid else uid
        starts[uid], ends[uid] = s, e
    with open(os.path.join(data_dir, "wav.scp"), "w") as f:
        for u, p in scp.items():
            f.write(f"{u} {p}\n")
    with open(os.path.join(data_dir, "text"), "w") as f:
        for u, t in texts.items():
            f.write(f"{u} {t}\n")
    with open(os.path.join(data_dir, "utt2spk"), "w") as f:
        for u, s_ in u2s.items():
            f.write(f"{u} {s_}\n")
    write_num_sequence_text(os.path.join(data_dir, "mfa_start"), starts)
    write_num_sequence_text(os.path.join(data_dir, "mfa_end"), ends)

    # token list: the pretraining stash's tokens extended in-order with
    # the new real-speech phones (grow_vocab warm-start contract)
    base = []
    tok_src = os.path.join(args.init_params, "tokens.txt")
    if os.path.isdir(args.init_params) and os.path.exists(tok_src):
        base = [line.rstrip("\n") for line in open(tok_src)]
    elif args.base_tokens and os.path.exists(args.base_tokens):
        base = [line.rstrip("\n") for line in open(args.base_tokens)]
    have = set(base)
    merged = base + [p for p in phone_set if p not in have]
    if not base:
        from a3t_tpu.text import build_token_list

        merged = build_token_list(texts.values())
    with open(os.path.join(data_dir, "tokens.txt"), "w") as f:
        f.write("\n".join(merged) + "\n")
    print(f"   {len(corpus)} utts, {len(phone_set)} phones, "
          f"{len(merged)} tokens ({len(base)} inherited)", flush=True)


def stage2_finetune(args, data_dir, workdir, exp):
    import yaml

    print("== stage 2: fine-tune on real speech ==", flush=True)
    warm = (os.path.isdir(args.init_params)
            and os.path.exists(os.path.join(args.init_params, "_METADATA")))
    conf = {
        "train_data_dir": data_dir,
        "valid_data_dir": data_dir,
        "token_list": os.path.join(data_dir, "tokens.txt"),
        "exp_dir": exp,
        "frontend": {"fs": FS, "n_fft": 1024, "hop_length": 200,
                     "win_length": 800, "n_mels": 80, "fmin": 80.0,
                     "fmax": 7600.0},
        "model": {
            "encoder": {"cnn_module_kernel": 7, "compute_dtype": "bfloat16"},
            "decoder": {"cnn_module_kernel": 31,
                        "compute_dtype": "bfloat16"},
            "mlm_prob": 0.8, "mean_phn_span": 8,
        },
        # short warmup + low peak for fine-tuning 9 utts
        "optim": {"lr": args.lr, "model_size": 384,
                  "warmup_steps": 200, "grad_clip": 1.0},
        "batcher": {"batch_bins": 80 * 576 * 8,
                    "bucket_frames": [192, 320, 576],
                    "mlm_prob": 0.8, "mean_phn_span": 8.0,
                    "mlm_prob_factor": 0.8, "min_frames": 1},
        "trainer": {"max_epoch": args.epochs,
                    "num_iters_per_epoch": args.iters_per_epoch,
                    "keep_nbest_models": 2, "log_interval": 50,
                    "resume": True,
                    "best_model_criterion": ["train", "loss", "min"],
                    "init_params_dir": args.init_params if warm else None,
                    "init_params_grow_vocab": True},
    }
    conf_path = os.path.join(workdir, "finetune.yaml")
    with open(conf_path, "w") as f:
        yaml.safe_dump(conf, f)

    from a3t_tpu.bin.train import main as train_main

    train_main(["--config", conf_path])

    # FS2 duration model on the same real corpus: the reference's edit
    # and prompt paths predict new-span durations with FastSpeech2
    # (sedit_inference.py:398-424); a model trained on the synthetic soak
    # corpus cannot serve here (disjoint phone inventory), so train a
    # small one on the real utterances' native alignments.
    from a3t_tpu.dsp import LogMelConfig
    from a3t_tpu.models.fastspeech2 import (
        FastSpeech2Config, transformer_stack_config)
    from a3t_tpu.tasks.fs2 import FS2BatcherConfig, FS2Task, FS2TaskConfig
    from a3t_tpu.train import OptimConfig, TrainerConfig

    print("== stage 2b: FS2 duration model on real speech ==", flush=True)
    stack = transformer_stack_config(adim=128, aheads=2, layers=2,
                                     units=512, dropout=0.2)
    FS2Task.run(FS2TaskConfig(
        train_data_dir=data_dir,
        token_list=os.path.join(data_dir, "tokens.txt"),
        exp_dir=os.path.join(workdir, "exp_fs2"),
        frontend=LogMelConfig(fs=FS, n_fft=1024, hop_length=200,
                              win_length=800, n_mels=80, fmin=80.0,
                              fmax=7600.0),
        model=FastSpeech2Config(adim=128, encoder=stack, decoder=stack,
                                postnet_layers=0, max_feat_len=576),
        batcher=FS2BatcherConfig(batch_size=8, max_feat_len=576),
        optim=OptimConfig(model_size=128, warmup_steps=100),
        trainer=TrainerConfig(
            max_epoch=args.fs2_epochs, num_iters_per_epoch=20,
            keep_nbest_models=2, log_interval=50,
            best_model_criterion=("train", "loss", "min"), resume=True),
    ))


def stage3_eval(args, data_dir, workdir, exp):
    from a3t_tpu.bin.mcd_gate import run_gate
    from a3t_tpu.data.dataset import A3TDataset
    from a3t_tpu.data.fileio import read_2column_text, write_wav
    from a3t_tpu.eval.mcd import MCDConfig
    from a3t_tpu.inference import FileAlignmentSource, SpeechEditor
    from a3t_tpu.tasks import MLMTask

    print("== stage 3: real-speech editing eval ==", flush=True)
    model, variables, cfg, conv = MLMTask.build_model_from_dir(
        exp, which=args.eval_checkpoint)
    vocoder = None
    if args.vocoder:
        from a3t_tpu.train.vocoder import load_vocoder

        vocoder = load_vocoder(args.vocoder)
    texts = read_2column_text(os.path.join(data_dir, "text"))
    lexicon = {p.upper(): [p] for t in texts.values() for p in t.split()}
    # no duration_fn -> run_gate uses pure masked reconstruction (the MCD
    # protocol); the edit/prompt editor gets the trained FS2 duration
    # path (sedit_inference.py:398-424), uniform durations only as the
    # fallback when stage 2b was skipped
    editor = SpeechEditor(model, variables, cfg.frontend, conv,
                          lexicon=lexicon, vocoder=vocoder)
    fs2_exp = os.path.join(workdir, "exp_fs2")
    if os.path.isdir(os.path.join(fs2_exp, "checkpoints")):
        from a3t_tpu.inference.durations import load_duration_fn

        duration_fn = load_duration_fn(fs2_exp)
        duration_source = "fs2"
    else:
        duration_fn = lambda ph, w: [0.1] * len(ph)  # noqa: E731
        duration_source = "uniform-fallback"
    edit_editor = SpeechEditor(model, variables, cfg.frontend, conv,
                               lexicon=lexicon, vocoder=vocoder,
                               duration_fn=duration_fn)
    ds = A3TDataset(data_dir, conv)
    aligner = FileAlignmentSource(data_dir)
    out_dir = os.path.join(workdir, "demo_out")
    os.makedirs(out_dir, exist_ok=True)

    # 1. masked-reconstruction MCD on every real utterance (the
    # sedit_mcd.py middle-third protocol, on real recorded speech)
    result = run_gate(editor, texts, ds, aligner, ds.uids, out_dir,
                      mcd_config=MCDConfig(
                          shiftms=1000.0 * cfg.frontend.hop_length
                          / cfg.frontend.fs))
    print(f"   reconstruction MCD over {result['n']} real utts: "
          f"{result['mean_mcd']:.2f} dB "
          f"(vocoder ceiling {result['vocoder_ceiling_mcd']:.2f})",
          flush=True)

    # 2. text-replacement edit on the longest utterance
    uid = max(ds.uids, key=lambda u: len(texts[u].split()))
    wav, words = ds[uid]["audio"], texts[uid].split()
    real = [i for i, w in enumerate(words) if w != "sp"]
    mid = real[len(real) // 2]
    repl = ["AO", "S", "OW"] if words[mid] != "AO" else ["IY", "T", "AA"]
    new_text = " ".join(words[:mid] + repl + words[mid + 1:])
    res = edit_editor.edit(wav, aligner(uid), texts[uid], new_text)
    write_wav(os.path.join(out_dir, f"{uid}_edit.wav"), FS,
              res.origin_replaced)

    # 3. prompt TTS: first third of the utterance prompts a continuation
    prompt_words = words[: max(3, len(words) // 3)]
    cont = ["M", "AO", "S", "EH", "T"]
    full = " ".join(prompt_words + cont)
    out = edit_editor.prompt_tts(wav, aligner(uid),
                                 " ".join(prompt_words), full)
    write_wav(os.path.join(out_dir, f"{uid}_prompt.wav"), FS, out["full"])

    report = {
        "data": "mini-AN4 (8 real utts) + ctc_align_test fixture",
        "init_params": args.init_params,
        "checkpoint": args.eval_checkpoint,
        "vocoder": args.vocoder or "griffin-lim",
        "duration_source": duration_source,
        "reconstruction": result,
        "edit": {"uid": uid, "old": texts[uid], "new": new_text,
                 "old_span_frames": [int(x) for x in res.old_span_boundary],
                 "new_span_frames": [int(x) for x in res.new_span_boundary]},
        "prompt_tts_sec": round(len(out["full"]) / FS, 2),
    }
    with open(os.path.join(workdir, "REAL_SPEECH_DEMO.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: v for k, v in report.items()
                      if k != "reconstruction"}, indent=1), flush=True)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--workdir", default="/tmp/a3t_real")
    ap.add_argument("--stage", type=int, default=1)
    ap.add_argument("--stop-stage", type=int, default=3)
    ap.add_argument("--init-params", default="artifacts/soak12k_params")
    ap.add_argument("--base-tokens", default="",
                    help="fallback token list when the stash has none")
    ap.add_argument("--align-mixtures", type=int, default=2)
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--fs2-epochs", type=int, default=25)
    ap.add_argument("--iters-per-epoch", type=int, default=20)
    ap.add_argument("--lr", type=float, default=0.2)
    ap.add_argument("--vocoder", default="artifacts/vocoder")
    ap.add_argument("--eval-checkpoint", default="ave")
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    data_dir = os.path.join(args.workdir, "data")
    exp = os.path.join(args.workdir, "exp")

    def on(n):
        return args.stage <= n <= args.stop_stage

    if on(1):
        stage1_prep(args, data_dir, args.workdir)
    if on(2):
        stage2_finetune(args, data_dir, args.workdir, exp)
    if on(3):
        stage3_eval(args, data_dir, args.workdir, exp)


if __name__ == "__main__":
    main()
