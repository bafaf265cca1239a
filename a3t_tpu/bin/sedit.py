"""Speech-editing CLI (the sedit_inference entry point as a command).

    # regenerate a span so the utterance says the new text
    python -m a3t_tpu.bin.sedit edit --exp-dir exp/a3t --data-dir dump/dev \
        --uid utt001 --new-text "HH AH0 L OW1 W ER1 L D" --out edited.wav

    # prompt TTS: continue the utterance with new content
    python -m a3t_tpu.bin.sedit prompt --exp-dir exp/a3t --data-dir dump/dev \
        --uid utt001 --new-text "<prompt text> <continuation>" --out out.wav
"""

from __future__ import annotations

import argparse


def build_editor(args):
    import numpy as np

    from a3t_tpu.data.dataset import A3TDataset
    from a3t_tpu.data.fileio import read_2column_text
    from a3t_tpu.inference import FileAlignmentSource, SpeechEditor
    from a3t_tpu.tasks import MLMTask
    from a3t_tpu.text.native_g2p import letter_to_sound

    model, variables, cfg, conv = MLMTask.build_model_from_dir(
        args.exp_dir, which=args.checkpoint)

    vocoder = None
    if args.vocoder:
        import jax

        from a3t_tpu.models.pwg import (
            ParallelWaveGANGenerator, PWGConfig, load_pwg_checkpoint)

        pwg_cfg = PWGConfig()
        pwg_vars = load_pwg_checkpoint(args.vocoder, pwg_cfg)
        gen = ParallelWaveGANGenerator(pwg_cfg)
        vocoder = jax.jit(lambda mel: gen.apply(
            pwg_vars, mel, rngs={"noise": jax.random.PRNGKey(0)}))

    texts = read_2column_text(f"{args.data_dir}/text")
    # phone-level lexicon: every phone token maps to itself; real words go
    # through the native g2p
    phones = {p for t in texts.values() for p in t.split()}
    lexicon = {p.upper(): [p] for p in phones}

    duration_fn = None
    if args.duration_model:
        from a3t_tpu.inference.durations import load_duration_fn

        spembs = None
        if args.spk_xvector:
            spembs = np.load(args.spk_xvector)
        duration_fn = load_duration_fn(args.duration_model, spembs=spembs)
    elif args.uniform_duration > 0:
        duration_fn = lambda ph, wav: [args.uniform_duration] * len(ph)

    editor = SpeechEditor(
        model, variables, cfg.frontend, conv, vocoder=vocoder,
        duration_fn=duration_fn, lexicon=lexicon, g2p=letter_to_sound)
    dataset = A3TDataset(args.data_dir, conv)
    return editor, FileAlignmentSource(args.data_dir), dataset, texts


def main(argv=None):
    parser = argparse.ArgumentParser(description="A3T speech editing")
    parser.add_argument("mode", choices=["edit", "prompt", "reconstruct"])
    parser.add_argument("--exp-dir", required=True)
    parser.add_argument("--data-dir", required=True,
                        help="dir with wav.scp/text/mfa_start/mfa_end")
    parser.add_argument("--uid", required=True)
    parser.add_argument("--new-text", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--checkpoint", default="ave")
    parser.add_argument("--vocoder", default=None,
                        help="parallel_wavegan checkpoint (griffin-lim if unset)")
    parser.add_argument(
        "--duration-model", "--duration-exp-dir", dest="duration_model",
        default=None,
        help="FastSpeech2 duration predictor: an a3t_tpu FS2 exp dir or an "
             "espnet2 .pth checkpoint (with config.yaml alongside)")
    parser.add_argument("--spk-xvector", default=None,
                        help=".npy x-vector for the duration model's speaker "
                             "conditioning (spk2xvector entry)")
    parser.add_argument("--uniform-duration", type=float, default=0.1,
                        help="fallback per-phone duration in seconds "
                             "(ignored when --duration-model is given)")
    parser.add_argument(
        "--dynamic-eval", default=None, metavar="LR,STEPS",
        help="test-time fine-tuning on the prompt utterance before "
             "decoding (sedit_inference.py:748-776), e.g. 5e-5,3")
    args = parser.parse_args(argv)

    from a3t_tpu.data.fileio import write_wav

    editor, aligner, dataset, texts = build_editor(args)
    item = dataset[args.uid]
    wav = item["audio"]
    align = aligner(args.uid)
    old_str = texts[args.uid]

    if args.dynamic_eval:
        from a3t_tpu.inference.baselines import dynamic_evaluation

        lr, steps = args.dynamic_eval.split(",")
        editor = dynamic_evaluation(editor, wav, align, old_str,
                                    lr=float(lr), steps=int(steps))

    if args.mode == "prompt":
        out = editor.prompt_tts(wav, align, old_str, args.new_text)
        write_wav(args.out, editor.fe.config.fs, out["full"])
    elif args.mode == "reconstruct":
        res = editor.reconstruct_masked_span(wav, align, old_str,
                                             args.new_text)
        write_wav(args.out, editor.fe.config.fs, res.origin_replaced)
    else:
        res = editor.edit(wav, align, old_str, args.new_text)
        write_wav(args.out, editor.fe.config.fs, res.origin_replaced)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
