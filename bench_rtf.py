"""Speech-editing real-time-factor benchmark (BASELINE metric #2).

Measures end-to-end edit latency — alignment-span masking, teacher-forced
reconstruction of a middle-third span, vocoding, waveform splice — on the
real chip, and reports RTF = wall_time / audio_duration per vocoder:

* Griffin-Lim (no trained vocoder),
* ParallelWaveGAN, randomly initialized at the 24 kHz recipe size
  (identical compute to a trained one, so the RTF is representative), and
* with ``--vocoder DIR``: the actually-trained PWG from
  ``a3t_tpu.bin.train_vocoder`` (16 kHz soak recipe front-end to match
  its mel statistics) — BASELINE metric #2 with real weights.

Reference analogue: espnet2/bin/sedit_inference.py:62-87 (edit + vocode +
splice path whose latency this measures).

Prints one JSON line per configuration and, with ``--out``, writes the
list to a JSON file.  (The driver's headline benchmark is bench.py; this
script is supplementary.)
"""

import argparse
import json
import time

import numpy as np


def _bench_editor(make_editor, cfg, label, results, n_runs=3):
    import jax  # noqa: F401  (device presence)

    from a3t_tpu.inference import UtteranceAlignment
    from a3t_tpu.text import TokenIDConverter

    fs = cfg.fs
    secs = 6.0
    n = int(secs * fs)
    t = np.arange(n) / fs
    wav = (0.3 * np.sin(2 * np.pi * 180 * t)).astype(np.float32)
    n_phones = 40
    bounds = np.linspace(0, secs, n_phones + 1)
    phones = [f"P{i % 20}" for i in range(n_phones)]
    align = UtteranceAlignment(
        phones, bounds[:-1].astype(np.float32), bounds[1:].astype(np.float32),
        {f"{i}_{p.upper()}": [p] for i, p in enumerate(phones)})
    lexicon = {p.upper(): [p] for p in set(phones)}
    conv = TokenIDConverter(["<blank>", "<unk>"] + sorted(set(phones))
                            + ["<sos/eos>"])

    editor = make_editor(conv, lexicon)
    words = " ".join(phones)
    masked = " ".join(phones[:13] + ["[MASK]"] + phones[27:])
    # warmup (compile)
    editor.reconstruct_masked_span(wav, align, words, masked)
    t0 = time.perf_counter()
    for _ in range(n_runs):
        editor.reconstruct_masked_span(wav, align, words, masked)
    dt = (time.perf_counter() - t0) / n_runs
    results.append({
        "metric": f"speech_edit_rtf_{label}",
        "value": round(dt / secs, 4),
        "unit": "RTF (wall/audio)",
        "latency_ms": round(dt * 1e3, 1),
        "fs": fs,
    })


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vocoder", default="",
                    help="trained vocoder dir (a3t_tpu.bin.train_vocoder); "
                         "adds a pwg_trained row at the 16 kHz front-end")
    ap.add_argument("--out", default="", help="also write results to JSON")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from a3t_tpu.dsp import LogMelConfig
    from a3t_tpu.inference import SpeechEditor
    from a3t_tpu.models import A3TMLMModel, A3TModelConfig
    from a3t_tpu.models.pwg import ParallelWaveGANGenerator, PWGConfig

    results = []

    def init_model(cfg):
        model = A3TMLMModel(A3TModelConfig(vocab_size=80))
        hop = cfg.hop_length
        f_bucket = 64
        n = int(6.0 * cfg.fs)
        f_pad = ((1 + n // hop) + f_bucket - 1) // f_bucket * f_bucket
        dummy = dict(
            speech=jnp.zeros((1, f_pad, 80)),
            text=jnp.zeros((1, 48), jnp.int32),
            masked_position=jnp.zeros((1, f_pad), bool),
            speech_mask=jnp.ones((1, f_pad), bool),
            text_mask=jnp.ones((1, 48), bool),
            speech_segment_pos=jnp.zeros((1, f_pad), jnp.int32),
            text_segment_pos=jnp.zeros((1, 48), jnp.int32))
        variables = model.init(jax.random.PRNGKey(0), **dummy, train=False)
        return model, variables

    # -- 24 kHz recipe: Griffin-Lim + randomly-initialized PWG -----------
    cfg24 = LogMelConfig()
    model24, vars24 = init_model(cfg24)

    pwg = ParallelWaveGANGenerator(PWGConfig())
    pwg_vars = pwg.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
        jnp.zeros((1, 16, 80)))
    pwg_fn = jax.jit(lambda mel: pwg.apply(
        pwg_vars, mel, rngs={"noise": jax.random.PRNGKey(3)}))

    for name, vocoder in (("griffin_lim", None), ("pwg", pwg_fn)):
        _bench_editor(
            lambda conv, lex, v=vocoder: SpeechEditor(
                model24, vars24, cfg24, conv, vocoder=v, lexicon=lex,
                text_bucket=48),
            cfg24, name, results)

    # -- trained vocoder at its own (16 kHz) front-end --------------------
    if args.vocoder:
        from a3t_tpu.train.vocoder import load_vocoder

        cfg16 = LogMelConfig(fs=16000, n_fft=1024, hop_length=200,
                             win_length=800)
        model16, vars16 = init_model(cfg16)
        voc = load_vocoder(args.vocoder)
        _bench_editor(
            lambda conv, lex: SpeechEditor(
                model16, vars16, cfg16, conv, vocoder=voc, lexicon=lex,
                text_bucket=48),
            cfg16, "pwg_trained", results)
        # Griffin-Lim at the same front-end for an apples-to-apples row
        _bench_editor(
            lambda conv, lex: SpeechEditor(
                model16, vars16, cfg16, conv, vocoder=None, lexicon=lex,
                text_bucket=48),
            cfg16, "griffin_lim_16k", results)

    for r in results:
        print(json.dumps(r))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
