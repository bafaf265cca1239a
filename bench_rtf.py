"""Speech-editing real-time-factor benchmark (BASELINE metric #2).

Measures end-to-end edit latency — alignment-span masking, teacher-forced
reconstruction of a middle-third span, vocoding, waveform splice — on the
real chip, and reports RTF = wall_time / audio_duration for both vocoders:

* Griffin-Lim (no trained vocoder), and
* ParallelWaveGAN (randomly initialized — identical compute to a trained
  one, so the RTF is representative).

Prints one JSON line per configuration.  (The driver's headline benchmark
is bench.py; this script is supplementary.)
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from a3t_tpu.dsp import LogMelConfig
    from a3t_tpu.inference import SpeechEditor, UtteranceAlignment
    from a3t_tpu.models import A3TMLMModel, A3TModelConfig
    from a3t_tpu.models.pwg import ParallelWaveGANGenerator, PWGConfig

    rng = np.random.default_rng(0)
    cfg = LogMelConfig()  # 24 kHz recipe
    fs, hop = cfg.fs, cfg.hop_length

    model = A3TMLMModel(A3TModelConfig(vocab_size=80))

    # one ~6 s utterance with uniform phone alignments
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

    from a3t_tpu.text import TokenIDConverter

    conv = TokenIDConverter(["<blank>", "<unk>"] + sorted(set(phones))
                            + ["<sos/eos>"])

    f_bucket = 64
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

    pwg = ParallelWaveGANGenerator(PWGConfig())
    pwg_vars = pwg.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
        jnp.zeros((1, 16, 80)))
    pwg_fn = jax.jit(lambda mel: pwg.apply(
        pwg_vars, mel, rngs={"noise": jax.random.PRNGKey(3)}))

    results = []
    for name, vocoder in (("griffin_lim", None), ("pwg", pwg_fn)):
        editor = SpeechEditor(model, variables, cfg, conv, vocoder=vocoder,
                              lexicon=lexicon, text_bucket=48)
        words = " ".join(phones)
        masked = " ".join(phones[:13] + ["[MASK]"] + phones[27:])
        # warmup (compile)
        editor.reconstruct_masked_span(wav, align, words, masked)
        t0 = time.perf_counter()
        n_runs = 3
        for _ in range(n_runs):
            editor.reconstruct_masked_span(wav, align, words, masked)
        dt = (time.perf_counter() - t0) / n_runs
        results.append({
            "metric": f"speech_edit_rtf_{name}",
            "value": round(dt / secs, 4),
            "unit": "RTF (wall/audio)",
            "latency_ms": round(dt * 1e3, 1),
        })
    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
