"""FastSpeech2 baseline decoders + dynamic evaluation.

Ports the comparison baselines of the reference
(espnet2/bin/sedit_inference.py:160-260) and test-time fine-tuning
(dynamic_evaluation, :748-776):

* baseline1 — plain FS2 TTS of the new text (GST + x-vector conditioned);
* baseline2 — FS2 TTS of only the *target* (edited-span) text, spliced
  into the original mel at the edited span;
* baseline3 — FS2 TTS of the full new text, with the edited-span slice
  (located via predicted durations) spliced into the original mel;
* dynamic_evaluation — a few SGD steps of per-word mask-reconstruction on
  the prompt utterance before decoding (speaker adaptation).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from a3t_tpu.inference.sedit import (
    MASK_TOKEN,
    SpeechEditor,
    UtteranceAlignment,
    diff_phone_spans,
)


def resolve_mask_str(alignment: UtteranceAlignment, old_str: str,
                     new_str: str, lexicon, g2p=None) -> str:
    """Replace ``[MASK]`` in ``new_str`` with the original phones it spans.

    The MCD reconstruction protocol feeds ``tokens[:n//3] [MASK]
    tokens[-n//3:]`` (eval/mcd.py middle_third_mask_str); the FS2 baselines
    need real tokens to synthesize, and the reference decodes them on the
    ground-truth text (aggregate_output/sedit_decode.py:39-98)."""
    if MASK_TOKEN not in new_str:
        return new_str
    _, span_replaced, _ = diff_phone_spans(
        alignment, old_str, new_str, lexicon, g2p)
    old_phns = list(alignment.phones)
    filled = " ".join(old_phns[span_replaced[0]:span_replaced[1]])
    return new_str.replace(MASK_TOKEN, filled)


class FS2Baselines:
    """Bundle of (FastSpeech2 model, variables, tokens, vocoder)."""

    def __init__(self, fs2_model, fs2_variables, token_converter, frontend,
                 vocoder=None):
        self.model = fs2_model
        self.variables = fs2_variables
        self.tokens = token_converter
        self.fe = frontend
        self.vocoder = vocoder

    def _synthesize(self, text_str: str, prompt_wav=None, spembs=None):
        ids = np.asarray(self.tokens.text2ids(text_str), np.int32)
        # append eos (fastspeech2.py:539-541: eos = idim - 1)
        ids = np.concatenate([ids, [self.model.config.idim - 1]])
        text = jnp.asarray(ids[None])
        mask = jnp.ones_like(text, bool)
        speech = None
        if prompt_wav is not None and self.model.config.use_gst:
            feats, _ = self.fe(jnp.asarray(prompt_wav[None]))
            speech = feats
        sp = jnp.asarray(spembs[None]) if spembs is not None else None
        out = self.model.apply(self.variables, text, mask, speech=speech,
                               spembs=sp, train=False)
        n_valid = int(np.asarray(out["durations"]).sum())
        durations = np.asarray(out["durations"])[0]
        mel = np.asarray(out["after"])[0, :n_valid]
        return mel, durations

    def _vocode(self, mel):
        if self.vocoder is None:
            from a3t_tpu.dsp.griffin_lim import logmel_to_wav

            return np.asarray(logmel_to_wav(
                jnp.asarray(mel[None]), self.fe.config))[0]
        return np.asarray(self.vocoder(jnp.asarray(mel[None])))[0]

    def baseline1(self, new_str: str, prompt_wav=None, spembs=None):
        """Full-utterance FS2 TTS of the new text (ref :160-185)."""
        mel, _ = self._synthesize(new_str, prompt_wav, spembs)
        return self._vocode(mel)

    def baseline2(self, wav, alignment: UtteranceAlignment, full_str: str,
                  new_str: str, target_str: str, lexicon, mel_fn,
                  spembs=None):
        """TTS only the edited text, splice into the original mel
        (ref :187-222)."""
        c = self.fe.config
        _, span_replaced, _ = diff_phone_spans(
            alignment, full_str, new_str, lexicon)
        old_span = [
            int(alignment.start_sec[span_replaced[0]] * c.fs / c.hop_length),
            int(alignment.start_sec[min(span_replaced[1],
                                        len(alignment.start_sec) - 1)]
                * c.fs / c.hop_length),
        ]
        input_feat = mel_fn(wav)
        mel_t, durations = self._synthesize(target_str, wav, spembs)
        eos_dur = int(durations[-1])
        mel_t = mel_t[: len(mel_t) - eos_dur] if eos_dur else mel_t
        out = np.concatenate(
            [input_feat[: old_span[0]], mel_t, input_feat[old_span[1]:]], 0)
        return self._vocode(out)

    def baseline3(self, wav, alignment: UtteranceAlignment, full_str: str,
                  new_str: str, lexicon, mel_fn, spembs=None):
        """TTS the whole new text, splice only the edited-span slice
        (located via predicted durations; ref :224-260)."""
        c = self.fe.config
        new_phns, span_replaced, span_added = diff_phone_spans(
            alignment, full_str, new_str, lexicon)
        if MASK_TOKEN in new_str:
            # mask reconstruction: synthesize the original text; the edited
            # span is the original span (mirrors the sedit mask-mode
            # timeline, inference/sedit.py::_new_timeline)
            new_phns = list(alignment.phones)
            span_added = list(span_replaced)
            new_str = " ".join(new_phns)
        old_span = [
            int(alignment.start_sec[span_replaced[0]] * c.fs / c.hop_length),
            int(alignment.start_sec[min(span_replaced[1],
                                        len(alignment.start_sec) - 1)]
                * c.fs / c.hop_length),
        ]
        input_feat = mel_fn(wav)
        mel_full, durations = self._synthesize(new_str, wav, spembs)
        d = durations
        s = int(d[: span_added[0]].sum())
        e = int(d[: span_added[1]].sum())
        target = mel_full[s:e]
        out = np.concatenate(
            [input_feat[: old_span[0]], target, input_feat[old_span[1]:]], 0)
        return self._vocode(out)


def dynamic_evaluation(
    editor: SpeechEditor,
    wav: np.ndarray,
    alignment: UtteranceAlignment,
    text: str,
    lr: float = 5e-5,
    steps: int = 1,
) -> SpeechEditor:
    """Test-time fine-tuning (ref :748-776): build per-word [MASK]
    reconstruction examples from the prompt utterance, take ``steps`` SGD
    steps, return an editor with adapted parameters."""
    from a3t_tpu.models.mlm import mlm_loss

    words = text.split()
    examples = []
    for i in range(max(len(words) - 1, 1)):
        masked = " ".join(words[:i] + ["[MASK]"] + words[i + 1:])
        new_wav, phones, s_sec, e_sec, _, boundary = editor._new_timeline(
            wav, alignment, text, masked, mask_reconstruct=True)
        examples.append((new_wav, phones, s_sec, e_sec, boundary))

    variables = editor.variables
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = optax.sgd(lr)
    opt_state = tx.init(params)

    def loss_fn(p, inputs):
        (before, after, _), _ = editor.model.apply(
            {"params": p, "batch_stats": batch_stats},
            **inputs, train=True, rngs={"dropout": jax.random.PRNGKey(0)},
            mutable=["batch_stats"])
        return mlm_loss(before, after, inputs["speech"],
                        inputs["masked_position"])

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))

    for _ in range(steps):
        for new_wav, phones, s_sec, e_sec, boundary in examples:
            inputs = editor._build_inputs(new_wav, phones, s_sec, e_sec,
                                          boundary)
            loss, grads = grad_fn(params, inputs)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)

    import copy

    adapted = copy.copy(editor)
    adapted.variables = {"params": params, "batch_stats": batch_stats}
    adapted._jit_forward = jax.jit(
        lambda v, **kw: editor.model.apply(v, train=False, **kw))
    return adapted
