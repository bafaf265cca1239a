"""Speech-editing inference surface tests."""

import numpy as np
import pytest
import jax

from a3t_tpu.inference import (
    FileAlignmentSource,
    SpeechEditor,
    UtteranceAlignment,
    diff_phone_spans,
    duration_adjust_factor,
    words2phns,
)
from a3t_tpu.inference.sedit import masked_mel_boundary
from a3t_tpu.text.g2p import letter_to_sound


LEX = {
    "HELLO": ["HH", "AH0", "L", "OW1"],
    "WORLD": ["W", "ER1", "L", "D"],
    "BIG": ["B", "IH1", "G"],
    "CAT": ["K", "AE1", "T"],
    "DOG": ["D", "AO1", "G"],
}


def _align_for(words, dur=0.1):
    phones, w2p = [], {}
    for i, w in enumerate(words):
        p = LEX[w.upper()]
        w2p[f"{i}_{w.upper()}"] = list(p)
        phones.extend(p)
    n = len(phones)
    start = np.arange(n) * dur
    end = start + dur
    return UtteranceAlignment(phones, start, end, w2p)


def test_words2phns_lexicon_mask_oov():
    phns, w2p = words2phns("hello [MASK] world", LEX, letter_to_sound)
    assert phns[: 4] == LEX["HELLO"]
    assert "[MASK]" in phns
    assert phns[-4:] == LEX["WORLD"]
    assert "1_[MASK]" in w2p
    # OOV goes through g2p
    phns2, _ = words2phns("zzxq", LEX, letter_to_sound)
    assert len(phns2) > 0


def test_diff_middle_replacement():
    align = _align_for(["hello", "big", "world"])
    new_phns, rep, add = diff_phone_spans(
        align, "hello big world", "hello cat world", LEX)
    # replaced span covers exactly the phones of "big"
    assert rep == [4, 7]
    assert new_phns[add[0]: add[1]] == LEX["CAT"]
    assert new_phns == LEX["HELLO"] + LEX["CAT"] + LEX["WORLD"]


def test_diff_append_mode():
    align = _align_for(["hello"])
    new_phns, rep, add = diff_phone_spans(
        align, "hello", "hello world", LEX)
    assert rep[0] == len(LEX["HELLO"])  # span starts after the prompt
    assert new_phns == LEX["HELLO"] + LEX["WORLD"]
    assert add == [4, 8]


def test_diff_mask_token():
    align = _align_for(["hello", "big", "world"])
    new_phns, rep, add = diff_phone_spans(
        align, "hello big world", "hello [MASK] world", LEX)
    assert rep == [4, 7]


def test_diff_with_silence_words():
    # alignments carry 'sp' entries that the plain text doesn't have; the
    # diff must see through them on both the left and the right scans
    align = _align_for(["hello", "big", "world"])
    phones = (LEX["HELLO"] + ["sp"] + LEX["BIG"] + ["sp"] + LEX["WORLD"])
    w2p = {
        "0_HELLO": LEX["HELLO"], "1_sp": ["sp"], "2_BIG": LEX["BIG"],
        "3_sp": ["sp"], "4_WORLD": LEX["WORLD"],
    }
    n = len(phones)
    align = UtteranceAlignment(
        phones, np.arange(n) * 0.1, np.arange(n) * 0.1 + 0.1, w2p)
    new_phns, rep, add = diff_phone_spans(
        align, "hello big world", "hello dog world", LEX)
    # replaced span covers 'big' (old indices 5..8, after HELLO + sp)
    assert rep == [5, 8]
    assert new_phns[add[0]: add[1]] == LEX["DOG"]
    assert new_phns == (LEX["HELLO"] + ["sp"] + LEX["DOG"]
                        + ["sp"] + LEX["WORLD"])


def test_diff_full_utterance_mask():
    # the whole text replaced by a single [MASK] (a 1-2 token utterance
    # under the middle-third protocol): the middle must be the mask
    # phone, not an empty list (regression: the right-pass slice used a
    # stop of 0 when no suffix matched, dropping the whole new text)
    align = _align_for(["hello", "world"])
    new_phns, rep, add = diff_phone_spans(
        align, "hello world", "[MASK]", LEX)
    assert new_phns == ["[MASK]"]
    assert rep == [0, 8]
    assert add == [0, 1]


def test_diff_same_length_word_swap_widens_if_middle_empty():
    # swapping a word for one with identical phones except position can
    # produce an empty middle; the spans then widen by one phone each side
    align = _align_for(["hello", "world"])
    new_phns, rep, add = diff_phone_spans(
        align, "hello world", "hello hello", LEX)
    assert rep[0] <= 4 and rep[1] >= 4  # edit window covers the boundary
    assert add[1] > add[0]  # never an empty regeneration window


def test_duration_adjust_factor():
    # identical durations -> factor 1 (after trimming)
    ori = [0.1] * 9
    pred = [0.05] * 9
    phns = ["AA"] * 9
    np.testing.assert_allclose(
        duration_adjust_factor(ori, pred, phns), 2.0)
    # fewer than 5 usable entries -> 1.0
    assert duration_adjust_factor([0.1], [0.2], ["AA"]) == 1.0
    # sp and zero-pred entries are skipped
    f = duration_adjust_factor(
        [0.1] * 10, [0.05] * 9 + [0.0], ["sp"] + ["AA"] * 9)
    np.testing.assert_allclose(f, 2.0)


def test_masked_mel_boundary():
    start = [0.0, 0.1, 0.2]
    end = [0.1, 0.2, 0.3]
    b = masked_mel_boundary(start, end, 8000, 80, [1, 2])
    assert b == [int(8000 * 0.1 / 80), int(8000 * 0.2 / 80)]
    # out-of-range span collapses to the utterance end
    b2 = masked_mel_boundary(start, end, 8000, 80, [3, 3])
    assert b2 == [int(8000 * 0.3 / 80)] * 2


@pytest.fixture(scope="module")
def editor(tmp_path_factory):
    from a3t_tpu.data.miniature import generate_mini_corpus
    from a3t_tpu.data.dataset import A3TDataset
    from a3t_tpu.data.fileio import read_2column_text
    from a3t_tpu.dsp import LogMelConfig
    from a3t_tpu.models import A3TMLMModel, A3TModelConfig, EncoderConfig
    from a3t_tpu.text import TokenIDConverter, build_token_list
    import os

    corpus = generate_mini_corpus(
        str(tmp_path_factory.mktemp("sedit")), n_utts=4, fs=8000)
    texts = read_2column_text(os.path.join(corpus, "text"))
    conv = TokenIDConverter(build_token_list(texts.values()))

    fe_cfg = LogMelConfig(fs=8000, n_fft=256, hop_length=80, win_length=240,
                          n_mels=20, fmin=20, fmax=4000)
    enc = EncoderConfig(attention_dim=32, attention_heads=2, linear_units=64,
                        num_blocks=1, cnn_module_kernel=7)
    model = A3TMLMModel(A3TModelConfig(
        odim=20, vocab_size=len(conv), encoder=enc, decoder=None,
        postnet_layers=0))

    # init with a dummy batch
    import jax.numpy as jnp
    f, t = 64, 8
    dummy = dict(
        speech=jnp.zeros((1, f, 20)), text=jnp.zeros((1, t), jnp.int32),
        masked_position=jnp.zeros((1, f), bool),
        speech_mask=jnp.ones((1, f), bool), text_mask=jnp.ones((1, t), bool),
        speech_segment_pos=jnp.zeros((1, f), jnp.int32),
        text_segment_pos=jnp.zeros((1, t), jnp.int32),
    )
    variables = model.init(jax.random.PRNGKey(0), **dummy, train=False)

    phone_lex = {p: [p] for p in set(
        " ".join(texts.values()).split())}
    ed = SpeechEditor(
        model, variables, fe_cfg, conv,
        duration_fn=lambda phones, wav: [0.12] * len(phones),
        lexicon=phone_lex,
    )
    aligner = FileAlignmentSource(corpus)
    ds = A3TDataset(corpus, conv)
    return ed, aligner, ds, texts


def test_edit_replaces_span(editor):
    ed, aligner, ds, texts = editor
    uid = ds.uids[0]
    wav = ds[uid]["audio"]
    align = aligner(uid)
    old_str = texts[uid]
    words = old_str.split()
    # replace a middle phone-word with a different one
    replacement = "AA" if words[2] != "AA" else "IY"
    new_words = words[:2] + [replacement] + words[3:]
    res = ed.edit(wav, align, old_str, " ".join(new_words))

    hop = 80
    assert res.mel_edited.ndim == 2 and res.mel_edited.shape[1] == 20
    assert res.prediction.ndim == 1
    s, e = res.new_span_boundary
    assert 0 < s < e
    # splice preserves original audio outside the span
    t_old = [hop * x for x in res.old_span_boundary]
    np.testing.assert_allclose(
        res.origin_replaced[: t_old[0]], wav[: t_old[0]])
    tail = len(wav) - t_old[1]
    np.testing.assert_allclose(res.origin_replaced[-tail:], wav[-tail:])
    assert np.isfinite(res.prediction).all()


def test_mask_reconstruct_keeps_timeline(editor):
    ed, aligner, ds, texts = editor
    uid = ds.uids[1]
    wav = ds[uid]["audio"]
    align = aligner(uid)
    words = texts[uid].split()
    # mask the middle third (the MCD protocol)
    third = len(words) // 3
    masked_words = words[:third] + ["[MASK]"] + words[2 * third:]
    res = ed.reconstruct_masked_span(
        wav, align, texts[uid], " ".join(masked_words))
    assert res.old_span_boundary == res.new_span_boundary
    n_f = 1 + len(wav) // 80
    assert res.mel_edited.shape[0] == n_f


def test_prompt_tts_appends(editor):
    ed, aligner, ds, texts = editor
    uid = ds.uids[2]
    wav = ds[uid]["audio"]
    align = aligner(uid)
    prompt = texts[uid]
    full = prompt + " AA IY"
    out = ed.prompt_tts(wav, align, prompt, full)
    assert out["new_wav"].ndim == 1
    assert len(out["new_wav"]) > 0
    assert len(out["full"]) > len(wav) * 0.5
