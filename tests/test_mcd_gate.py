"""MCD gate harness: protocol masking, split saving, end-to-end run."""

import os

import numpy as np
import pytest
import jax

from a3t_tpu.bin.mcd_gate import VCTK_SEEN, VCTK_UNSEEN, protocol_mask, \
    run_gate


def test_protocol_mask_matches_reference_rule():
    # sedit_mcd.py:93-95: tokens[:n//3] + [MASK] + tokens[-n//3:]
    assert protocol_mask("a b c d e f") == "a b [MASK] e f"
    assert protocol_mask("a b c d e f g") == "a b [MASK] f g"  # -2 tail
    assert protocol_mask("x y") == "x [MASK] y"
    assert len(VCTK_SEEN) == 30 and len(VCTK_UNSEEN) == 30


def test_gate_end_to_end_mini(tmp_path):
    from a3t_tpu.data.dataset import A3TDataset
    from a3t_tpu.data.fileio import read_2column_text
    from a3t_tpu.data.miniature import generate_mini_corpus
    from a3t_tpu.dsp import LogMelConfig
    from a3t_tpu.inference import FileAlignmentSource, SpeechEditor
    from a3t_tpu.models import A3TMLMModel, A3TModelConfig, EncoderConfig
    from a3t_tpu.text import TokenIDConverter, build_token_list
    import jax.numpy as jnp

    corpus = generate_mini_corpus(str(tmp_path / "d"), n_utts=3, fs=8000)
    texts = read_2column_text(os.path.join(corpus, "text"))
    conv = TokenIDConverter(build_token_list(texts.values()))
    fe_cfg = LogMelConfig(fs=8000, n_fft=256, hop_length=80, win_length=240,
                          n_mels=20, fmin=20, fmax=4000)
    enc = EncoderConfig(attention_dim=32, attention_heads=2, linear_units=64,
                        num_blocks=1, cnn_module_kernel=7)
    model = A3TMLMModel(A3TModelConfig(
        odim=20, vocab_size=len(conv), encoder=enc, decoder=None,
        postnet_layers=0))
    f, t = 64, 8
    dummy = dict(
        speech=jnp.zeros((1, f, 20)), text=jnp.zeros((1, t), jnp.int32),
        masked_position=jnp.zeros((1, f), bool),
        speech_mask=jnp.ones((1, f), bool), text_mask=jnp.ones((1, t), bool),
        speech_segment_pos=jnp.zeros((1, f), jnp.int32),
        text_segment_pos=jnp.zeros((1, t), jnp.int32))
    variables = model.init(jax.random.PRNGKey(0), **dummy, train=False)
    lexicon = {p.upper(): [p] for txt in texts.values() for p in txt.split()}
    editor = SpeechEditor(model, variables, fe_cfg, conv, lexicon=lexicon)

    dataset = A3TDataset(corpus, conv)
    uids = dataset.uids[:2]
    out = str(tmp_path / "mcd_out")
    from a3t_tpu.eval.mcd import MCDConfig

    report = run_gate(
        editor, texts, dataset, FileAlignmentSource(corpus), uids, out,
        mcd_config=MCDConfig(mcep_dim=24, fftl=512, shiftms=10.0,
                             f0min=70, f0max=700))
    assert report["n"] == 2
    assert np.isfinite(report["mean_mcd"])
    assert np.isfinite(report["vocoder_ceiling_mcd"])
    for prefix in ("sedit", "gt", "vocoder"):
        for split in ("full", "replaced", "unreplaced"):
            for uid in uids:
                assert os.path.exists(
                    os.path.join(out, prefix, split, uid + ".wav"))
    # a random-init model must be far worse than the vocoder ceiling
    assert report["mean_mcd"] > report["vocoder_ceiling_mcd"]
