"""FS2 baseline decoders and dynamic-evaluation tests."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from a3t_tpu.inference.baselines import FS2Baselines, dynamic_evaluation


# the module fixture trains a model: whole file is slow-tier
pytestmark = pytest.mark.slow

@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    from a3t_tpu.data.dataset import A3TDataset
    from a3t_tpu.data.fileio import read_2column_text
    from a3t_tpu.data.miniature import generate_mini_corpus
    from a3t_tpu.dsp import LogMelConfig, LogMelFrontend
    from a3t_tpu.inference import FileAlignmentSource, SpeechEditor
    from a3t_tpu.models import A3TMLMModel, A3TModelConfig, EncoderConfig
    from a3t_tpu.models.fastspeech2 import (
        FastSpeech2, FastSpeech2Config, transformer_stack_config)
    from a3t_tpu.text import TokenIDConverter, build_token_list

    corpus = generate_mini_corpus(
        str(tmp_path_factory.mktemp("bl")), n_utts=3, fs=8000)
    texts = read_2column_text(os.path.join(corpus, "text"))
    conv = TokenIDConverter(build_token_list(texts.values()))
    fe_cfg = LogMelConfig(fs=8000, n_fft=256, hop_length=80, win_length=240,
                          n_mels=20, fmin=20, fmax=4000)
    fe = LogMelFrontend(fe_cfg)

    enc = EncoderConfig(attention_dim=32, attention_heads=2, linear_units=64,
                        num_blocks=1, cnn_module_kernel=7)
    mlm = A3TMLMModel(A3TModelConfig(odim=20, vocab_size=len(conv),
                                     encoder=enc, decoder=None,
                                     postnet_layers=0))
    dummy = dict(
        speech=jnp.zeros((1, 64, 20)), text=jnp.zeros((1, 8), jnp.int32),
        masked_position=jnp.zeros((1, 64), bool),
        speech_mask=jnp.ones((1, 64), bool), text_mask=jnp.ones((1, 8), bool),
        speech_segment_pos=jnp.zeros((1, 64), jnp.int32),
        text_segment_pos=jnp.zeros((1, 8), jnp.int32))
    mlm_vars = mlm.init(jax.random.PRNGKey(0), **dummy, train=False)
    lex = {p: [p] for p in set(" ".join(texts.values()).split())}
    editor = SpeechEditor(mlm, mlm_vars, fe_cfg, conv, lexicon=lex,
                          duration_fn=lambda ph, w: [0.1] * len(ph))

    fs2_cfg = FastSpeech2Config(
        idim=len(conv) + 1, odim=20, adim=32,
        encoder=transformer_stack_config(adim=32, aheads=2, layers=1,
                                         units=64),
        decoder=transformer_stack_config(adim=32, aheads=2, layers=1,
                                         units=64),
        postnet_layers=0, duration_predictor_chans=16,
        variance_predictor_chans=16, max_feat_len=128, use_gst=True)
    fs2 = FastSpeech2(fs2_cfg)
    text0 = jnp.asarray([[1, 2, 3]], jnp.int32)
    fs2_vars = fs2.init(jax.random.PRNGKey(1), text0,
                        jnp.ones_like(text0, bool),
                        speech=jnp.zeros((1, 40, 20)), train=False)
    baselines = FS2Baselines(fs2, fs2_vars, conv, fe)

    ds = A3TDataset(corpus, conv)
    return editor, baselines, ds, FileAlignmentSource(corpus), texts, lex


def test_baseline1_synthesizes(setup):
    editor, baselines, ds, aligner, texts, lex = setup
    uid = ds.uids[0]
    wav = ds[uid]["audio"]
    out = baselines.baseline1(texts[uid], prompt_wav=wav)
    assert out.ndim == 1 and len(out) > 0
    assert np.isfinite(out).all()


def test_baseline2_and_3_splice(setup):
    editor, baselines, ds, aligner, texts, lex = setup
    uid = ds.uids[1]
    wav = ds[uid]["audio"]
    align = aligner(uid)
    words = texts[uid].split()
    repl = "AA" if words[1] != "AA" else "IY"
    new_str = " ".join(words[:1] + [repl] + words[2:])
    target = repl
    out2 = baselines.baseline2(wav, align, texts[uid], new_str, target, lex,
                               editor.mel)
    assert np.isfinite(out2).all() and out2.ndim == 1
    out3 = baselines.baseline3(wav, align, texts[uid], new_str, lex,
                               editor.mel)
    assert np.isfinite(out3).all() and out3.ndim == 1


def test_dynamic_evaluation_adapts_params(setup):
    editor, baselines, ds, aligner, texts, lex = setup
    uid = ds.uids[2]
    wav = ds[uid]["audio"]
    align = aligner(uid)
    adapted = dynamic_evaluation(editor, wav, align, texts[uid], lr=1e-3,
                                 steps=1)
    p0 = np.asarray(editor.variables["params"]["sfc"]["kernel"])
    p1 = np.asarray(adapted.variables["params"]["sfc"]["kernel"])
    assert np.abs(p0 - p1).max() > 0  # parameters moved
    # adapted editor still reconstructs
    words = texts[uid].split()
    masked = " ".join(words[:1] + ["[MASK]"] + words[2:])
    res = adapted.reconstruct_masked_span(wav, align, texts[uid], masked)
    assert np.isfinite(res.mel_edited).all()
