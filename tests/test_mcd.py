"""MCD harness tests: extractor sanity, DTW exactness, metric behavior."""

import numpy as np
import pytest

from a3t_tpu.eval.mcd import (
    MCDConfig,
    dtw_path,
    mcd_between_waveforms,
    mcd_from_mceps,
    mcep_from_wav,
    middle_third_mask_str,
    sp2mc,
)


CFG = MCDConfig(mcep_dim=24, fftl=512, cepstral_smoothing=30)


def _tone(freq, fs=16000, secs=0.5, amp=0.3):
    t = np.arange(int(fs * secs)) / fs
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float64)


def test_mcep_shapes_and_stability(rng):
    wav = _tone(220) + 0.01 * rng.standard_normal(8000)
    mc, pw = mcep_from_wav(wav, 16000, CFG)
    assert mc.shape[1] == CFG.mcep_dim + 1
    assert len(pw) == len(mc)
    assert np.isfinite(mc).all()


def test_dtw_identical_sequences_diagonal(rng):
    x = rng.standard_normal((20, 4))
    pi, pj = dtw_path(x, x)
    np.testing.assert_array_equal(pi, pj)
    np.testing.assert_array_equal(pi, np.arange(20))


def test_dtw_alignment_with_time_warp(rng):
    x = rng.standard_normal((10, 3))
    y = np.repeat(x, 2, axis=0)  # time-stretched copy
    pi, pj = dtw_path(x, y)
    # perfect alignment cost: every matched pair identical
    d = np.abs(x[pi] - y[pj]).max()
    assert d < 1e-12


def test_mcd_zero_for_identical_and_positive_for_different(rng):
    wav1 = _tone(220) + 0.01 * rng.standard_normal(8000)
    wav2 = _tone(500) + 0.01 * rng.standard_normal(8000)
    same = mcd_between_waveforms(wav1, wav1, 16000, CFG)
    diff = mcd_between_waveforms(wav1, wav2, 16000, CFG)
    assert same < 1e-8
    assert diff > 1.0
    # closer tones give smaller MCD than distant ones
    wav3 = _tone(240) + 0.01 * rng.standard_normal(8000)
    closer = mcd_between_waveforms(wav1, wav3, 16000, CFG)
    assert closer < diff


def test_silence_stripping(rng):
    wav = np.concatenate([np.zeros(4000), _tone(220, secs=0.25),
                          np.zeros(4000)])
    mc, pw = mcep_from_wav(wav, 16000, CFG)
    voiced = (pw > CFG.power_threshold_db).sum()
    assert 0 < voiced < len(pw)


def test_sp2mc_reconstructs_flat_spectrum():
    env = np.ones((3, 257))
    mc = sp2mc(env, 10, 0.41, 512)
    # log of a flat envelope is 0 -> all cepstra ~0
    assert np.abs(mc).max() < 1e-8


def test_middle_third_mask_str():
    assert middle_third_mask_str("a b c d e f") == "a b [MASK] e f"
    assert "[MASK]" in middle_third_mask_str("x y")


def test_protocol_on_mini_corpus(tmp_path):
    """Full protocol run: editor + miniature corpus -> finite mean MCD."""
    import jax
    import jax.numpy as jnp

    from a3t_tpu.data.dataset import A3TDataset
    from a3t_tpu.data.fileio import read_2column_text
    from a3t_tpu.data.miniature import generate_mini_corpus
    from a3t_tpu.dsp import LogMelConfig
    from a3t_tpu.eval.mcd import evaluate_masked_reconstruction
    from a3t_tpu.inference import FileAlignmentSource, SpeechEditor
    from a3t_tpu.models import A3TMLMModel, A3TModelConfig, EncoderConfig
    from a3t_tpu.text import TokenIDConverter, build_token_list
    import os

    corpus = generate_mini_corpus(str(tmp_path / "c"), n_utts=3, fs=8000)
    texts = read_2column_text(os.path.join(corpus, "text"))
    conv = TokenIDConverter(build_token_list(texts.values()))
    fe_cfg = LogMelConfig(fs=8000, n_fft=256, hop_length=80, win_length=240,
                          n_mels=20, fmin=20, fmax=4000)
    enc = EncoderConfig(attention_dim=32, attention_heads=2, linear_units=64,
                        num_blocks=1, cnn_module_kernel=7)
    model = A3TMLMModel(A3TModelConfig(odim=20, vocab_size=len(conv),
                                       encoder=enc, decoder=None,
                                       postnet_layers=0))
    f, t = 64, 8
    dummy = dict(
        speech=jnp.zeros((1, f, 20)), text=jnp.zeros((1, t), jnp.int32),
        masked_position=jnp.zeros((1, f), bool),
        speech_mask=jnp.ones((1, f), bool), text_mask=jnp.ones((1, t), bool),
        speech_segment_pos=jnp.zeros((1, f), jnp.int32),
        text_segment_pos=jnp.zeros((1, t), jnp.int32))
    variables = model.init(jax.random.PRNGKey(0), **dummy, train=False)
    lex = {p: [p] for p in set(" ".join(texts.values()).split())}
    editor = SpeechEditor(model, variables, fe_cfg, conv, lexicon=lex)

    ds = A3TDataset(corpus, conv)
    result = evaluate_masked_reconstruction(
        editor, FileAlignmentSource(corpus), ds, ds.uids,
        MCDConfig(mcep_dim=12, fftl=256, cepstral_smoothing=20), texts)
    assert result["n"] >= 1
    assert np.isfinite(result["mean_mcd"])
    assert result["mean_mcd"] > 0  # untrained model can't reconstruct
