"""FastSpeech2 + GST tests (tiny configs)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from a3t_tpu.models.fastspeech2 import (
    FastSpeech2,
    FastSpeech2Config,
    fastspeech2_loss,
    length_regulate,
    transformer_stack_config,
)
from a3t_tpu.models.gst import StyleEncoder


def tiny_fs2(**kw):
    enc = transformer_stack_config(adim=32, aheads=2, layers=1, units=64)
    defaults = dict(
        idim=30, odim=12, adim=32, encoder=enc, decoder=enc,
        postnet_layers=2, postnet_chans=16,
        duration_predictor_chans=16, variance_predictor_chans=16,
        max_feat_len=64,
    )
    defaults.update(kw)
    return FastSpeech2Config(**defaults)


def test_length_regulate_semantics():
    hs = jnp.arange(6, dtype=jnp.float32).reshape(1, 3, 2)
    d = jnp.asarray([[2, 0, 3]], jnp.int32)
    out, valid = length_regulate(hs, d, 8)
    # phone 0 twice, phone 1 skipped, phone 2 three times, rest zero
    expect = np.array([[0, 1], [0, 1], [4, 5], [4, 5], [4, 5],
                       [0, 0], [0, 0], [0, 0]], np.float32)
    np.testing.assert_allclose(np.asarray(out[0]), expect)
    np.testing.assert_array_equal(np.asarray(valid[0]),
                                  [1, 1, 1, 1, 1, 0, 0, 0])


@pytest.mark.slow
def test_fs2_forward_and_loss(rng):
    cfg = tiny_fs2()
    model = FastSpeech2(cfg)
    b, t = 2, 7
    text = jnp.asarray(rng.integers(1, 29, (b, t)), jnp.int32)
    mask = jnp.ones((b, t), bool)
    durs = jnp.asarray(rng.integers(1, 5, (b, t)), jnp.int32)
    pitch = jnp.asarray(rng.standard_normal((b, t, 1)), jnp.float32)
    energy = jnp.asarray(rng.standard_normal((b, t, 1)), jnp.float32)

    variables = model.init(
        jax.random.PRNGKey(0), text, mask, durations=durs, pitch=pitch,
        energy=energy, train=False)
    out = model.apply(variables, text, mask, durations=durs, pitch=pitch,
                      energy=energy, train=False)
    assert out["before"].shape == (b, cfg.max_feat_len, 12)
    assert out["log_duration"].shape == (b, t)

    targets = dict(
        mel=jnp.asarray(rng.standard_normal(
            (b, cfg.max_feat_len, 12)), jnp.float32),
        durations=durs, pitch=pitch, energy=energy,
    )
    losses = fastspeech2_loss(out, targets, mask)
    assert np.isfinite(float(losses["loss"]))


@pytest.mark.slow
def test_fs2_inference_duration_prediction(rng):
    cfg = tiny_fs2(use_gst=True, spk_embed_dim=16)
    model = FastSpeech2(cfg)
    b, t = 1, 5
    text = jnp.asarray(rng.integers(1, 29, (b, t)), jnp.int32)
    mask = jnp.ones((b, t), bool)
    speech = jnp.asarray(rng.standard_normal((b, 40, 12)), jnp.float32)
    spembs = jnp.asarray(rng.standard_normal((b, 16)), jnp.float32)

    variables = model.init(
        jax.random.PRNGKey(0), text, mask, speech=speech, spembs=spembs,
        train=False)
    durs = model.apply(variables, text, mask, speech=speech, spembs=spembs,
                       method=model.predict_durations)
    assert durs.shape == (b, t)
    assert (np.asarray(durs) >= 0).all()

    out = model.apply(variables, text, mask, speech=speech, spembs=spembs,
                      train=False)
    assert out["after"].shape == (b, cfg.max_feat_len, 12)


@pytest.mark.slow
def test_gst_style_encoder(rng):
    enc = StyleEncoder(gst_token_dim=32, gst_heads=2,
                       conv_chans_list=(4, 8), gru_units=16)
    speech = jnp.asarray(rng.standard_normal((2, 37, 12)), jnp.float32)
    variables = enc.init(jax.random.PRNGKey(0), speech)
    out = enc.apply(variables, speech)
    assert out.shape == (2, 32)
    assert np.isfinite(np.asarray(out)).all()
    # different references give different styles
    speech2 = speech * 3.0 + 1.0
    out2 = enc.apply(variables, speech2)
    assert np.abs(np.asarray(out - out2)).max() > 1e-5


def test_pitch_extraction_tracks_tone(rng):
    from a3t_tpu.dsp.pitch import average_by_duration, extract_f0, fs2_targets

    fs, hop = 16000, 160
    t = np.arange(fs) / fs
    wav = 0.5 * np.sin(2 * np.pi * 220.0 * t)
    f0 = extract_f0(wav, fs, hop)
    voiced = f0[f0 > 0]
    assert len(voiced) > 0.8 * len(f0)
    np.testing.assert_allclose(np.median(voiced), 220.0, rtol=0.05)

    # unvoiced noise -> mostly zero
    noise = 0.1 * rng.standard_normal(fs)
    f0n = extract_f0(noise, fs, hop)
    assert (f0n > 0).mean() < 0.5

    # token averaging
    vals = np.array([100.0, 110, 0, 0, 200, 210], np.float32)
    avg = average_by_duration(vals, np.array([4, 2]), nonzero_only=True)
    np.testing.assert_allclose(avg, [105.0, 205.0])

    tg = fs2_targets(wav, fs, 512, hop, 400, np.array([50, 51]))
    assert tg["pitch"].shape == (2,)
    assert (tg["energy"] > 0).all()


@pytest.mark.slow
def test_fs2_training_on_mini_corpus(tmp_path):
    """Full FS2 training path: corpus -> targets -> train steps."""
    from a3t_tpu.data.dataset import A3TDataset
    from a3t_tpu.data.fileio import read_2column_text
    from a3t_tpu.data.miniature import generate_mini_corpus
    from a3t_tpu.dsp import LogMelConfig, LogMelFrontend
    from a3t_tpu.tasks.fs2 import (
        FS2Batcher, FS2BatcherConfig, create_fs2_state, make_fs2_train_step)
    from a3t_tpu.text import TokenIDConverter, build_token_list
    from a3t_tpu.train import OptimConfig, make_optimizer
    import os

    corpus = generate_mini_corpus(str(tmp_path / "c"), n_utts=6, fs=8000)
    conv = TokenIDConverter(build_token_list(
        read_2column_text(os.path.join(corpus, "text")).values()))
    fe_cfg = LogMelConfig(fs=8000, n_fft=256, hop_length=80, win_length=240,
                          n_mels=20, fmin=20, fmax=4000)
    fe = LogMelFrontend(fe_cfg)
    ds = A3TDataset(corpus, conv)

    batcher = FS2Batcher(ds, fe_cfg, FS2BatcherConfig(
        batch_size=3, text_buckets=(16,), max_feat_len=128))
    eos = len(conv)  # one past the vocab
    batch = next(iter(batcher.epoch_iterator(0, eos_id=eos)))
    assert batch["text"].shape == (3, 16)
    # durations cover the valid frames
    i = 0
    n_f = 1 + batch["audio_lengths"][i] // 80
    assert abs(int(batch["durations"][i].sum()) - n_f) <= 1

    cfg = tiny_fs2(idim=eos + 1, odim=20, max_feat_len=128, use_gst=True)
    model = FastSpeech2(cfg)
    tx = make_optimizer(OptimConfig(model_size=32, warmup_steps=10))
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    state = create_fs2_state(model, tx, jb)
    step = make_fs2_train_step(model, fe)
    for i in range(2):
        state, losses = step(state, jb, jax.random.PRNGKey(i))
        for k in ("loss", "l1_loss", "duration_loss", "pitch_loss",
                  "energy_loss"):
            assert np.isfinite(float(losses[k])), k
