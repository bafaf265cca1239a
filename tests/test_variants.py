"""TTS-variant training, speech-only pretraining, multi-corpus mixing."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from a3t_tpu.data.batcher import BatcherConfig, BucketBatcher
from a3t_tpu.data.dataset import A3TDataset
from a3t_tpu.data.fileio import read_2column_text
from a3t_tpu.data.miniature import generate_mini_corpus
from a3t_tpu.data.multi_corpus import (
    CorpusSpec,
    MultiCorpusIterFactory,
    make_multi_corpus_train_step,
)
from a3t_tpu.dsp import LogMelConfig, LogMelFrontend
from a3t_tpu.models import A3TMLMModel, A3TModelConfig, EncoderConfig
from a3t_tpu.train import OptimConfig, create_train_state, make_optimizer, make_train_step
from a3t_tpu.train.train_step import featurize, make_tts_train_step


HOP = 80
FE_CFG = LogMelConfig(fs=8000, n_fft=256, hop_length=HOP, win_length=240,
                      n_mels=20, fmin=20, fmax=4000)


def tiny_model(**kw):
    enc = EncoderConfig(attention_dim=32, attention_heads=2, linear_units=64,
                        num_blocks=1, cnn_module_kernel=7)
    defaults = dict(odim=20, vocab_size=30, encoder=enc, decoder=enc,
                    postnet_layers=0)
    defaults.update(kw)
    return A3TMLMModel(A3TModelConfig(**defaults))


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    return generate_mini_corpus(
        str(tmp_path_factory.mktemp("v")), n_utts=8, fs=8000)


@pytest.fixture(scope="module")
def converter(corpus):
    from a3t_tpu.text import TokenIDConverter, build_token_list

    texts = read_2column_text(os.path.join(corpus, "text")).values()
    return TokenIDConverter(build_token_list(texts))


def test_duration_collect_batches(corpus, converter):
    ds = A3TDataset(corpus, converter)
    batcher = BucketBatcher(ds, FE_CFG, BatcherConfig(
        batch_bins=20 * 256 * 4, bucket_frames=(256,), min_frames=1,
        duration_collect=True))
    batch = next(iter(batcher.epoch_iterator(0)))
    assert "durations" in batch and "reordered_index" in batch
    b, f = batch["durations"].shape
    # reordered_index is a permutation of frames per utterance
    for i in range(len(batcher.bucket_members[0][:b])):
        assert sorted(batch["reordered_index"][i]) == list(range(f))
    # durations of kept-first masked phones exceed 1 somewhere
    assert (batch["durations"] >= 1).all()
    assert (batch["reduced_lengths"] > 0).any()


@pytest.mark.slow
def test_tts_variant_train_step(corpus, converter):
    ds = A3TDataset(corpus, converter)
    batcher = BucketBatcher(ds, FE_CFG, BatcherConfig(
        batch_bins=20 * 256 * 4, bucket_frames=(256,), min_frames=1,
        duration_collect=True))
    fe = LogMelFrontend(FE_CFG)
    model = tiny_model(duration_predictor_layers=2)
    tx = make_optimizer(OptimConfig(model_size=32, warmup_steps=10))
    batch = {k: jnp.asarray(v) for k, v in
             next(iter(batcher.epoch_iterator(0))).items()}
    state = create_train_state(
        model, tx, featurize(fe, {k: v[:2] for k, v in batch.items()},
                             use_fused=False))
    step = make_tts_train_step(model, fe, donate=False)
    losses = []
    for i in range(3):
        state, stats = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(stats["loss"]))
        assert np.isfinite(stats["loss_duration"])
    assert np.isfinite(losses).all()

    # the duration-aware step honors the seq mesh axis too (bucket 256 is
    # divisible): one seq-sharded step reproduces the first unsharded loss
    from a3t_tpu.parallel import MeshConfig, make_mesh, shard_variables
    from a3t_tpu.parallel.mesh import batch_sharding

    mesh = make_mesh(MeshConfig(data_parallel=2, sequence_parallel=4))
    state_sp = create_train_state(
        model, tx, featurize(fe, {k: v[:2] for k, v in batch.items()},
                             use_fused=False))
    state_sp = state_sp.replace(
        params=shard_variables(mesh, state_sp.params))
    batch_sp = jax.device_put(batch, batch_sharding(mesh))
    step_sp = make_tts_train_step(model, fe, mesh=mesh, donate=False)
    _, stats_sp = step_sp(state_sp, batch_sp, jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(stats_sp["loss"]), losses[0],
                               rtol=1e-5)


@pytest.mark.slow
def test_speech_only_batches_and_training(corpus, converter):
    ds = A3TDataset(corpus, converter, speech_only=True)
    assert ds.speech_only
    batcher = BucketBatcher(ds, FE_CFG, BatcherConfig(
        batch_bins=20 * 256 * 4, bucket_frames=(256,), min_frames=1))
    batch = next(iter(batcher.epoch_iterator(0)))
    # sentinel text token, frame-span masking
    assert (batch["text"][:, 0] == 1).all()
    assert batch["text_mask"][:, 0].all()
    assert not batch["text_mask"][:, 1:].any()
    assert batch["masked_position"].any()
    assert (batch["speech_segment_pos"] == 0).all()

    fe = LogMelFrontend(FE_CFG)
    model = tiny_model()
    tx = make_optimizer(OptimConfig(model_size=32, warmup_steps=10))
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    state = create_train_state(
        model, tx, featurize(fe, {k: v[:2] for k, v in jb.items()},
                             use_fused=False), )
    step = make_train_step(model, fe, speech_only=True, donate=False)
    state, stats = step(state, jb, jax.random.PRNGKey(0))
    assert np.isfinite(float(stats["loss"]))


@pytest.mark.slow
def test_multi_corpus_factory_and_step(tmp_path, corpus, converter):
    # second corpus at a different sample rate, speech-only
    corpus2 = generate_mini_corpus(str(tmp_path / "c2"), n_utts=6, fs=16000,
                                   seed=11)
    fe2_cfg = LogMelConfig(fs=16000, n_fft=512, hop_length=160,
                           win_length=480, n_mels=20, fmin=20, fmax=7000)
    ds1 = A3TDataset(corpus, converter)
    ds2 = A3TDataset(corpus2, None, speech_only=True)
    b1 = BucketBatcher(ds1, FE_CFG, BatcherConfig(
        batch_bins=20 * 256 * 2, bucket_frames=(256,), min_frames=1))
    b2 = BucketBatcher(ds2, fe2_cfg, BatcherConfig(
        batch_bins=20 * 256 * 2, bucket_frames=(256,), min_frames=1))

    factory = MultiCorpusIterFactory(
        [CorpusSpec("a", b1, 0.6), CorpusSpec("b", b2, 0.4, speech_only=True)],
        num_iters_per_epoch=10, prefetch=0)
    names = [name for name, _ in factory(1)]
    assert set(names) == {"a", "b"}
    assert 4 <= names.count("a") <= 8

    model = tiny_model()
    tx = make_optimizer(OptimConfig(model_size=32, warmup_steps=10))
    fe1 = LogMelFrontend(FE_CFG)
    fe2 = LogMelFrontend(fe2_cfg)
    sample = next(iter(b1.epoch_iterator(0)))
    state = create_train_state(
        model, tx, featurize(fe1, {k: jnp.asarray(v)[:2] for k, v in
                                   sample.items()}, use_fused=False))
    step = make_multi_corpus_train_step(
        model, {"a": fe1, "b": fe2}, {"a": False, "b": True})
    n = 0
    for name, batch in factory(2):
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        state, stats = step(state, (name, jb), jax.random.PRNGKey(n))
        assert np.isfinite(float(stats["loss"])), name
        n += 1
        if n >= 4:
            break
    assert n == 4
