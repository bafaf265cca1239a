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
