"""Data pipeline tests: fileio, dataset, bucketing batcher, iterators,
end-to-end on a generated miniature corpus."""

import os

import numpy as np
import pytest

from a3t_tpu.data.batcher import BatcherConfig, BucketBatcher
from a3t_tpu.data.dataset import A3TDataset
from a3t_tpu.data.fileio import (
    load_num_sequence_text,
    read_2column_text,
    read_wav,
    write_2column_text,
    write_num_sequence_text,
    write_wav,
)
from a3t_tpu.data.iterator import EpochIterFactory
from a3t_tpu.data.miniature import generate_mini_corpus
from a3t_tpu.dsp import LogMelConfig
from a3t_tpu.text import TokenIDConverter, build_token_list


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("mini")
    return generate_mini_corpus(str(d), n_utts=10, fs=8000, seed=1)


@pytest.fixture(scope="module")
def converter(corpus):
    texts = read_2column_text(os.path.join(corpus, "text")).values()
    return TokenIDConverter(build_token_list(texts))


def test_fileio_roundtrip(tmp_path, rng):
    p = tmp_path / "t"
    write_2column_text(str(p / "text"), {"a": "X Y", "b": "Z"})
    assert read_2column_text(str(p / "text")) == {"a": "X Y", "b": "Z"}

    seqs = {"a": np.array([0.1, 0.2], np.float32)}
    write_num_sequence_text(str(p / "mfa"), seqs)
    got = load_num_sequence_text(str(p / "mfa"))
    np.testing.assert_allclose(got["a"], seqs["a"], atol=1e-6)

    wav = rng.uniform(-0.9, 0.9, 1000).astype(np.float32)
    write_wav(str(p / "x.wav"), 8000, wav)
    fs, back = read_wav(str(p / "x.wav"))
    assert fs == 8000
    np.testing.assert_allclose(back, wav, atol=1e-3)


def test_dataset_loads_consistent_items(corpus, converter):
    ds = A3TDataset(corpus, converter)
    assert len(ds) == 10
    item = ds[ds.uids[0]]
    assert item["fs"] == 8000
    assert len(item["phones"]) == len(item["align_start_sec"])
    assert (item["align_end_sec"] >= item["align_start_sec"]).all()
    assert item["text_ids"].dtype == np.int32
    # alignment covers the waveform
    assert item["align_end_sec"][-1] * 8000 <= len(item["audio"]) + 800
    assert ds.num_samples(ds.uids[0]) == len(item["audio"])


def test_tokenizer_roundtrip(converter):
    ids = converter.text2ids("AA IY UW")
    assert converter.ids2tokens(ids) == ["AA", "IY", "UW"]
    assert converter.text2ids("NOT_A_PHONE") == [converter.unk_id]


def test_batcher_static_shapes(corpus, converter):
    fe = LogMelConfig(fs=8000, n_fft=256, hop_length=80, win_length=240,
                      n_mels=20, fmin=20, fmax=4000)
    ds = A3TDataset(corpus, converter)
    cfg = BatcherConfig(batch_bins=20 * 64 * 4, bucket_frames=(64, 128, 256),
                        mlm_prob_factor=1.0)
    batcher = BucketBatcher(ds, fe, cfg)
    assert batcher.n_dropped == 0

    plans = batcher.batch_plan(epoch=1)
    assert len(plans) >= 1
    rng = np.random.default_rng(0)
    for bi, uids in plans:
        batch = batcher.make_batch(bi, uids, rng)
        spec = batcher.buckets[bi]
        assert batch["audio"].shape == (spec.batch_size, spec.n_samples)
        assert batch["masked_position"].shape == (spec.batch_size, spec.n_frames)
        assert batch["text"].shape == (spec.batch_size, spec.n_text)
        # true lengths within bucket
        assert (batch["audio_lengths"] <= spec.n_samples).all()
        # masking only where audio exists
        for i in range(len(uids)):
            n_f = batch["audio_lengths"][i] // fe.hop_length + 1
            assert not batch["masked_position"][i, n_f:].any()
        # segment positions consistent with text mask
        tm = batch["text_mask"]
        tsp = batch["text_segment_pos"]
        assert ((tsp > 0) == tm).all()


def test_batch_plan_epoch_seeding(corpus, converter):
    fe = LogMelConfig(fs=8000, n_fft=256, hop_length=80, win_length=240,
                      n_mels=20, fmin=20, fmax=4000)
    ds = A3TDataset(corpus, converter)
    batcher = BucketBatcher(ds, fe, BatcherConfig(
        batch_bins=20 * 64 * 2, bucket_frames=(64, 128, 256)))
    p1 = batcher.batch_plan(1)
    p1b = batcher.batch_plan(1)
    p2 = batcher.batch_plan(2)
    assert p1 == p1b  # reproducible
    assert p1 != p2  # reshuffled per epoch
    # sharding partitions the plan
    s0 = batcher.batch_plan(1, shard=(0, 2))
    s1 = batcher.batch_plan(1, shard=(1, 2))
    assert len(s0) + len(s1) == len(p1)


def test_iter_factory_window(corpus, converter):
    fe = LogMelConfig(fs=8000, n_fft=256, hop_length=80, win_length=240,
                      n_mels=20, fmin=20, fmax=4000)
    ds = A3TDataset(corpus, converter)
    batcher = BucketBatcher(ds, fe, BatcherConfig(
        batch_bins=20 * 64 * 2, bucket_frames=(64, 128, 256)))
    factory = EpochIterFactory(batcher, num_iters_per_epoch=7, prefetch=2)
    batches = list(factory(1))
    assert len(batches) == 7  # wraps the corpus as needed


@pytest.mark.slow
def test_end_to_end_train_on_mini_corpus(corpus, converter):
    """The mini_an4-style integration test: files -> batches -> train steps."""
    import jax
    import jax.numpy as jnp

    from a3t_tpu.dsp import LogMelFrontend
    from a3t_tpu.models import A3TMLMModel, A3TModelConfig, EncoderConfig
    from a3t_tpu.train import OptimConfig, create_train_state, make_optimizer, make_train_step
    from a3t_tpu.train.train_step import featurize

    fe_cfg = LogMelConfig(fs=8000, n_fft=256, hop_length=80, win_length=240,
                          n_mels=20, fmin=20, fmax=4000)
    fe = LogMelFrontend(fe_cfg)
    ds = A3TDataset(corpus, converter)
    batcher = BucketBatcher(ds, fe_cfg, BatcherConfig(
        batch_bins=20 * 256 * 4, bucket_frames=(256,), min_frames=1))
    enc = EncoderConfig(attention_dim=32, attention_heads=2, linear_units=64,
                        num_blocks=1, cnn_module_kernel=7)
    model = A3TMLMModel(A3TModelConfig(
        odim=20, vocab_size=len(converter), encoder=enc, decoder=None,
        postnet_layers=0))
    tx = make_optimizer(OptimConfig(model_size=32, warmup_steps=10))

    batches = [
        {k: jnp.asarray(v) for k, v in b.items()}
        for b in EpochIterFactory(batcher, num_iters_per_epoch=3, prefetch=0)(1)
    ]
    state = create_train_state(model, tx, featurize(fe, batches[0], use_fused=False))
    step = make_train_step(model, fe, donate=False)
    losses = []
    for i, b in enumerate(batches):
        state, stats = step(state, b, jax.random.PRNGKey(i))
        losses.append(float(stats["loss"]))
    assert np.isfinite(losses).all()
    assert losses[0] > 0


def test_kaldi_ark_roundtrip(tmp_path, rng):
    from a3t_tpu.data.kaldi_ark import (
        KaldiArkReader, read_kaldi_mat, spk2xvector_from_kaldi,
        write_kaldi_ark)
    from a3t_tpu.data.fileio import write_2column_text

    data = {
        "utt1": rng.standard_normal((1, 512)).astype(np.float32),
        "utt2": rng.standard_normal((1, 512)).astype(np.float32),
        "utt3": rng.standard_normal(16).astype(np.float32),  # vector
    }
    ark = str(tmp_path / "xvector.ark")
    scp = write_kaldi_ark(ark, data)
    write_2column_text(str(tmp_path / "xvector.scp"), scp)

    reader = KaldiArkReader(str(tmp_path / "xvector.scp"))
    np.testing.assert_allclose(reader["utt1"], data["utt1"])
    np.testing.assert_allclose(reader["utt3"], data["utt3"])

    spk2xv = spk2xvector_from_kaldi(
        str(tmp_path / "xvector.scp"),
        {"utt1": "spkA", "utt2": "spkA", "utt3": "spkB"})
    np.testing.assert_allclose(
        spk2xv["spkA"],
        (data["utt1"].reshape(-1) + data["utt2"].reshape(-1)) / 2, rtol=1e-6)


def test_merge_utterances(rng):
    from a3t_tpu.inference.sedit import UtteranceAlignment, merge_utterances

    a1 = UtteranceAlignment(["A", "B"], np.array([0.0, 0.1]),
                            np.array([0.1, 0.2]), {"0_A": ["A"], "1_B": ["B"]})
    a2 = UtteranceAlignment(["C"], np.array([0.0]), np.array([0.15]),
                            {"0_C": ["C"]})
    w1 = np.zeros(1600, np.float32)
    w2 = np.ones(1200, np.float32)
    wav, text, merged = merge_utterances(w1, a1, "A B", w2, a2, "C")
    assert len(wav) == 2800
    assert text == "A B C"
    assert merged.phones == ["A", "B", "C"]
    np.testing.assert_allclose(merged.start_sec, [0.0, 0.1, 0.2])
    assert "2_C" in merged.word2phns


def test_native_loader_matches_python(corpus, converter, rng):
    """Native C++ wav batch decoding vs the python path, batch for batch."""
    from a3t_tpu.data.native_loader import NativeWavLoader

    fe = LogMelConfig(fs=8000, n_fft=256, hop_length=80, win_length=240,
                      n_mels=20, fmin=20, fmax=4000)
    ds = A3TDataset(corpus, converter)

    loader = NativeWavLoader([ds.wav.data[u] for u in ds.uids])
    ns, sr = loader.probe()
    assert (sr == 8000).all()
    for i, uid in enumerate(ds.uids[:3]):
        assert ns[i] == len(ds[uid]["audio"])

    out, lengths = loader.load_batch([0, 1], 4000)
    ref0 = ds[ds.uids[0]]["audio"][:4000]
    np.testing.assert_allclose(out[0, : len(ref0)], ref0, atol=2e-4)
    assert lengths[0] == min(ns[0], 4000)

    # full batcher parity: native vs python masking-identical batches
    cfg_n = BatcherConfig(batch_bins=20 * 256 * 4, bucket_frames=(256,),
                          min_frames=1, use_native_loader=True)
    cfg_p = BatcherConfig(batch_bins=20 * 256 * 4, bucket_frames=(256,),
                          min_frames=1, use_native_loader=False)
    bn = BucketBatcher(ds, fe, cfg_n)
    bp = BucketBatcher(ds, fe, cfg_p)
    assert bn._loader is not None
    b1 = bn.make_batch(0, ds.uids[:4], np.random.default_rng(1))
    b2 = bp.make_batch(0, ds.uids[:4], np.random.default_rng(1))
    np.testing.assert_allclose(b1["audio"], b2["audio"], atol=2e-4)
    np.testing.assert_array_equal(b1["audio_lengths"] // fe.hop_length,
                                  b2["audio_lengths"] // fe.hop_length)
    np.testing.assert_array_equal(b1["masked_position"], b2["masked_position"])
    np.testing.assert_array_equal(b1["text"], b2["text"])


def test_int16_audio_roundtrip_and_featurize(corpus, converter):
    """audio_int16 batches carry the exact PCM codes and featurize to the
    same mels as the float path (the codes round-trip through /32768)."""
    import jax.numpy as jnp

    from a3t_tpu.dsp import LogMelFrontend
    from a3t_tpu.train.train_step import featurize

    fe = LogMelConfig(fs=8000, n_fft=256, hop_length=80, win_length=240,
                      n_mels=20, fmin=20, fmax=4000)
    ds = A3TDataset(corpus, converter)
    kw = dict(batch_bins=20 * 64 * 4, bucket_frames=(64, 128, 256),
              mlm_prob_factor=1.0)
    b_i16 = BucketBatcher(ds, fe, BatcherConfig(audio_int16=True, **kw))
    b_f32 = BucketBatcher(ds, fe, BatcherConfig(audio_int16=False, **kw))

    bi, uids = b_i16.batch_plan(epoch=1)[0]
    rng = np.random.default_rng(0)
    x16 = b_i16.make_batch(bi, uids, rng)
    rng = np.random.default_rng(0)
    x32 = b_f32.make_batch(bi, uids, rng)

    assert x16["audio"].dtype == np.int16
    # dequantized int16 reproduces the float audio exactly (PCM16 source)
    np.testing.assert_array_equal(
        x16["audio"].astype(np.float32) / 32768.0, x32["audio"])

    front = LogMelFrontend(fe)
    m16 = featurize(front, {k: jnp.asarray(v) for k, v in x16.items()},
                    use_fused=False)
    m32 = featurize(front, {k: jnp.asarray(v) for k, v in x32.items()},
                    use_fused=False)
    np.testing.assert_array_equal(np.asarray(m16["speech"]),
                                  np.asarray(m32["speech"]))


def test_prefetch_iterator_close_releases_queue():
    """close() stops the producer and drops queued items — an abandoned
    iterator must not pin prefetched (possibly device-resident) batches."""
    import itertools
    import time

    from a3t_tpu.data.iterator import PrefetchIterator

    produced = []

    def gen():
        for i in itertools.count():
            produced.append(i)
            yield i

    it = PrefetchIterator(gen(), depth=2)
    assert next(it) == 0
    it.close()
    time.sleep(0.8)  # give the producer time to observe the flag
    n_after = len(produced)
    time.sleep(0.8)
    assert len(produced) == n_after  # producer stopped
    assert it.q.qsize() <= 1  # only the done sentinel may remain
    with pytest.raises(StopIteration):  # post-close iteration must not hang
        next(it)


def test_native_loader_i16_matches_float(corpus, converter):
    """loader_load_batch_i16 emits exactly the codes the float path
    re-quantizes to (bulk-copied for PCM16 sources)."""
    import glob

    from a3t_tpu.data.native_loader import NativeWavLoader

    paths = sorted(glob.glob(os.path.join(corpus, "wav", "*.wav")))[:6]
    if not paths:
        pytest.skip("no wavs in fixture corpus")
    ld = NativeWavLoader(paths, 2)
    f32, l1 = ld.load_batch(range(len(paths)), 4000)
    i16, l2 = ld.load_batch_i16(range(len(paths)), 4000)
    np.testing.assert_array_equal(l1, l2)
    ref = np.clip(np.rint(f32 * 32768.0), -32768, 32767).astype(np.int16)
    np.testing.assert_array_equal(i16, ref)


def test_num_samples_probes_flac(tmp_path, rng):
    """batch planning must header-probe FLAC-stored corpora too
    (flac is the reference recipe's default storage, mlm.sh:294)."""
    from a3t_tpu.data.fileio import write_2column_text
    from a3t_tpu.data.flac import write_flac

    d = tmp_path / "flac_corpus"
    os.makedirs(d / "wav")
    wav = (rng.uniform(-0.5, 0.5, 1234) * 32767).astype(np.int16)
    write_flac(str(d / "wav" / "u0.flac"), 8000, wav)
    write_2column_text(str(d / "wav.scp"), {"u0": str(d / "wav" / "u0.flac")})
    ds = A3TDataset(str(d), speech_only=True)
    assert ds.num_samples("u0") == 1234
    assert len(ds["u0"]["audio"]) == 1234


def test_named_source_loader_types(tmp_path, rng):
    """kaldi_ark / hdf5 / rand_float loaders (reference DATA_TYPES,
    espnet2/train/dataset.py:137)."""
    from a3t_tpu.data.dataset import NamedSourceDataset
    from a3t_tpu.data.fileio import write_2column_text
    from a3t_tpu.data.kaldi_ark import write_kaldi_ark

    d = tmp_path
    mats = {"u0": rng.standard_normal((3, 4)).astype(np.float32),
            "u1": rng.standard_normal((2, 4)).astype(np.float32)}
    scp = write_kaldi_ark(str(d / "feat.ark"), mats)
    write_2column_text(str(d / "feat.scp"), scp)

    import h5py

    with h5py.File(d / "x.h5", "w") as f:
        f["u0"] = np.arange(6, dtype=np.float32)
        f["u1"] = np.arange(3, dtype=np.float32)

    write_2column_text(str(d / "rand.scp"), {"u0": "5", "u1": "7"})

    ds = NamedSourceDataset({
        "feats": (str(d / "feat.scp"), "kaldi_ark"),
        "emb": (str(d / "x.h5"), "hdf5"),
        "noise": (str(d / "rand.scp"), "rand_float"),
    })
    assert ds.uids == ["u0", "u1"]
    item = ds["u0"]
    np.testing.assert_allclose(item["feats"], mats["u0"], atol=1e-6)
    assert item["emb"].shape == (6,)
    assert item["noise"].shape == (5,)
    # rand_float is deterministic per uid
    np.testing.assert_array_equal(item["noise"], ds["u0"]["noise"])
