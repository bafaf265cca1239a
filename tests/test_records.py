"""Packed-record storage: pack/read equivalence, batcher integration,
config-driven training from a record dir."""

import os

import numpy as np
import pytest

from a3t_tpu.data.dataset import A3TDataset
from a3t_tpu.data.fileio import read_2column_text
from a3t_tpu.data.miniature import generate_mini_corpus
from a3t_tpu.data.records import RecordDataset, pack_records
from a3t_tpu.text import TokenIDConverter, build_token_list


@pytest.fixture(scope="module")
def packed(tmp_path_factory):
    root = tmp_path_factory.mktemp("rec")
    corpus = generate_mini_corpus(str(root / "data"), n_utts=8, fs=8000)
    texts = read_2column_text(os.path.join(corpus, "text"))
    conv = TokenIDConverter(build_token_list(texts.values()))
    ds = A3TDataset(corpus, conv)
    out = pack_records(ds, str(root / "records"), shard_mb=1)
    conv.save(os.path.join(out, "tokens.txt"))
    return corpus, out, conv


def test_roundtrip_equivalence(packed):
    corpus, out, conv = packed
    ref = A3TDataset(corpus, conv)
    rec = RecordDataset(out)
    assert rec.uids == ref.uids
    for uid in ref.uids[:4]:
        a, b = ref[uid], rec[uid]
        assert b["fs"] == a["fs"]
        # int16 quantization bound
        np.testing.assert_allclose(b["audio"], a["audio"], atol=1.0 / 32767)
        np.testing.assert_array_equal(b["text_ids"], a["text_ids"])
        np.testing.assert_allclose(b["align_start_sec"],
                                   a["align_start_sec"], rtol=1e-6)
        assert b["phones"] == a["phones"]
        assert rec.num_samples(uid) == ref.num_samples(uid)
        assert rec.num_phones(uid) == ref.num_phones(uid)


def test_multiple_shards_created(packed):
    _, out, _ = packed
    shards = [f for f in os.listdir(out) if f.startswith("shard_")]
    assert len(shards) >= 1
    # tiny shard budget: at 8 kHz a few utts exceed 1 MB total
    total = sum(os.path.getsize(os.path.join(out, s)) for s in shards)
    assert total > 0


def test_batcher_over_records_matches_wav_batches(packed):
    from a3t_tpu.data.batcher import BatcherConfig, BucketBatcher
    from a3t_tpu.dsp import LogMelConfig

    corpus, out, conv = packed
    fe = LogMelConfig(fs=8000, n_fft=256, hop_length=80, win_length=240,
                      n_mels=20, fmin=20, fmax=4000)
    bcfg = BatcherConfig(batch_bins=20 * 256 * 4, bucket_frames=[256],
                         min_frames=1, use_native_loader=False)
    ref_b = BucketBatcher(A3TDataset(corpus, conv), fe, bcfg)
    rec_b = BucketBatcher(RecordDataset(out), fe, bcfg)
    ref_batch = next(iter(ref_b.epoch_iterator(0)))
    rec_batch = next(iter(rec_b.epoch_iterator(0)))
    assert set(ref_batch) == set(rec_batch)
    for k in ref_batch:
        assert ref_batch[k].shape == rec_batch[k].shape, k
    np.testing.assert_array_equal(ref_batch["text"], rec_batch["text"])
    np.testing.assert_allclose(ref_batch["audio"], rec_batch["audio"],
                               atol=1.0 / 32767)


@pytest.mark.slow
def test_cli_train_from_record_dir(tmp_path):
    import yaml

    from a3t_tpu.bin.pack_records import main as pack_main
    from a3t_tpu.bin.train import main as train_main
    from test_task import mini_config_dict

    corpus = generate_mini_corpus(str(tmp_path / "d"), n_utts=6, fs=8000)
    rec = str(tmp_path / "records")
    pack_main(["--data-dir", corpus, "--out", rec])
    assert os.path.exists(os.path.join(rec, "index.npz"))

    exp = str(tmp_path / "exp_rec")
    d = mini_config_dict(rec, exp)
    d["valid_data_dir"] = rec
    d["trainer"]["max_epoch"] = 1
    conf = str(tmp_path / "r.yaml")
    with open(conf, "w") as f:
        yaml.safe_dump(d, f)
    train_main(["--config", conf, "--log-level", "WARNING"])
    assert os.path.exists(os.path.join(exp, "checkpoints", "epoch_1"))


def test_pcm16_direct_batches_match_float_roundtrip(packed):
    """The int16-direct assembly (get_pcm16 straight into the int16 batch)
    must produce byte-identical batches to the float decode + re-quantize
    path it replaced."""
    from a3t_tpu.data.batcher import BatcherConfig, BucketBatcher
    from a3t_tpu.dsp import LogMelConfig

    _, out, conv = packed
    fe = LogMelConfig(fs=8000, n_fft=256, hop_length=80, win_length=240,
                      n_mels=20, fmin=20, fmax=4000)
    rec = RecordDataset(out)
    kw = dict(batch_bins=20 * 64 * 4, bucket_frames=(64, 128, 256),
              mlm_prob_factor=1.0, use_native_loader=False)
    b_direct = BucketBatcher(rec, fe, BatcherConfig(audio_int16=True, **kw))
    # force the float path by hiding get_pcm16 behind a shim dataset
    class NoPcm16:
        def __init__(self, inner):
            self._inner = inner
            self.uids = inner.uids
            self.speech_only = getattr(inner, "speech_only", False)
        def __getattr__(self, name):
            if name == "get_pcm16":
                raise AttributeError(name)
            return getattr(self._inner, name)
        def __getitem__(self, uid):
            return self._inner[uid]
    b_float = BucketBatcher(NoPcm16(rec), fe,
                            BatcherConfig(audio_int16=True, **kw))

    (bi, uids) = b_direct.batch_plan(epoch=1)[0]
    x_d = b_direct.make_batch(bi, uids, np.random.default_rng(0))
    x_f = b_float.make_batch(bi, uids, np.random.default_rng(0))
    assert x_d["audio"].dtype == np.int16 and x_f["audio"].dtype == np.int16
    for k in x_d:
        np.testing.assert_array_equal(x_d[k], x_f[k])


def test_device_audio_batches_bit_match_host_batches(packed):
    """device_audio batches (offsets + HBM-resident gather) must reproduce
    the host-assembled int16 batches bit-exactly: gather_audio slices the
    flat corpus and zero-masks beyond each utterance's length, which is
    exactly the host path's zero-padding."""
    import jax.numpy as jnp

    from a3t_tpu.data.batcher import BatcherConfig, BucketBatcher
    from a3t_tpu.dsp import LogMelConfig
    from a3t_tpu.train.train_step import featurize, gather_audio

    _, out, conv = packed
    fe_cfg = LogMelConfig(fs=8000, n_fft=256, hop_length=80, win_length=240,
                          n_mels=20, fmin=20, fmax=4000)
    rec = RecordDataset(out)
    kw = dict(batch_bins=20 * 64 * 4, bucket_frames=(64, 128, 256),
              mlm_prob_factor=1.0, use_native_loader=False)
    b_host = BucketBatcher(rec, fe_cfg, BatcherConfig(**kw))
    b_dev = BucketBatcher(rec, fe_cfg,
                          BatcherConfig(device_audio=True, **kw))
    pad = max(b.n_samples for b in b_dev.buckets)
    corpus = jnp.asarray(rec.flat_pcm(pad_samples=pad))

    for (bi, uids) in b_dev.batch_plan(epoch=1)[:3]:
        x_h = b_host.make_batch(bi, uids, np.random.default_rng(0))
        x_d = b_dev.make_batch(bi, uids, np.random.default_rng(0))
        assert "audio" not in x_d and x_d["audio_offset"].dtype == np.int32
        gathered = gather_audio(
            corpus, {k: jnp.asarray(v) for k, v in x_d.items()},
            fe_cfg.hop_length)
        np.testing.assert_array_equal(np.asarray(gathered), x_h["audio"])
        # metadata halves identical too
        for k in ("text", "text_mask", "masked_position",
                  "speech_segment_pos", "text_segment_pos",
                  "audio_lengths"):
            np.testing.assert_array_equal(x_d[k], x_h[k])


def test_device_audio_train_step_matches_host_step(packed):
    """One optimizer step through the corpus-gather path equals the host
    path bit-for-bit (same params, same rng)."""
    import jax
    import jax.numpy as jnp

    from a3t_tpu.data.batcher import BatcherConfig, BucketBatcher
    from a3t_tpu.dsp import LogMelConfig, LogMelFrontend
    from a3t_tpu.models import A3TMLMModel, A3TModelConfig, EncoderConfig
    from a3t_tpu.train import (
        OptimConfig, create_train_state, make_optimizer, make_train_step)
    from a3t_tpu.train.train_step import featurize

    _, out, conv = packed
    fe = LogMelFrontend(LogMelConfig(
        fs=8000, n_fft=256, hop_length=80, win_length=240, n_mels=20,
        fmin=20, fmax=4000))
    rec = RecordDataset(out)
    kw = dict(batch_bins=20 * 64 * 4, bucket_frames=(64, 128, 256),
              mlm_prob_factor=1.0, use_native_loader=False)
    b_host = BucketBatcher(rec, fe.config, BatcherConfig(**kw))
    b_dev = BucketBatcher(rec, fe.config,
                          BatcherConfig(device_audio=True, **kw))
    pad = max(b.n_samples for b in b_dev.buckets)
    corpus = jnp.asarray(rec.flat_pcm(pad_samples=pad))

    enc = EncoderConfig(num_blocks=1, attention_dim=32, attention_heads=2,
                        linear_units=48, cnn_module_kernel=7)
    model = A3TMLMModel(A3TModelConfig(
        vocab_size=len(conv), odim=20, encoder=enc,
        decoder=None, postnet_layers=1, postnet_chans=24))
    tx = make_optimizer(OptimConfig(warmup_steps=10))

    (bi, uids) = b_dev.batch_plan(epoch=1)[0]
    x_h = {k: jnp.asarray(v)
           for k, v in b_host.make_batch(
               bi, uids, np.random.default_rng(0)).items()}
    x_d = {k: jnp.asarray(v)
           for k, v in b_dev.make_batch(
               bi, uids, np.random.default_rng(0)).items()}

    state = create_train_state(model, tx, featurize(fe, x_h))
    step_h = make_train_step(model, fe, donate=False)
    step_d = make_train_step(model, fe, donate=False, corpus=corpus)
    rng = jax.random.PRNGKey(3)
    s_h, stats_h = step_h(state, x_h, rng)
    s_d, stats_d = step_d(state, x_d, rng)
    np.testing.assert_array_equal(np.asarray(stats_h["loss"]),
                                  np.asarray(stats_d["loss"]))
    for a, b in zip(jax.tree_util.tree_leaves(s_h.params),
                    jax.tree_util.tree_leaves(s_d.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
