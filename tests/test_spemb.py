"""Speaker (x-vector) conditioning of the MLM model.

The reference MLM accepts ``spembs`` but never uses them
(sedit_model.py:246); the TPU rebuild makes the conditioning real
(A3TModelConfig.spemb_dim) because the 16-speaker soak measured that
speaker identity cannot be inferred from short unmasked context
(docs/QUALITY.md).  These tests cover: the model path, the batcher field,
task-level training from a spk2xvector npz, warm-start with a new module,
and the editor's leak-free context-only extraction.
"""

import dataclasses
import os

import numpy as np
import pytest
import yaml

import jax
import jax.numpy as jnp

from a3t_tpu.data.miniature import generate_mini_corpus
from a3t_tpu.models.conformer import EncoderConfig
from a3t_tpu.models.mlm import A3TMLMModel, A3TModelConfig


def _tiny_cfg(spemb_dim=0):
    return A3TModelConfig(
        odim=8,
        vocab_size=12,
        encoder=EncoderConfig(attention_dim=16, attention_heads=2,
                              linear_units=32, num_blocks=1,
                              cnn_module_kernel=7),
        decoder=None,
        postnet_layers=0,
        spemb_dim=spemb_dim,
    )


def _tiny_inputs(rng, b=2, f=12, t=6):
    return dict(
        speech=jnp.asarray(rng.normal(size=(b, f, 8)).astype(np.float32)),
        text=jnp.asarray(rng.integers(0, 12, (b, t)).astype(np.int32)),
        masked_position=jnp.asarray(rng.random((b, f)) < 0.5),
        speech_mask=jnp.ones((b, f), bool),
        text_mask=jnp.ones((b, t), bool),
        speech_segment_pos=jnp.asarray(
            rng.integers(0, t, (b, f)).astype(np.int32)),
        text_segment_pos=jnp.asarray(
            np.tile(np.arange(1, t + 1, dtype=np.int32), (b, 1))),
    )


def test_spemb_changes_output_and_none_is_zero_vector(rng):
    model = A3TMLMModel(_tiny_cfg(spemb_dim=5))
    inputs = _tiny_inputs(rng)
    se_a = jnp.asarray(rng.normal(size=(2, 5)).astype(np.float32))
    se_b = jnp.asarray(rng.normal(size=(2, 5)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), **inputs)
    out_a = model.apply(variables, **inputs, spemb=se_a)[0]
    out_b = model.apply(variables, **inputs, spemb=se_b)[0]
    out_none = model.apply(variables, **inputs)[0]
    out_zero = model.apply(
        variables, **inputs, spemb=jnp.zeros((2, 5)))[0]
    assert not np.allclose(out_a, out_b)
    # omitted embedding == zero embedding (graceful no-enrolment path)
    np.testing.assert_allclose(out_none, out_zero, atol=1e-6)
    # conditioning is norm-invariant (L2-normalized before projection)
    out_scaled = model.apply(variables, **inputs, spemb=3.0 * se_a)[0]
    np.testing.assert_allclose(out_a, out_scaled, atol=1e-5)


def test_spemb_dim_zero_adds_no_params(rng):
    inputs = _tiny_inputs(rng)
    p0 = A3TMLMModel(_tiny_cfg(0)).init(jax.random.PRNGKey(0), **inputs)
    p1 = A3TMLMModel(_tiny_cfg(5)).init(jax.random.PRNGKey(0), **inputs)
    assert "spemb_proj" not in p0["params"]
    assert "spemb_proj" in p1["params"]


def test_batcher_emits_spemb(tmp_path, rng):
    from a3t_tpu.data.batcher import BatcherConfig, BucketBatcher
    from a3t_tpu.data.dataset import A3TDataset
    from a3t_tpu.dsp import LogMelConfig
    from a3t_tpu.text import TokenIDConverter, build_token_list
    from a3t_tpu.data.fileio import read_2column_text

    corpus = generate_mini_corpus(str(tmp_path / "d"), n_utts=6, fs=8000)
    texts = read_2column_text(os.path.join(corpus, "text"))
    conv = TokenIDConverter(build_token_list(texts.values()))
    ds = A3TDataset(corpus, conv)
    spemb_map = {u: rng.normal(size=4).astype(np.float32) for u in ds.uids}
    fe = LogMelConfig(fs=8000, n_fft=256, hop_length=80, win_length=240,
                      n_mels=20)
    b = BucketBatcher(
        ds, fe, BatcherConfig(batch_bins=20 * 256 * 4, bucket_frames=[256],
                              min_frames=1),
        spemb_map=spemb_map)
    bi, uids = b.batch_plan(0)[0]
    batch = b.make_batch(bi, uids, np.random.default_rng(0))
    assert batch["spemb"].shape[1] == 4
    np.testing.assert_allclose(batch["spemb"][0], spemb_map[uids[0]])
    # padded slots are zero
    if batch["spemb"].shape[0] > len(uids):
        assert np.all(batch["spemb"][len(uids):] == 0)


@pytest.mark.slow
def test_task_trains_with_spemb_and_warm_start(tmp_path):
    """End-to-end: spk2xvector-keyed training, then warm-starting a
    conditioned model from an unconditioned stash (allow_missing)."""
    from a3t_tpu.bin.train import main as train_main
    from a3t_tpu.train.checkpoint import restore_portable, warm_start_params

    corpus = generate_mini_corpus(str(tmp_path / "data"), n_utts=8, fs=8000)
    spk2xv = {f"spk{i}": np.random.default_rng(i).normal(
        size=6).astype(np.float32) for i in range(3)}
    xv_path = str(tmp_path / "spk2xvector.npz")
    np.savez(xv_path, **spk2xv)

    def conf(exp, spemb):
        d = {
            "train_data_dir": corpus,
            "exp_dir": exp,
            "frontend": {"fs": 8000, "n_fft": 256, "hop_length": 80,
                         "win_length": 240, "n_mels": 20, "fmin": 20.0,
                         "fmax": 4000.0},
            "model": {
                "encoder": {"attention_dim": 32, "attention_heads": 2,
                            "linear_units": 64, "num_blocks": 1,
                            "cnn_module_kernel": 7},
                "decoder": None,
                "postnet_layers": 0,
            },
            "optim": {"model_size": 32, "warmup_steps": 10},
            "batcher": {"batch_bins": 20 * 256 * 4,
                        "bucket_frames": [256], "min_frames": 1},
            "trainer": {"max_epoch": 1, "num_iters_per_epoch": 2,
                        "keep_nbest_models": 1, "log_interval": 100},
        }
        if spemb:
            d["model"]["spemb_dim"] = 6
            d["spemb_file"] = xv_path
        return d

    # (a) conditioned training runs and checkpoints carry spemb_proj
    exp1 = str(tmp_path / "exp_spemb")
    p1 = str(tmp_path / "c1.yaml")
    with open(p1, "w") as f:
        yaml.safe_dump(conf(exp1, spemb=True), f)
    train_main(["--config", p1])
    tree = restore_portable(os.path.join(exp1, "checkpoints", "epoch_1"))
    assert "spemb_proj" in tree["params"]

    # (b) unconditioned stash -> conditioned model needs allow_missing
    exp0 = str(tmp_path / "exp_plain")
    p0 = str(tmp_path / "c0.yaml")
    with open(p0, "w") as f:
        yaml.safe_dump(conf(exp0, spemb=False), f)
    train_main(["--config", p0])
    stash = os.path.join(exp0, "checkpoints", "epoch_1")

    template = jax.tree_util.tree_map(np.asarray, tree["params"])
    with pytest.raises(ValueError, match="allow_missing"):
        warm_start_params(template, stash)
    merged = warm_start_params(template, stash, allow_missing=True)
    loaded = restore_portable(stash)["params"]
    np.testing.assert_allclose(
        np.asarray(merged["sfc"]["kernel"]),
        np.asarray(loaded["sfc"]["kernel"]))
    # the new module keeps the template's fresh init
    np.testing.assert_allclose(
        np.asarray(merged["spemb_proj"]["kernel"]),
        np.asarray(template["spemb_proj"]["kernel"]))
    # reverse direction (checkpoint has params the model lacks) still raises
    plain_template = {k: v for k, v in template.items()
                      if k != "spemb_proj"}
    with pytest.raises(ValueError, match="model lacks"):
        warm_start_params(plain_template, os.path.join(
            exp1, "checkpoints", "epoch_1"))


def test_editor_extracts_context_only_spemb(tmp_path, rng):
    """The editor's spemb_fn must see a frame mask excluding the edit span."""
    from a3t_tpu.data.dataset import A3TDataset
    from a3t_tpu.data.fileio import read_2column_text
    from a3t_tpu.dsp import LogMelConfig
    from a3t_tpu.inference import FileAlignmentSource, SpeechEditor
    from a3t_tpu.text import TokenIDConverter, build_token_list

    corpus = generate_mini_corpus(str(tmp_path / "d"), n_utts=2, fs=8000)
    texts = read_2column_text(os.path.join(corpus, "text"))
    conv = TokenIDConverter(build_token_list(texts.values()))
    ds = A3TDataset(corpus, conv)
    aligner = FileAlignmentSource(corpus)

    cfg = dataclasses.replace(_tiny_cfg(spemb_dim=5), odim=20,
                              vocab_size=len(conv))
    model = A3TMLMModel(cfg)
    inputs = _tiny_inputs(rng)
    inputs["speech"] = jnp.zeros((2, 12, 20))
    variables = model.init(jax.random.PRNGKey(0), **inputs)

    calls = []

    def spemb_fn(audio, ctx_mask):
        calls.append((np.asarray(audio), np.asarray(ctx_mask)))
        return np.ones(5, np.float32)

    fe = LogMelConfig(fs=8000, n_fft=256, hop_length=80, win_length=240,
                      n_mels=20)
    editor = SpeechEditor(model, variables, fe, conv,
                          lexicon={p.upper(): [p] for t in texts.values()
                                   for p in t.split()},
                          spemb_fn=spemb_fn)
    uid = ds.uids[0]
    words = texts[uid].split()
    masked = " ".join([words[0], "[MASK]"] + words[3:])
    res = editor.reconstruct_masked_span(
        ds[uid]["audio"], aligner(uid), texts[uid], masked)
    assert calls, "spemb_fn was never invoked"
    _, ctx = calls[0]
    s, e = res.new_span_boundary
    assert not ctx[s:e].any(), "masked span leaked into x-vector pooling"
    assert ctx[:s].any(), "no context frames pooled"


def test_editor_explicit_spemb_overrides_extractor(tmp_path, rng):
    """An explicit spemb (the reference's spk2xvector lookup,
    sedit_inference.py:203-210) must bypass the context extractor."""
    from a3t_tpu.data.dataset import A3TDataset
    from a3t_tpu.data.fileio import read_2column_text
    from a3t_tpu.dsp import LogMelConfig
    from a3t_tpu.inference import FileAlignmentSource, SpeechEditor
    from a3t_tpu.text import TokenIDConverter, build_token_list

    corpus = generate_mini_corpus(str(tmp_path / "d"), n_utts=2, fs=8000)
    texts = read_2column_text(os.path.join(corpus, "text"))
    conv = TokenIDConverter(build_token_list(texts.values()))
    ds = A3TDataset(corpus, conv)
    aligner = FileAlignmentSource(corpus)

    cfg = dataclasses.replace(_tiny_cfg(spemb_dim=5), odim=20,
                              vocab_size=len(conv))
    model = A3TMLMModel(cfg)
    inputs = _tiny_inputs(rng)
    inputs["speech"] = jnp.zeros((2, 12, 20))
    variables = model.init(jax.random.PRNGKey(0), **inputs)

    calls = []

    def spemb_fn(audio, ctx_mask):
        calls.append(1)
        return np.ones(5, np.float32)

    fe = LogMelConfig(fs=8000, n_fft=256, hop_length=80, win_length=240,
                      n_mels=20)
    editor = SpeechEditor(model, variables, fe, conv,
                          lexicon={p.upper(): [p] for t in texts.values()
                                   for p in t.split()},
                          spemb_fn=spemb_fn)
    uid = ds.uids[0]
    words = texts[uid].split()
    masked = " ".join([words[0], "[MASK]"] + words[3:])
    xv = np.full(5, 0.3, np.float32)
    res = editor.reconstruct_masked_span(
        ds[uid]["audio"], aligner(uid), texts[uid], masked, spemb=xv)
    assert not calls, "explicit spemb must bypass the extractor"
    assert res.prediction.size > 0
    # distinct embeddings must change the generated span (conditioning
    # actually reaches the network, not just the input dict)
    res2 = editor.reconstruct_masked_span(
        ds[uid]["audio"], aligner(uid), texts[uid], masked,
        spemb=np.full(5, -0.9, np.float32))
    s, e = res.new_span_boundary
    assert not np.allclose(res.mel_edited[s:e], res2.mel_edited[s:e])
