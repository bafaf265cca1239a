"""FS2Task training + duration-fn wiring into speech editing.

Covers VERDICT round-1 item 5: the --duration-model CLI path (trained
a3t_tpu FS2 exp dir as the duration predictor for text replacement)."""

import os

import numpy as np
import pytest
import jax

from a3t_tpu.data.miniature import generate_mini_corpus


# the module fixture trains a model: whole file is slow-tier
pytestmark = pytest.mark.slow

@pytest.fixture(scope="module")
def fs2_exp(tmp_path_factory):
    """Train a tiny FastSpeech2 for 1 epoch on the mini corpus."""
    import dataclasses

    from a3t_tpu.dsp import LogMelConfig
    from a3t_tpu.models.fastspeech2 import (
        FastSpeech2Config, transformer_stack_config)
    from a3t_tpu.tasks.fs2 import FS2Batcher, FS2BatcherConfig, FS2Task, \
        FS2TaskConfig
    from a3t_tpu.train import OptimConfig, TrainerConfig

    root = tmp_path_factory.mktemp("fs2")
    corpus = generate_mini_corpus(str(root / "data"), n_utts=6, fs=8000)
    exp = str(root / "exp")

    enc = transformer_stack_config(adim=16, aheads=2, layers=1, units=32,
                                   dropout=0.0)
    cfg = FS2TaskConfig(
        train_data_dir=corpus,
        exp_dir=exp,
        frontend=LogMelConfig(fs=8000, n_fft=256, hop_length=80,
                              win_length=240, n_mels=20, fmin=20, fmax=4000),
        model=FastSpeech2Config(
            adim=16, encoder=enc, decoder=enc, postnet_layers=0,
            duration_predictor_chans=8, variance_predictor_chans=8,
            variance_dropout=0.0, max_feat_len=128),
        batcher=FS2BatcherConfig(batch_size=2, text_buckets=(16,),
                                 max_feat_len=128),
        optim=OptimConfig(model_size=16, warmup_steps=10),
        trainer=TrainerConfig(max_epoch=1, num_iters_per_epoch=None,
                              keep_nbest_models=1, log_interval=100,
                              best_model_criterion=("train", "loss", "min"),
                              average_nbest_at_end=False),
    )
    FS2Task.run(cfg)
    return exp, corpus


def test_fs2_exp_dir_layout(fs2_exp):
    exp, _ = fs2_exp
    assert os.path.exists(os.path.join(exp, "config.yaml"))
    assert os.path.exists(os.path.join(exp, "tokens.txt"))
    assert os.path.exists(os.path.join(exp, "checkpoints", "epoch_1"))


def test_fs2_config_roundtrip(fs2_exp):
    exp, _ = fs2_exp
    from a3t_tpu.tasks.config import _build, load_yaml_dict
    from a3t_tpu.tasks.fs2 import FS2TaskConfig

    cfg = _build(FS2TaskConfig, load_yaml_dict(
        os.path.join(exp, "config.yaml")))
    assert cfg.model.adim == 16
    assert cfg.frontend.fs == 8000
    assert cfg.batcher.batch_size == 2


def test_load_duration_fn_from_exp_dir(fs2_exp):
    exp, corpus = fs2_exp
    from a3t_tpu.data.fileio import read_2column_text
    from a3t_tpu.inference import load_duration_fn

    duration_fn = load_duration_fn(exp, which="epoch_1")
    texts = read_2column_text(os.path.join(corpus, "text"))
    uid, text = next(iter(texts.items()))
    phones = text.split()
    wav = np.random.default_rng(0).standard_normal(8000).astype(np.float32)
    secs = duration_fn(phones, wav)
    assert len(secs) == len(phones)
    assert all(s >= 0 for s in secs)
    # frames -> seconds scaling: durations are multiples of hop/fs
    assert all(abs(s / (80 / 8000) - round(s / (80 / 8000))) < 1e-6
               for s in secs)


def test_editor_with_trained_duration_fn(fs2_exp):
    """Full wiring: text replacement driven by FS2-predicted durations."""
    exp, corpus = fs2_exp
    from a3t_tpu.data.dataset import A3TDataset
    from a3t_tpu.data.fileio import read_2column_text
    from a3t_tpu.dsp import LogMelConfig
    from a3t_tpu.inference import (
        FileAlignmentSource, SpeechEditor, load_duration_fn)
    from a3t_tpu.models import A3TMLMModel, A3TModelConfig, EncoderConfig
    from a3t_tpu.text import TokenIDConverter, build_token_list
    import jax.numpy as jnp

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

    phone_lex = {p.upper(): [p] for t_ in texts.values() for p in t_.split()}
    editor = SpeechEditor(
        model, variables, fe_cfg, conv,
        duration_fn=load_duration_fn(exp, which="epoch_1"),
        lexicon=phone_lex)

    ds = A3TDataset(corpus, conv)
    aligner = FileAlignmentSource(corpus)
    uid = ds.uids[0]
    wav = ds[uid]["audio"]
    old_str = texts[uid]
    words = old_str.split()
    replacement = ["AA", "IY"] if words[2] != "AA" else ["IY", "AA"]
    new_str = " ".join(words[:2] + replacement + words[3:])
    # a 1-epoch duration predictor may legitimately predict near-zero
    # durations; floor it so the edit regenerates a non-empty span while
    # still exercising the trained-model wiring
    raw_fn = editor.duration_fn
    editor.duration_fn = lambda ph, w: [max(s, 0.05)
                                        for s in raw_fn(ph, w)]
    res = editor.edit(wav, aligner(uid), old_str, new_str)
    assert np.isfinite(res.prediction).all()
    assert res.new_span_boundary[1] > res.new_span_boundary[0]


def test_batch_decode_with_fs2_baselines(fs2_exp, tmp_path):
    """batch_decode --fs2-exp emits baseline1/2/3 wavs next to the sedit
    splits (aggregate_output/sedit_decode.py:39-98 analogue)."""
    import wave

    import yaml

    exp_fs2, corpus = fs2_exp
    from a3t_tpu.bin.batch_decode import main as decode_main
    from a3t_tpu.bin.train import main as train_main
    from a3t_tpu.data.fileio import read_2column_text

    exp_mlm = str(tmp_path / "exp_mlm")
    conf = {
        "train_data_dir": corpus, "valid_data_dir": corpus,
        "exp_dir": exp_mlm,
        "frontend": {"fs": 8000, "n_fft": 256, "hop_length": 80,
                     "win_length": 240, "n_mels": 20, "fmin": 20.0,
                     "fmax": 4000.0},
        "model": {"encoder": {"attention_dim": 32, "attention_heads": 2,
                              "linear_units": 64, "num_blocks": 1,
                              "cnn_module_kernel": 7},
                  "decoder": None, "postnet_layers": 0},
        "optim": {"model_size": 32, "warmup_steps": 10},
        "batcher": {"batch_bins": 20 * 256 * 4, "bucket_frames": [256],
                    "min_frames": 1},
        "trainer": {"max_epoch": 1, "num_iters_per_epoch": 2,
                    "keep_nbest_models": 1, "log_interval": 100},
    }
    conf_path = str(tmp_path / "mlm.yaml")
    with open(conf_path, "w") as f:
        yaml.safe_dump(conf, f)
    train_main(["--config", conf_path, "--log-level", "WARNING"])

    texts = read_2column_text(os.path.join(corpus, "text"))
    uids = list(texts)[:2]
    task_file = str(tmp_path / "tasks.txt")
    with open(task_file, "w") as f:
        f.write(f"{uids[0]}\n")  # blank -> middle-third protocol mask
        words = texts[uids[1]].split()
        f.write(f"{uids[1]}|" + " ".join(
            words[:1] + ["[MASK]"] + words[2:]) + "\n")
    out_dir = str(tmp_path / "decoded")
    decode_main(["--exp-dir", exp_mlm, "--data-dir", corpus,
                 "--task-file", task_file, "--out-dir", out_dir,
                 "--fs2-exp", exp_fs2, "--fs2-checkpoint", "epoch_1"])
    for uid in uids:
        for split in ("full", "replaced", "gt_span",
                      "baseline1", "baseline2", "baseline3"):
            p = os.path.join(out_dir, f"{uid}_{split}.wav")
            assert os.path.exists(p), p
            with wave.open(p) as w:
                assert w.getnframes() > 0
