"""Task/config layer tests: yaml round trip, overrides, full CLI training on
the miniature corpus, model reconstruction from exp dir."""

import os

import numpy as np
import pytest
import yaml

from a3t_tpu.data.miniature import generate_mini_corpus
from a3t_tpu.tasks.config import (
    A3TTaskConfig,
    apply_overrides,
    config_from_dict,
    load_config,
    save_config,
)


def mini_config_dict(corpus, exp_dir):
    return {
        "train_data_dir": corpus,
        "valid_data_dir": corpus,
        "exp_dir": exp_dir,
        "frontend": {"fs": 8000, "n_fft": 256, "hop_length": 80,
                     "win_length": 240, "n_mels": 20, "fmin": 20.0,
                     "fmax": 4000.0},
        "model": {
            "encoder": {"attention_dim": 32, "attention_heads": 2,
                        "linear_units": 64, "num_blocks": 1,
                        "cnn_module_kernel": 7},
            "decoder": None,
            "postnet_layers": 2,
            "postnet_chans": 16,
        },
        "optim": {"model_size": 32, "warmup_steps": 10},
        "batcher": {"batch_bins": 20 * 256 * 4, "bucket_frames": [256],
                    "min_frames": 1},
        "trainer": {"max_epoch": 2, "num_iters_per_epoch": 2,
                    "keep_nbest_models": 2, "log_interval": 100},
    }


def test_config_roundtrip(tmp_path):
    cfg = config_from_dict(mini_config_dict("/d", "/e"))
    assert cfg.frontend.n_mels == 20
    assert cfg.model.decoder is None
    assert cfg.model.encoder.attention_dim == 32
    path = str(tmp_path / "c.yaml")
    save_config(cfg, path)
    cfg2 = load_config(path)
    assert cfg2 == cfg


def test_config_overrides(tmp_path):
    d = mini_config_dict("/d", "/e")
    d2 = apply_overrides(d, ["optim.lr=0.5", "trainer.max_epoch=7",
                             "model.encoder.num_blocks=3"])
    cfg = config_from_dict(d2)
    assert cfg.optim.lr == 0.5
    assert cfg.trainer.max_epoch == 7
    assert cfg.model.encoder.num_blocks == 3


def test_unknown_key_rejected():
    with pytest.raises(KeyError):
        config_from_dict({"no_such_key": 1})


@pytest.mark.slow
def test_cli_train_on_mini_corpus(tmp_path):
    corpus = generate_mini_corpus(str(tmp_path / "data"), n_utts=8, fs=8000)
    exp = str(tmp_path / "exp")
    conf_path = str(tmp_path / "mini.yaml")
    with open(conf_path, "w") as f:
        yaml.safe_dump(mini_config_dict(corpus, exp), f)

    from a3t_tpu.bin.train import main

    main(["--config", conf_path, "--log-level", "WARNING"])

    # artifacts: dumped config, tokens, checkpoints, averaged params
    assert os.path.exists(os.path.join(exp, "config.yaml"))
    assert os.path.exists(os.path.join(exp, "tokens.txt"))
    ckpts = os.listdir(os.path.join(exp, "checkpoints"))
    assert any(c.startswith("epoch_") for c in ckpts)
    assert any(c.startswith("ave_") for c in ckpts)

    # model reconstruction for inference
    from a3t_tpu.tasks import MLMTask

    model, variables, cfg, conv = MLMTask.build_model_from_dir(exp)
    assert cfg.frontend.fs == 8000
    assert "params" in variables and "sfc" in variables["params"]

    # reconstructed model runs a forward pass
    import jax.numpy as jnp
    from a3t_tpu.data.batcher import BucketBatcher
    from a3t_tpu.data.dataset import A3TDataset
    from a3t_tpu.dsp import LogMelFrontend
    from a3t_tpu.train.train_step import featurize

    ds = A3TDataset(corpus, conv)
    batcher = BucketBatcher(ds, cfg.frontend, cfg.batcher)
    batch = next(iter(batcher.epoch_iterator(0)))
    fe = LogMelFrontend(cfg.frontend)
    mb = featurize(fe, {k: jnp.asarray(v) for k, v in batch.items()},
                   use_fused=False)
    before, after, _ = model.apply(variables, **mb, train=False)
    assert np.isfinite(np.asarray(before)).all()

    # batch_decode CLI end-to-end on the trained exp (sedit_decode.py
    # analogue): middle-third mask protocol + explicit-task line
    import wave

    from a3t_tpu.bin.batch_decode import main as decode_main
    from a3t_tpu.data.fileio import read_2column_text

    texts = read_2column_text(os.path.join(corpus, "text"))
    uids = list(texts)[:2]
    task_file = str(tmp_path / "tasks.txt")
    with open(task_file, "w") as f:
        f.write(f"{uids[0]}\n")  # blank text -> protocol mask
        words = texts[uids[1]].split()
        f.write(f"{uids[1]}|" + " ".join(
            words[:1] + ["[MASK]"] + words[2:]) + "\n")
    out_dir = str(tmp_path / "decoded")
    decode_main(["--exp-dir", exp, "--data-dir", corpus,
                 "--task-file", task_file, "--out-dir", out_dir])
    for uid in uids:
        for split in ("full", "replaced", "gt_span"):
            p = os.path.join(out_dir, f"{uid}_{split}.wav")
            assert os.path.exists(p), p
            with wave.open(p) as w:
                assert w.getnframes() > 0


@pytest.mark.slow
def test_cli_train_tts_variant(tmp_path):
    """duration_predictor_layers > 0 routes through the TTS train step."""
    corpus = generate_mini_corpus(str(tmp_path / "d"), n_utts=6, fs=8000)
    exp = str(tmp_path / "exp_tts")
    d = mini_config_dict(corpus, exp)
    d["model"]["duration_predictor_layers"] = 2
    d["trainer"]["max_epoch"] = 1
    conf_path = str(tmp_path / "tts.yaml")
    with open(conf_path, "w") as f:
        yaml.safe_dump(d, f)

    from a3t_tpu.bin.train import main

    main(["--config", conf_path, "--log-level", "WARNING"])
    assert os.path.exists(os.path.join(exp, "checkpoints", "epoch_1"))


@pytest.mark.slow
def test_cli_train_multi_corpus(tmp_path):
    """Config-driven two-corpus mixture (one speech-only, other rate)."""
    c1 = generate_mini_corpus(str(tmp_path / "c1"), n_utts=6, fs=8000)
    c2 = generate_mini_corpus(str(tmp_path / "c2"), n_utts=5, fs=16000,
                              seed=7)
    exp = str(tmp_path / "exp_mc")
    d = mini_config_dict(c1, exp)
    d["trainer"]["max_epoch"] = 1
    d["trainer"]["num_iters_per_epoch"] = 4
    d["corpora"] = [
        {"name": "main", "data_dir": c1, "portion": 0.6},
        {"name": "aux", "data_dir": c2, "portion": 0.4, "speech_only": True,
         "frontend": {"fs": 16000, "n_fft": 512, "hop_length": 160,
                      "win_length": 480, "n_mels": 20, "fmin": 20.0,
                      "fmax": 7000.0}},
    ]
    conf_path = str(tmp_path / "mc.yaml")
    with open(conf_path, "w") as f:
        yaml.safe_dump(d, f)

    from a3t_tpu.bin.train import main

    main(["--config", conf_path, "--log-level", "WARNING"])
    assert os.path.exists(os.path.join(exp, "checkpoints", "epoch_1"))


@pytest.mark.slow
def test_cli_train_with_plots_and_wandb_flag(tmp_path):
    """num_plot_examples dumps validation mel plots; use_wandb degrades
    gracefully when the package is missing."""
    corpus = generate_mini_corpus(str(tmp_path / "d"), n_utts=6, fs=8000)
    exp = str(tmp_path / "exp_plots")
    d = mini_config_dict(corpus, exp)
    d["trainer"]["max_epoch"] = 1
    d["num_plot_examples"] = 1
    d["use_wandb"] = True  # wandb not installed -> warning, not a crash
    conf_path = str(tmp_path / "p.yaml")
    with open(conf_path, "w") as f:
        yaml.safe_dump(d, f)

    from a3t_tpu.bin.train import main

    main(["--config", conf_path, "--log-level", "WARNING"])
    plots = os.listdir(os.path.join(exp, "plots"))
    assert any(p.endswith(".png") for p in plots)


@pytest.mark.slow
def test_cli_train_longformer_pallas(tmp_path):
    """The long-audio path end-to-end: longformer attention with the
    Pallas banded kernel (interpret mode on CPU), config-driven."""
    corpus = generate_mini_corpus(str(tmp_path / "d"), n_utts=6, fs=8000)
    exp = str(tmp_path / "exp_lf")
    d = mini_config_dict(corpus, exp)
    d["model"]["encoder"].update(
        selfattention_layer_type="longformer", attention_window=16,
        use_pallas_attention=True, macaron_style=False,
        use_cnn_module=False, attention_dropout_rate=0.0,
        pre_speech_layers=1)
    d["batcher"]["bucket_frames"] = [256]  # multiple of half-window 8
    d["trainer"]["max_epoch"] = 1
    conf_path = str(tmp_path / "lf.yaml")
    with open(conf_path, "w") as f:
        yaml.safe_dump(d, f)

    from a3t_tpu.bin.train import main

    main(["--config", conf_path, "--log-level", "WARNING"])
    assert os.path.exists(os.path.join(exp, "checkpoints", "epoch_1"))

    # the canonical long-audio config parses
    cfg = load_config("configs/a3t_longformer_16k.yaml")
    assert cfg.model.encoder.selfattention_layer_type == "longformer"
    assert cfg.model.encoder.use_pallas_attention
    c = cfg.model.encoder.attention_window // 2
    assert all(b % c == 0 for b in cfg.batcher.bucket_frames)


@pytest.mark.slow
def test_cli_train_sequence_parallel(tmp_path):
    """Config-driven training with mesh.sequence_parallel on the CPU mesh:
    the yaml -> MeshConfig -> 3-axis mesh -> time-sharded step wiring runs
    end-to-end and checkpoints load back."""
    corpus = generate_mini_corpus(str(tmp_path / "data"), n_utts=8, fs=8000)
    exp = str(tmp_path / "exp_sp")
    conf = mini_config_dict(corpus, exp)
    conf["mesh"] = {"data_parallel": 2, "sequence_parallel": 2,
                    "tensor_parallel": 2}
    conf_path = str(tmp_path / "sp.yaml")
    with open(conf_path, "w") as f:
        yaml.safe_dump(conf, f)

    from a3t_tpu.bin.train import main

    main(["--config", conf_path, "--log-level", "WARNING"])
    assert os.path.exists(os.path.join(exp, "config.yaml"))

    from a3t_tpu.tasks import MLMTask

    model, variables, cfg, conv = MLMTask.build_model_from_dir(exp)
    assert cfg.mesh.sequence_parallel == 2
    assert "params" in variables
