"""Audio format/resample stage tests (reference mlm.sh stage 2 /
format_wav_scp.sh): polyphase resampling, data-dir formatting, and the
48 kHz-source -> 24 kHz-training fixture flow prep -> align -> train."""

import os

import numpy as np
import pytest

from a3t_tpu.data.fileio import (
    read_2column_text,
    read_wav,
    write_2column_text,
    write_wav,
)
from a3t_tpu.data.format_wav import (
    format_data_dir,
    resample,
    to_mono,
    validate_data_dir_fs,
)


def test_resample_preserves_tone_frequency():
    fs_in, fs_out, f0 = 48000, 24000, 1000.0
    t = np.arange(fs_in) / fs_in
    wav = np.sin(2 * np.pi * f0 * t).astype(np.float32)
    out = resample(wav, fs_in, fs_out)
    assert abs(len(out) - fs_out) <= 1
    spec = np.abs(np.fft.rfft(out * np.hanning(len(out))))
    peak_hz = np.argmax(spec) * fs_out / len(out)
    assert abs(peak_hz - f0) < 5.0
    # energy preserved within a few percent (band-limited signal)
    assert np.std(out) == pytest.approx(np.std(wav), rel=0.05)


def test_resample_non_integer_ratio():
    # 22.05 kHz -> 16 kHz exercises a large gcd-reduced up/down pair
    fs_in, fs_out = 22050, 16000
    wav = np.sin(2 * np.pi * 440.0 * np.arange(fs_in) / fs_in)
    out = resample(wav.astype(np.float32), fs_in, fs_out)
    assert abs(len(out) - fs_out) <= 1
    spec = np.abs(np.fft.rfft(out * np.hanning(len(out))))
    peak_hz = np.argmax(spec) * fs_out / len(out)
    assert abs(peak_hz - 440.0) < 5.0


def test_format_data_dir_resamples_and_passes_through(tmp_path):
    src = tmp_path / "src"
    os.makedirs(src)
    t48 = np.arange(4800) / 48000.0
    stereo = np.stack([np.sin(2 * np.pi * 500 * t48)] * 2, axis=1)
    write_wav(str(src / "a.wav"), 48000, np.sin(2 * np.pi * 500 * t48))
    # stereo source: formatting must downmix
    from scipy.io import wavfile

    wavfile.write(str(src / "b.wav"), 48000,
                  (stereo * 32767).astype(np.int16))
    write_2column_text(str(src / "wav.scp"),
                       {"a": str(src / "a.wav"), "b": str(src / "b.wav")})
    write_2column_text(str(src / "text"), {"a": "AH B", "b": "K D"})
    write_2column_text(str(src / "mfa_start"), {"a": "0.0 0.05",
                                                "b": "0.0 0.04"})

    out = tmp_path / "fmt"
    report = format_data_dir(str(src), str(out), 24000)
    assert report == {"n_utts": 2, "target_fs": 24000,
                      "source_fs_counts": {48000: 2}}
    scp = read_2column_text(str(out / "wav.scp"))
    for uid in ("a", "b"):
        fs, wav = read_wav(scp[uid])
        assert fs == 24000 and wav.ndim == 1
        assert abs(len(wav) - 2400) <= 1
    # seconds-valued alignments ride through unchanged
    assert read_2column_text(str(out / "mfa_start"))["a"] == "0.0 0.05"
    validate_data_dir_fs(str(out), 24000)
    with pytest.raises(ValueError, match="expects 16000"):
        validate_data_dir_fs(str(out), 16000)
    with pytest.raises(ValueError, match="!= expected"):
        format_data_dir(str(src), str(tmp_path / "f2"), 24000,
                        expected_source_fs=44100)


def test_to_mono():
    x = np.asarray([[1.0, 3.0], [2.0, 4.0]], np.float32)
    np.testing.assert_allclose(to_mono(x), [2.0, 3.0])
    np.testing.assert_allclose(to_mono(x[:, 0]), x[:, 0])


@pytest.mark.slow
def test_48k_fixture_flows_through_prep_align_train(tmp_path):
    """The round-2 VCTK gap: a 48 kHz source corpus must flow through
    format (-> 24 kHz) -> native alignment -> training without any fs
    mismatch between the data and the 24 kHz-style config."""
    import yaml

    from a3t_tpu.align import align_corpus
    from a3t_tpu.data.miniature import generate_mini_corpus

    raw = str(tmp_path / "raw")
    generate_mini_corpus(raw, n_utts=6, fs=48000)
    # drop the oracle alignments: the native aligner rebuilds them at 24 kHz
    for f in ("mfa_start", "mfa_end"):
        os.remove(os.path.join(raw, f))

    data = str(tmp_path / "fmt")
    report = format_data_dir(raw, data, 24000, expected_source_fs=48000)
    assert report["source_fs_counts"] == {48000: 6}
    validate_data_dir_fs(data, 24000)

    align_corpus(data, sample_rate=24000, n_iterations=4,
                 model_path=str(tmp_path / "aligner.bin"))
    os.replace(os.path.join(data, "mfa_text"), os.path.join(data, "text"))

    conf = {
        "train_data_dir": data,
        "valid_data_dir": data,
        "exp_dir": str(tmp_path / "exp"),
        "frontend": {"fs": 24000, "n_fft": 512, "hop_length": 240,
                     "win_length": 480, "n_mels": 40, "fmin": 20.0,
                     "fmax": 7600.0},
        "model": {
            "encoder": {"attention_dim": 32, "attention_heads": 2,
                        "linear_units": 64, "num_blocks": 1,
                        "cnn_module_kernel": 7},
            "decoder": {"attention_dim": 32, "attention_heads": 2,
                        "linear_units": 64, "num_blocks": 1,
                        "cnn_module_kernel": 7},
            "postnet_layers": 2, "postnet_chans": 16,
        },
        "optim": {"model_size": 32, "warmup_steps": 20},
        "batcher": {"batch_bins": 40 * 256 * 4, "bucket_frames": [128, 256],
                    "min_frames": 1},
        "trainer": {"max_epoch": 1, "num_iters_per_epoch": 3,
                    "keep_nbest_models": 1, "log_interval": 5},
    }
    conf_path = str(tmp_path / "config.yaml")
    with open(conf_path, "w") as f:
        yaml.safe_dump(conf, f)

    from a3t_tpu.bin.train import main as train_main

    train_main(["--config", conf_path])
    assert os.path.exists(
        os.path.join(str(tmp_path / "exp"), "checkpoints", "LATEST"))
