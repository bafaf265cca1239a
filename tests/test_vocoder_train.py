"""Vocoder training tests: discriminator parity, STFT loss semantics,
and an end-to-end tiny training run with checkpoint round-trip."""

import os
import sys

import numpy as np
import pytest

from conftest import REFERENCE_DIR, requires_reference

from a3t_tpu.dsp.frontend import LogMelConfig
from a3t_tpu.train.vocoder import (
    VocoderTrainConfig,
    load_vocoder,
    spectral_losses,
    train_vocoder,
    upsample_scales_for_hop,
)


def test_upsample_scales_factorization():
    for hop in (200, 256, 300, 120, 160):
        scales = upsample_scales_for_hop(hop)
        assert int(np.prod(scales)) == hop
        assert all(s > 1 for s in scales)


def test_spectral_loss_zero_on_identical(rng):
    import jax.numpy as jnp

    wav = jnp.asarray(rng.standard_normal((2, 4000)).astype(np.float32))
    sc, mag = spectral_losses(wav, wav, resolutions=((512, 128, 512),))
    assert float(sc) == pytest.approx(0.0, abs=1e-5)
    assert float(mag) == pytest.approx(0.0, abs=1e-5)
    # distinct signals must produce a positive loss
    sc2, _ = spectral_losses(wav, wav * 0.5 + 0.01,
                             resolutions=((512, 128, 512),))
    assert float(sc2) > 0.01


@requires_reference
def test_pwg_discriminator_parity(rng):
    torch = pytest.importorskip("torch")
    sys.path.insert(0, REFERENCE_DIR)
    from espnet2.gan_tts.parallel_wavegan.parallel_wavegan import (
        ParallelWaveGANDiscriminator as TorchDisc,
    )

    from a3t_tpu.models.pwg import PWGDiscriminator, _fold_weight_norm

    torch.manual_seed(0)
    ref = TorchDisc(layers=5, conv_channels=8)
    ref.eval()
    # port torch weights -> flax params: Conv1d (out, in, k) -> (k, in, out)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {}
    # torch conv_layers: [conv, lrelu] * (layers-1) + final conv
    for i in range(4):
        w = _fold_weight_norm(sd, f"conv_layers.{2 * i}").transpose(2, 1, 0)
        params[f"conv_{i}"] = {"kernel": w,
                               "bias": sd[f"conv_layers.{2 * i}.bias"]}
    w = _fold_weight_norm(sd, "conv_layers.8").transpose(2, 1, 0)
    params["conv_out"] = {"kernel": w, "bias": sd["conv_layers.8.bias"]}

    disc = PWGDiscriminator(layers=5, conv_channels=8)
    x = rng.standard_normal((1, 600)).astype(np.float32)
    ours = np.asarray(disc.apply({"params": params}, x))
    theirs = ref(torch.from_numpy(x)[:, None, :]).detach().numpy()[:, 0, :]
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_train_vocoder_end_to_end(tmp_path, rng):
    # micro corpus: 4 sine-ish wavs at 8 kHz, hop 40
    fs, hop = 8000, 40
    data = tmp_path / "data"
    os.makedirs(data)
    from a3t_tpu.data.fileio import write_wav

    lines = []
    for i in range(4):
        t = np.arange(int(0.5 * fs)) / fs
        wav = (0.3 * np.sin(2 * np.pi * (150 + 40 * i) * t)
               * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)
        p = str(data / f"u{i}.wav")
        write_wav(p, fs, wav)
        lines.append(f"u{i} {p}")
    scp = str(data / "wav.scp")
    with open(scp, "w") as f:
        f.write("\n".join(lines) + "\n")

    fe = LogMelConfig(fs=fs, n_fft=128, hop_length=hop, win_length=128,
                      n_mels=10, fmin=40.0, fmax=3900.0)
    cfg = VocoderTrainConfig(
        batch_size=2, crop_frames=16, total_steps=6, disc_start_step=3,
        log_interval=2, save_interval=3, layers=4, stacks=2,
        residual_channels=8)
    out = str(tmp_path / "voc")
    train_vocoder(scp, out, fe, cfg)

    # resume picks up the saved step and runs the remaining steps
    import dataclasses

    train_vocoder(scp, out, fe, dataclasses.replace(cfg, total_steps=8))

    vocode = load_vocoder(out)
    mel = rng.standard_normal((1, 20, 10)).astype(np.float32)
    wav = vocode(mel)
    assert wav.shape == (1, 20 * hop)
    assert np.isfinite(wav).all()


def test_phase_conv_matches_dilated(rng):
    """phase_conv=True is bit-equivalent math to the plain dilated conv."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from a3t_tpu.models.pwg import ParallelWaveGANGeneratorScan, PWGConfig

    base = PWGConfig(layers=4, stacks=2, residual_channels=8,
                     gate_channels=16, skip_channels=8, aux_channels=6,
                     upsample_scales=(2, 4))
    t_feats, up = 16, 8  # t_wav = 128, max dilation 2 divides it
    mel = jnp.asarray(rng.standard_normal((1, t_feats, 6)), jnp.float32)
    z = jnp.asarray(rng.standard_normal((1, t_feats * up, 1)), jnp.float32)

    g1 = ParallelWaveGANGeneratorScan(base)
    v1 = g1.init(jax.random.PRNGKey(0), mel, z)
    out1 = g1.apply(v1, mel, z)
    g2 = ParallelWaveGANGeneratorScan(
        dataclasses.replace(base, phase_conv=True))
    out2 = g2.apply(v1, mel, z)  # same params: layout is identical
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               atol=1e-5)


def test_vocoder_corpus_cache_roundtrip(tmp_path, rng):
    """The npz corpus cache reproduces the decoded corpus exactly —
    bounded-chunk restarts reload in one flat read instead of re-decoding
    every wav and re-running the on-device mel sweep."""
    fs, hop = 8000, 40
    data = tmp_path / "data"
    os.makedirs(data)
    from a3t_tpu.data.fileio import write_wav
    from a3t_tpu.train.vocoder import VocoderData

    lines = []
    for i in range(3):
        t = np.arange(int((0.3 + 0.1 * i) * fs)) / fs
        wav = (0.3 * np.sin(2 * np.pi * (150 + 40 * i) * t)).astype(
            np.float32)
        p = str(data / f"u{i}.wav")
        write_wav(p, fs, wav)
        lines.append(f"u{i} {p}")
    scp = str(data / "wav.scp")
    with open(scp, "w") as f:
        f.write("\n".join(lines) + "\n")

    fe = LogMelConfig(fs=fs, n_fft=128, hop_length=hop, win_length=128,
                      n_mels=10, fmin=40.0, fmax=3900.0)
    cache = str(tmp_path / "corpus.npz")
    fresh = VocoderData(scp, fe, cache_path=cache)   # writes the cache
    assert os.path.exists(cache)
    cached = VocoderData(scp, fe, cache_path=cache)  # reads it back
    assert len(cached.utts) == len(fresh.utts)
    for (w0, m0), (w1, m1) in zip(fresh.utts, cached.utts):
        np.testing.assert_array_equal(w0, w1)
        np.testing.assert_array_equal(m0, m1)
    np.testing.assert_array_equal(fresh.mel_mean, cached.mel_mean)
    np.testing.assert_array_equal(fresh.mel_std, cached.mel_std)
    # identical sampling stream from both
    b0 = fresh.sample_batch(np.random.default_rng(0), 2, 8)
    b1 = cached.sample_batch(np.random.default_rng(0), 2, 8)
    np.testing.assert_array_equal(b0[0], b1[0])
    np.testing.assert_array_equal(b0[1], b1[1])
