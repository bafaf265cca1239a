"""Vocoder tests: PWG generator parity vs the reference torch implementation,
Griffin-Lim reconstruction quality."""

import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from conftest import REFERENCE_DIR, requires_reference

torch = pytest.importorskip("torch")

from a3t_tpu.models.pwg import (  # noqa: E402
    ParallelWaveGANGenerator,
    PWGConfig,
    convert_pwg_state,
)

SMALL = PWGConfig(
    layers=6, stacks=2, residual_channels=8, gate_channels=16,
    skip_channels=8, aux_channels=10, aux_context_window=2,
    upsample_scales=(2, 3),
)


@requires_reference
def test_pwg_generator_parity(rng):
    sys.path.insert(0, REFERENCE_DIR)
    from espnet2.gan_tts.parallel_wavegan.parallel_wavegan import (
        ParallelWaveGANGenerator as TorchPWG,
    )

    torch.manual_seed(0)
    ref = TorchPWG(
        layers=SMALL.layers, stacks=SMALL.stacks,
        residual_channels=SMALL.residual_channels,
        gate_channels=SMALL.gate_channels, skip_channels=SMALL.skip_channels,
        aux_channels=SMALL.aux_channels,
        aux_context_window=SMALL.aux_context_window,
        upsample_params={"upsample_scales": list(SMALL.upsample_scales)},
    )
    ref.eval()

    t_feats = 11
    up = SMALL.upsample_factor
    mel = rng.standard_normal((1, t_feats, SMALL.aux_channels)).astype(np.float32)
    z = rng.standard_normal((1, t_feats * up, 1)).astype(np.float32)

    with torch.no_grad():
        ref_wav = ref(
            torch.from_numpy(mel.transpose(0, 2, 1)),
            torch.from_numpy(z.transpose(0, 2, 1)),
        ).numpy()[:, 0]

    variables = convert_pwg_state(ref.state_dict(), SMALL)
    gen = ParallelWaveGANGenerator(SMALL)
    wav = gen.apply(variables, jnp.asarray(mel), z=jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(wav), ref_wav, atol=2e-5, rtol=1e-4)


def test_pwg_shapes_and_noise_path(rng):
    gen = ParallelWaveGANGenerator(SMALL)
    mel = jnp.asarray(rng.standard_normal((2, 7, SMALL.aux_channels)), jnp.float32)
    variables = gen.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, mel)
    wav = gen.apply(variables, mel, rngs={"noise": jax.random.PRNGKey(2)})
    assert wav.shape == (2, 7 * SMALL.upsample_factor)
    assert np.isfinite(np.asarray(wav)).all()


def test_griffin_lim_reconstructs_tone(rng):
    from a3t_tpu.dsp import LogMelConfig, LogMelFrontend
    from a3t_tpu.dsp.griffin_lim import logmel_to_wav

    cfg = LogMelConfig(fs=8000, n_fft=512, hop_length=128, win_length=512,
                       n_mels=80, fmin=20, fmax=4000)
    fe = LogMelFrontend(cfg)
    t = np.arange(128 * 40) / 8000
    x = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)[None]
    mel, _ = fe(jnp.asarray(x))
    wav = np.asarray(logmel_to_wav(mel, cfg, n_iters=16))[0]

    # the dominant frequency of the reconstruction matches the input
    spec = np.abs(np.fft.rfft(wav[1000:5000] * np.hanning(4000)))
    freq = np.fft.rfftfreq(4000, 1 / 8000)[np.argmax(spec)]
    # tolerance = mel-bin quantization of the pseudo-inverse
    assert abs(freq - 440.0) < 40.0
