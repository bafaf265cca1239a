"""Pallas kernel tests (interpret mode on the CPU mesh)."""

import numpy as np
import pytest
import jax.numpy as jnp

from a3t_tpu.dsp import LogMelConfig, LogMelFrontend
from a3t_tpu.ops import fused_logmel


@pytest.mark.parametrize("cfg", [
    LogMelConfig(fs=16000, n_fft=1024, hop_length=200, win_length=800),
    LogMelConfig(fs=8000, n_fft=256, hop_length=80, win_length=240,
                 n_mels=20, fmin=20, fmax=4000),
])
def test_fused_logmel_matches_reference(cfg, rng):
    fe = LogMelFrontend(cfg)
    n = cfg.hop_length * 70
    audio = (rng.standard_normal((2, n)) * 0.1).astype(np.float32)
    lengths = np.array([n, n - 7 * cfg.hop_length], np.int32)

    ref, ref_l = fe(jnp.asarray(audio), jnp.asarray(lengths))
    got, got_l = fused_logmel(jnp.asarray(audio), cfg, jnp.asarray(lengths),
                              interpret=True)

    np.testing.assert_array_equal(np.asarray(got_l), np.asarray(ref_l))
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-3, rtol=1e-3)


def test_fused_logmel_frame_padding(rng):
    """Frame counts not divisible by the tile are handled."""
    cfg = LogMelConfig(fs=8000, n_fft=256, hop_length=80, win_length=240,
                       n_mels=20, fmin=20, fmax=4000)
    fe = LogMelFrontend(cfg)
    n = 80 * 37  # 38 frames, not a multiple of 64
    audio = (rng.standard_normal((1, n)) * 0.1).astype(np.float32)
    ref, _ = fe(jnp.asarray(audio))
    got, _ = fused_logmel(jnp.asarray(audio), cfg, interpret=True)
    assert got.shape == ref.shape == (1, 38, 20)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-3, rtol=1e-3)


def test_banded_attention_kernel_matches_reference(rng):
    """Pallas banded kernel vs a dense masked-attention reference."""
    import jax
    from a3t_tpu.ops.banded_attention import banded_attention

    b, h, t, d, tt, window = 2, 2, 32, 16, 8, 8
    c = window // 2
    q = rng.standard_normal((b, h, t, d)).astype(np.float32)
    k = rng.standard_normal((b, h, t, d)).astype(np.float32)
    v = rng.standard_normal((b, h, t, d)).astype(np.float32)
    kt = rng.standard_normal((b, h, tt, d)).astype(np.float32)
    vt = rng.standard_normal((b, h, tt, d)).astype(np.float32)
    tmask = np.ones((b, tt), bool)
    tmask[1, 5:] = False
    smask = np.ones((b, t), bool)
    smask[0, t - 5:] = False  # padded tail frames

    out = np.asarray(banded_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(kt),
        jnp.asarray(vt), jnp.asarray(tmask), window,
        speech_mask=jnp.asarray(smask), interpret=True))

    # dense reference: query i attends keys in chunks {ci-1, ci, ci+1} plus
    # valid text keys; padded speech keys masked
    allk = np.concatenate([k, kt], axis=2)
    allv = np.concatenate([v, vt], axis=2)
    scores = np.einsum("bhtd,bhsd->bhts", q, allk) / np.sqrt(d)
    qi = np.arange(t)[:, None] // c
    ki = np.arange(t)[None, :] // c
    band_ok = np.abs(qi - ki) <= 1  # (t, t)
    key_ok = np.concatenate(
        [np.broadcast_to(band_ok, (b, t, t)) & smask[:, None, :],
         np.broadcast_to(tmask[:, None, :], (b, t, tt))], axis=2)
    scores = np.where(key_ok[:, None], scores, -1e30)
    e = np.exp(scores - scores.max(-1, keepdims=True))
    attn = e / e.sum(-1, keepdims=True)
    ref = np.einsum("bhts,bhsd->bhtd", attn, allv)

    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_banded_attention_gradients_match_dense(rng):
    """custom_vjp backward (flash-style Pallas kernels) vs autodiff through
    a dense masked-attention reference — the training capability of the
    reference's TVM kernel (diagonaled_mm_tvm.py:8-329 has a backward)."""
    import jax
    from a3t_tpu.ops.banded_attention import banded_attention

    b, h, t, d, tt, window = 2, 2, 32, 16, 8, 8
    c = window // 2
    q = rng.standard_normal((b, h, t, d)).astype(np.float32)
    k = rng.standard_normal((b, h, t, d)).astype(np.float32)
    v = rng.standard_normal((b, h, t, d)).astype(np.float32)
    kt = rng.standard_normal((b, h, tt, d)).astype(np.float32)
    vt = rng.standard_normal((b, h, tt, d)).astype(np.float32)
    tmask = np.ones((b, tt), bool)
    tmask[1, 5:] = False
    smask = np.ones((b, t), bool)
    smask[0, t - 5:] = False
    # a fixed cotangent-inducing loss: weighted sum of (valid) outputs
    w = (rng.standard_normal((b, h, t, d)).astype(np.float32)
         * smask[:, None, :, None])

    def kernel_loss(q, k, v, kt, vt):
        out = banded_attention(q, k, v, kt, vt, jnp.asarray(tmask), window,
                               speech_mask=jnp.asarray(smask), interpret=True)
        return (out * w).sum()

    def dense_loss(q, k, v, kt, vt):
        allk = jnp.concatenate([k, kt], axis=2)
        allv = jnp.concatenate([v, vt], axis=2)
        scores = jnp.einsum("bhtd,bhsd->bhts", q, allk) / np.sqrt(d)
        qi = np.arange(t)[:, None] // c
        ki = np.arange(t)[None, :] // c
        band_ok = np.abs(qi - ki) <= 1
        key_ok = np.concatenate(
            [np.broadcast_to(band_ok, (b, t, t)) & smask[:, None, :],
             np.broadcast_to(tmask[:, None, :], (b, t, tt))], axis=2)
        scores = jnp.where(key_ok[:, None], scores, -1e30)
        attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhts,bhsd->bhtd", attn, allv)
        return (out * w).sum()

    args = tuple(jnp.asarray(x) for x in (q, k, v, kt, vt))
    got = jax.grad(kernel_loss, argnums=(0, 1, 2, 3, 4))(*args)
    ref = jax.grad(dense_loss, argnums=(0, 1, 2, 3, 4))(*args)
    for name, g_got, g_ref in zip("q k v kt vt".split(), got, ref):
        np.testing.assert_allclose(
            np.asarray(g_got), np.asarray(g_ref), atol=5e-4, rtol=1e-3,
            err_msg=f"grad mismatch for {name}")
