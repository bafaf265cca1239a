"""Windowed (Longformer-style) attention tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from a3t_tpu.models import A3TMLMModel, A3TModelConfig, EncoderConfig
from a3t_tpu.models.windowed_attention import WindowedSelfAttention


def test_windowed_matches_full_attention_semantics(rng):
    """With the band covering everything, windowed == full attention over
    valid keys (same projections)."""
    b, n_frames, n_text, d, h = 1, 8, 4, 16, 2
    x = jnp.asarray(rng.standard_normal((b, n_frames + n_text, d)),
                    jnp.float32)
    mask = jnp.ones((b, n_frames + n_text), bool)

    # window 2*n_frames: every chunk sees all speech; text is global anyway
    attn = WindowedSelfAttention(h, window=2 * n_frames)
    variables = attn.init(jax.random.PRNGKey(0), x, n_frames, mask)
    out_windowed = attn.apply(variables, x, n_frames, mask)

    # manual full attention with the same parameters
    p = variables["params"]

    def proj(name):
        w = np.asarray(p[name]["kernel"])
        bb = np.asarray(p[name]["bias"])
        return (np.asarray(x[0]) @ w + bb).reshape(n_frames + n_text, h, d // h)

    q, k, v = proj("linear_q"), proj("linear_k"), proj("linear_v")
    scores = np.einsum("thd,shd->hts", q, k) / np.sqrt(d // h)
    w_attn = np.exp(scores - scores.max(-1, keepdims=True))
    w_attn /= w_attn.sum(-1, keepdims=True)
    ref = np.einsum("hts,shd->thd", w_attn, v).reshape(-1, d)
    ref = ref @ np.asarray(p["linear_out"]["kernel"]) + np.asarray(
        p["linear_out"]["bias"])

    np.testing.assert_allclose(np.asarray(out_windowed[0]), ref, atol=2e-5)


def test_windowed_band_locality(rng):
    """A distant speech key outside the band must not influence a query."""
    b, n_frames, n_text, d, h, window = 1, 32, 4, 16, 2, 8
    x = rng.standard_normal((b, n_frames + n_text, d)).astype(np.float32)
    mask = jnp.ones((b, n_frames + n_text), bool)
    attn = WindowedSelfAttention(h, window=window)
    variables = attn.init(jax.random.PRNGKey(0), jnp.asarray(x), n_frames, mask)
    out1 = np.asarray(attn.apply(variables, jnp.asarray(x), n_frames, mask))

    x2 = x.copy()
    x2[0, 30] += 10.0  # far outside query 0's band (chunk 7 vs chunk 0)
    out2 = np.asarray(attn.apply(variables, jnp.asarray(x2), n_frames, mask))
    np.testing.assert_allclose(out1[0, 0], out2[0, 0], atol=1e-5)
    # but a text key change affects everyone (global)
    x3 = x.copy()
    x3[0, n_frames + 1] += 10.0
    out3 = np.asarray(attn.apply(variables, jnp.asarray(x3), n_frames, mask))
    assert np.abs(out3[0, 0] - out1[0, 0]).max() > 1e-4


@pytest.mark.slow
def test_longformer_model_variant(rng):
    enc = EncoderConfig(
        attention_dim=32, attention_heads=2, linear_units=64, num_blocks=1,
        cnn_module_kernel=7, selfattention_layer_type="longformer",
        attention_window=16, pre_speech_layers=1,
    )
    model = A3TMLMModel(A3TModelConfig(
        odim=8, vocab_size=20, encoder=enc, decoder=enc, postnet_layers=0))
    b, f, t = 2, 32, 6
    batch = dict(
        speech=jnp.asarray(rng.standard_normal((b, f, 8)), jnp.float32),
        text=jnp.asarray(rng.integers(0, 20, (b, t)), jnp.int32),
        masked_position=jnp.asarray(rng.random((b, f)) < 0.4),
        speech_mask=jnp.ones((b, f), bool),
        text_mask=jnp.ones((b, t), bool),
        speech_segment_pos=jnp.zeros((b, f), jnp.int32),
        text_segment_pos=jnp.zeros((b, t), jnp.int32),
    )
    variables = model.init(jax.random.PRNGKey(0), **batch, train=False)
    before, after, _ = model.apply(variables, **batch, train=False)
    assert before.shape == (b, f, 8)
    assert np.isfinite(np.asarray(before)).all()
    assert "pre_speech_encoders" in variables["params"]


@pytest.mark.slow
def test_pallas_path_matches_chunked(rng):
    """use_pallas routes the speech band through the fused kernel with
    identical results (forward + gradients) to the chunked-einsum path."""
    import jax

    b, n_frames, n_text, d_model, h, window = 2, 32, 6, 32, 2, 8
    x = rng.standard_normal((b, n_frames + n_text, d_model)).astype(np.float32)
    mask = np.ones((b, n_frames + n_text), bool)
    mask[0, n_frames - 5: n_frames] = False  # padded speech tail
    mask[1, -2:] = False                     # padded text tail

    ref_mod = WindowedSelfAttention(h, window=window)
    pal_mod = WindowedSelfAttention(h, window=window, use_pallas=True)
    variables = ref_mod.init(jax.random.PRNGKey(0), jnp.asarray(x), n_frames,
                             jnp.asarray(mask))

    def run(mod, v, xx):
        return mod.apply(v, xx, n_frames, jnp.asarray(mask),
                         deterministic=True)

    out_ref = run(ref_mod, variables, jnp.asarray(x))
    out_pal = run(pal_mod, variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_ref),
                               atol=2e-5, rtol=1e-4)

    w = rng.standard_normal(out_ref.shape).astype(np.float32)
    w = w * mask[..., None]
    from jax.flatten_util import ravel_pytree

    g_ref = jax.grad(lambda v: (run(ref_mod, v, jnp.asarray(x)) * w).sum())(
        variables)
    g_pal = jax.grad(lambda v: (run(pal_mod, v, jnp.asarray(x)) * w).sum())(
        variables)
    flat_r, _ = ravel_pytree(g_ref)
    flat_p, _ = ravel_pytree(g_pal)
    np.testing.assert_allclose(np.asarray(flat_p), np.asarray(flat_r),
                               atol=5e-4, rtol=1e-3)


def test_dilated_equals_per_phase_runs(rng):
    """dilation=d on the interleaved sequence == d independent dilation=1
    runs on the strided subsequences (shared params, shared global text) —
    the defining property of the reference TVM kernel's D stride
    (diagonaled_mm_tvm.py:241: key j attends iff j = i + D*(k - w))."""
    b, n_frames, n_text, d_model, h, window, dl = 2, 32, 5, 16, 2, 8, 2
    x = rng.standard_normal((b, n_frames + n_text, d_model)).astype(
        np.float32)
    mask = np.ones((b, n_frames + n_text), bool)
    mask[0, n_frames - 3: n_frames] = False  # padded speech tail
    mask[1, -1:] = False                     # padded text tail

    mod_dil = WindowedSelfAttention(h, window=window, dilation=dl)
    mod_ref = WindowedSelfAttention(h, window=window)
    variables = mod_dil.init(jax.random.PRNGKey(0), jnp.asarray(x), n_frames,
                             jnp.asarray(mask))

    out = np.asarray(mod_dil.apply(variables, jnp.asarray(x), n_frames,
                                   jnp.asarray(mask)))

    # manual: run each phase subsequence (with the text block) separately
    expect_sp = np.zeros((b, n_frames, d_model), np.float32)
    for r in range(dl):
        keep = np.arange(r, n_frames, dl)
        xr = np.concatenate([x[:, keep], x[:, n_frames:]], axis=1)
        mr = np.concatenate([mask[:, keep], mask[:, n_frames:]], axis=1)
        out_r = np.asarray(mod_ref.apply(variables, jnp.asarray(xr),
                                         len(keep), jnp.asarray(mr)))
        expect_sp[:, keep] = out_r[:, : len(keep)]
    np.testing.assert_allclose(out[:, :n_frames], expect_sp,
                               atol=2e-5, rtol=1e-4)

    # text queries see everything in both formulations
    out_full = np.asarray(mod_ref.apply(variables, jnp.asarray(x), n_frames,
                                        jnp.asarray(mask)))
    np.testing.assert_allclose(out[:, n_frames:], out_full[:, n_frames:],
                               atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_pallas_dilated_matches_chunked(rng):
    """The Pallas kernel under phase decomposition (forward + grads)."""
    b, n_frames, n_text, d_model, h, window, dl = 1, 64, 6, 32, 2, 8, 2
    x = rng.standard_normal((b, n_frames + n_text, d_model)).astype(
        np.float32)
    mask = np.ones((b, n_frames + n_text), bool)
    mask[0, n_frames - 7: n_frames] = False

    ref_mod = WindowedSelfAttention(h, window=window, dilation=dl)
    pal_mod = WindowedSelfAttention(h, window=window, dilation=dl,
                                    use_pallas=True)
    variables = ref_mod.init(jax.random.PRNGKey(0), jnp.asarray(x), n_frames,
                             jnp.asarray(mask))

    def run(mod, v):
        return mod.apply(v, jnp.asarray(x), n_frames, jnp.asarray(mask),
                         deterministic=True)

    out_ref = run(ref_mod, variables)
    out_pal = run(pal_mod, variables)
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_ref),
                               atol=2e-5, rtol=1e-4)

    from jax.flatten_util import ravel_pytree

    w = rng.standard_normal(out_ref.shape).astype(np.float32)
    w = w * mask[..., None]
    g_ref = jax.grad(lambda v: (run(ref_mod, v) * w).sum())(variables)
    g_pal = jax.grad(lambda v: (run(pal_mod, v) * w).sum())(variables)
    flat_r, _ = ravel_pytree(g_ref)
    flat_p, _ = ravel_pytree(g_pal)
    np.testing.assert_allclose(np.asarray(flat_p), np.asarray(flat_r),
                               atol=5e-4, rtol=1e-3)


def test_banded_kernel_dropout_statistics(rng):
    """In-kernel attention dropout on the Pallas path: ~rate of the
    probability mass is dropped, kept entries scale by 1/keep, and the
    mask is identical between two applications with the same rng."""
    from a3t_tpu.ops.banded_attention import banded_attention

    b, h, t, d, tt, window = 1, 2, 64, 16, 8, 16
    q = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32) * 0.1
    k = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32) * 0.1
    v = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    kt = jnp.asarray(rng.standard_normal((b, h, tt, d)), jnp.float32) * 0.1
    vt = jnp.asarray(rng.standard_normal((b, h, tt, d)), jnp.float32)
    tm = jnp.ones((b, tt), bool)

    base = banded_attention(q, k, v, kt, vt, tm, window)
    rate = 0.3
    outs = [banded_attention(q, k, v, kt, vt, tm, window,
                             dropout_rate=rate,
                             dropout_rng=jax.random.PRNGKey(5))
            for _ in range(2)]
    # deterministic under the same rng
    np.testing.assert_allclose(np.asarray(outs[0]), np.asarray(outs[1]))
    # different rng -> different mask
    other = banded_attention(q, k, v, kt, vt, tm, window,
                             dropout_rate=rate,
                             dropout_rng=jax.random.PRNGKey(6))
    assert not np.allclose(np.asarray(outs[0]), np.asarray(other))
    # unbiased in expectation: averaging many seeds approaches the exact out
    many = np.mean([np.asarray(banded_attention(
        q, k, v, kt, vt, tm, window, dropout_rate=rate,
        dropout_rng=jax.random.PRNGKey(100 + i))) for i in range(48)], axis=0)
    corr = np.corrcoef(many.ravel(), np.asarray(base).ravel())[0, 1]
    assert corr > 0.98, corr


def test_banded_kernel_dropout_backward(rng):
    """Gradients flow through the in-kernel dropout and regenerate the
    same mask: grad of sum(out) matches finite differences on a param."""
    from a3t_tpu.ops.banded_attention import banded_attention

    b, h, t, d, tt, window = 1, 1, 32, 8, 8, 16
    q = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32) * 0.2
    k = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32) * 0.2
    v = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    kt = jnp.asarray(rng.standard_normal((b, h, tt, d)), jnp.float32) * 0.2
    vt = jnp.asarray(rng.standard_normal((b, h, tt, d)), jnp.float32)
    tm = jnp.ones((b, tt), bool)
    key = jax.random.PRNGKey(3)

    def f(q_, k_, v_, kt_, vt_):
        return banded_attention(q_, k_, v_, kt_, vt_, tm, window,
                                dropout_rate=0.25, dropout_rng=key).sum()

    val, grads = jax.value_and_grad(f, argnums=(0, 1, 2, 3, 4))(
        q, k, v, kt, vt)
    assert np.isfinite(float(val))
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
    # directional finite difference on v (dropout mask fixed by the rng):
    # f is linear in v, so the gradient is exact
    dv = jnp.asarray(rng.standard_normal(v.shape), jnp.float32)
    eps = 1e-2
    fd = (f(q, k, v + eps * dv, kt, vt) - f(q, k, v - eps * dv, kt, vt)) \
        / (2 * eps)
    analytic = (np.asarray(grads[2]) * np.asarray(dv)).sum()
    np.testing.assert_allclose(float(fd), float(analytic), rtol=5e-3)
