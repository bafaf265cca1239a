"""Model forward/backward/shape tests (tiny configs, CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from a3t_tpu.models import A3TMLMModel, A3TModelConfig, EncoderConfig
from a3t_tpu.models.attention import legacy_rel_shift
from a3t_tpu.models.mlm import mlm_loss


def tiny_config(**kw):
    enc = EncoderConfig(
        attention_dim=32, attention_heads=2, linear_units=64, num_blocks=2,
        cnn_module_kernel=7, dropout_rate=0.1, positional_dropout_rate=0.1,
        attention_dropout_rate=0.1,
    )
    dec = EncoderConfig(
        attention_dim=32, attention_heads=2, linear_units=64, num_blocks=2,
        cnn_module_kernel=7,
    )
    defaults = dict(odim=8, vocab_size=20, encoder=enc, decoder=dec,
                    postnet_layers=2, postnet_chans=16, postnet_filts=5)
    defaults.update(kw)
    return A3TModelConfig(**defaults)


def make_batch(rng, b=2, f=24, t=6, odim=8):
    align = np.linspace(0, f, t + 1).astype(np.int32)
    batch = dict(
        speech=rng.standard_normal((b, f, odim)).astype(np.float32),
        text=rng.integers(0, 20, (b, t)).astype(np.int32),
        masked_position=(rng.random((b, f)) < 0.5),
        speech_mask=np.ones((b, f), bool),
        text_mask=np.ones((b, t), bool),
        speech_segment_pos=np.repeat(
            np.arange(1, t + 1), np.diff(align)
        )[None].repeat(b, 0).astype(np.int32),
        text_segment_pos=np.arange(1, t + 1)[None].repeat(b, 0).astype(np.int32),
    )
    return {k: jnp.asarray(v) for k, v in batch.items()}


def test_legacy_rel_shift_matches_reference_semantics(rng):
    """Emulate torch's pad/view/slice dance with raw numpy indexing."""
    b, h, t1, t2 = 1, 2, 5, 5
    x = rng.standard_normal((b, h, t1, t2)).astype(np.float32)
    got = np.asarray(legacy_rel_shift(jnp.asarray(x)))

    padded = np.concatenate([np.zeros((b, h, t1, 1), np.float32), x], axis=-1)
    ref = padded.reshape(b, h, t1 * (t2 + 1))[:, :, t1:].reshape(b, h, t1, t2)
    # reference: view(b,h,t2+1,t1)[:, :, 1:] == flat[t1:]
    np.testing.assert_allclose(got, ref)


@pytest.mark.slow
def test_forward_shapes_and_loss(rng):
    cfg = tiny_config()
    model = A3TMLMModel(cfg)
    batch = make_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), **batch, train=False)
    before, after, log_d = model.apply(variables, **batch, train=False)
    assert before.shape == (2, 24, 8)
    assert after.shape == (2, 24, 8)
    assert log_d is None
    loss = mlm_loss(before, after, batch["speech"], batch["masked_position"])
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_train_mode_runs_with_dropout_and_batchstats(rng):
    cfg = tiny_config()
    model = A3TMLMModel(cfg)
    batch = make_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), **batch, train=False)

    def loss_fn(params):
        (before, after, _), updates = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            **batch, train=True,
            rngs={"dropout": jax.random.PRNGKey(1)},
            mutable=["batch_stats"],
        )
        return mlm_loss(before, after, batch["speech"], batch["masked_position"])

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # the mask embedding must receive gradient (it feeds masked frames)
    g_mask = grads["speech_masked_input"]["mask_feature"]
    assert np.abs(np.asarray(g_mask)).max() > 0


def test_no_decoder_variant(rng):
    cfg = tiny_config(decoder=None)
    model = A3TMLMModel(cfg)
    batch = make_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), **batch, train=False)
    before, after, _ = model.apply(variables, **batch, train=False)
    assert before.shape == (2, 24, 8)


def test_speech_only_mode(rng):
    cfg = tiny_config()
    model = A3TMLMModel(cfg)
    batch = make_batch(rng, t=1)
    batch["text"] = jnp.ones_like(batch["text"])  # sentinel token
    variables = model.init(jax.random.PRNGKey(0), **batch, train=False,
                           speech_only=True)
    before, _, _ = model.apply(variables, **batch, train=False, speech_only=True)
    assert before.shape == (2, 24, 8)


def test_masked_input_replaces_frames(rng):
    from a3t_tpu.models.layers import MaskedInput

    layer = MaskedInput(4)
    x = jnp.asarray(rng.standard_normal((1, 6, 4)).astype(np.float32))
    mask = jnp.asarray(np.array([[1, 1, 0, 0, 1, 0]], bool))
    variables = layer.init(jax.random.PRNGKey(0), x, mask)
    out = layer.apply(variables, x, mask)
    emb = variables["params"]["mask_feature"][0, 0]
    np.testing.assert_allclose(out[0, 0], emb)
    np.testing.assert_allclose(out[0, 2], x[0, 2])


def test_mlm_loss_only_counts_masked(rng):
    b, f, d = 1, 8, 4
    target = jnp.zeros((b, f, d))
    pred = jnp.ones((b, f, d))
    mask = jnp.asarray(np.array([[1, 1, 0, 0, 0, 0, 0, 0]], bool))
    # L1 per frame = d = 4 (before only)
    loss = mlm_loss(pred, None, target, mask)
    np.testing.assert_allclose(float(loss), 4.0, rtol=1e-6)
    # before + after doubles it
    loss2 = mlm_loss(pred, pred, target, mask)
    np.testing.assert_allclose(float(loss2), 8.0, rtol=1e-6)


def test_duration_predictor_variant(rng):
    cfg = tiny_config(duration_predictor_layers=2)
    model = A3TMLMModel(cfg)
    batch = make_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), **batch, train=False)
    before, after, log_d = model.apply(variables, **batch, train=False)
    assert log_d.shape == (2, 24)
    from a3t_tpu.models.layers import duration_loss
    dl = duration_loss(log_d, jnp.ones((2, 24), jnp.int32))
    assert np.isfinite(np.asarray(dl)).all()


@pytest.mark.slow
def test_remat_equivalence(rng):
    """remat=True must be numerically identical to remat=False."""
    import dataclasses

    enc = EncoderConfig(attention_dim=32, attention_heads=2, linear_units=64,
                        num_blocks=2, cnn_module_kernel=7)
    cfg_plain = tiny_config(encoder=enc, decoder=None)
    cfg_remat = tiny_config(
        encoder=dataclasses.replace(enc, remat=True), decoder=None)
    batch = make_batch(rng)

    m1 = A3TMLMModel(cfg_plain)
    v1 = m1.init(jax.random.PRNGKey(0), **batch, train=False)
    out1, _, _ = m1.apply(v1, **batch, train=False)

    m2 = A3TMLMModel(cfg_remat)
    v2 = m2.init(jax.random.PRNGKey(0), **batch, train=False)
    out2, _, _ = m2.apply(v2, **batch, train=False)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)

    # gradients flow through the rematerialized blocks
    def loss(p):
        b, a, _ = m2.apply(
            {"params": p, "batch_stats": v2["batch_stats"]}, **batch,
            train=True, rngs={"dropout": jax.random.PRNGKey(1)},
            mutable=["batch_stats"])[0]
        return mlm_loss(b, a, batch["speech"], batch["masked_position"])

    g = jax.grad(loss)(v2["params"])
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(g))


def test_shifted_conv_ffn_matches_conv():
    """conv1d_shifted is a lowering choice, not a model change: identical
    parameter tree (checkpoint/TP-rule compatible) and identical outputs
    to the nn.Conv formulation."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from a3t_tpu.models.layers import MultiLayeredConv1d

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 17, 24)), jnp.float32)
    conv = MultiLayeredConv1d(48, 3, 0.0)
    shift = MultiLayeredConv1d(48, 3, 0.0, shifted=True)
    v1 = conv.init(jax.random.PRNGKey(0), x, deterministic=True)
    v2 = shift.init(jax.random.PRNGKey(0), x, deterministic=True)
    # same param names/shapes, bit-identical init (same scope rng paths)
    p1 = jax.tree_util.tree_leaves_with_path(v1)
    p2 = jax.tree_util.tree_leaves_with_path(v2)
    assert [k for k, _ in p1] == [k for k, _ in p2]
    for (_, a), (_, b) in zip(p1, p2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    y1 = conv.apply(v1, x, deterministic=True)
    y2 = shift.apply(v1, x, deterministic=True)  # conv params, shifted math
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("k", [7, 31])
def test_shifted_depthwise_conv_module_matches_conv(k):
    """cnn_module_shifted is a lowering choice, not a model change:
    identical parameter tree and outputs to the grouped-conv formulation
    for both production kernel sizes (enc k=7, dec k=31)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from a3t_tpu.models.layers import ConvolutionModule

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 40, 24)), jnp.float32)
    conv = ConvolutionModule(k)
    shift = ConvolutionModule(k, shifted=True)
    v1 = conv.init(jax.random.PRNGKey(0), x, train=False)
    v2 = shift.init(jax.random.PRNGKey(0), x, train=False)
    p1 = jax.tree_util.tree_leaves_with_path(v1)
    p2 = jax.tree_util.tree_leaves_with_path(v2)
    assert [kp for kp, _ in p1] == [kp for kp, _ in p2]
    for (_, a), (_, b) in zip(p1, p2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    y1 = conv.apply(v1, x, train=False)
    y2 = shift.apply(v1, x, train=False)  # conv params, shifted math
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=2e-5, atol=2e-5)
