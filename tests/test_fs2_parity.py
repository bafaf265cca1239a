"""Golden parity: espnet2 FastSpeech2 (torch, from the reference repo) vs
the flax FastSpeech2 with converted weights — the pretrained-duration-
predictor path that drives speech editing (sedit_inference.py:391-424)."""

import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from conftest import REFERENCE_DIR, requires_reference

torch = pytest.importorskip("torch")

IDIM, ODIM, ADIM = 30, 12, 32
SPK_DIM = 8


@pytest.fixture(scope="module")
def torch_fs2():
    sys.path.insert(0, REFERENCE_DIR)
    if "editdistance" not in sys.modules:
        stub = types.ModuleType("editdistance")
        stub.eval = lambda a, b: 0
        sys.modules["editdistance"] = stub
    from espnet2.tts.fastspeech2.fastspeech2 import FastSpeech2 as TorchFS2

    torch.manual_seed(0)
    m = TorchFS2(
        idim=IDIM, odim=ODIM, adim=ADIM, aheads=2, elayers=1, eunits=64,
        dlayers=1, dunits=64, postnet_layers=2, postnet_chans=16,
        duration_predictor_chans=16, pitch_predictor_chans=16,
        energy_predictor_chans=16,
        transformer_enc_dropout_rate=0.0,
        transformer_enc_positional_dropout_rate=0.0,
        transformer_enc_attn_dropout_rate=0.0,
        transformer_dec_dropout_rate=0.0,
        transformer_dec_positional_dropout_rate=0.0,
        transformer_dec_attn_dropout_rate=0.0,
        duration_predictor_dropout_rate=0.0,
        pitch_predictor_dropout=0.0, energy_predictor_dropout=0.0,
        pitch_embed_dropout=0.0, energy_embed_dropout=0.0,
        postnet_dropout_rate=0.0,
        use_gst=True, gst_tokens=4, gst_heads=2,
        gst_conv_chans_list=(4, 8), gst_conv_layers=2, gst_gru_units=16,
        spk_embed_dim=SPK_DIM, spk_embed_integration_type="add",
        positionwise_layer_type="conv1d", positionwise_conv_kernel_size=1,
        use_scaled_pos_enc=True,
    )
    m.eval()
    return m


def _jax_fs2():
    from a3t_tpu.models.fastspeech2 import (
        FastSpeech2, FastSpeech2Config, transformer_stack_config)

    enc = transformer_stack_config(adim=ADIM, aheads=2, layers=1, units=64,
                                   dropout=0.0)
    return FastSpeech2(FastSpeech2Config(
        idim=IDIM, odim=ODIM, adim=ADIM, encoder=enc, decoder=enc,
        postnet_layers=2, postnet_chans=16, duration_predictor_chans=16,
        variance_predictor_chans=16, variance_dropout=0.0,
        use_gst=True, gst_tokens=4, gst_heads=2,
        gst_conv_chans_list=(4, 8), gst_gru_units=16, spk_embed_dim=SPK_DIM,
        spk_embed_integration_type="add", max_feat_len=64,
        use_scaled_pos_enc=True,
    ))


@requires_reference
def test_duration_prediction_parity(torch_fs2, rng):
    """The exact path sedit uses: encoder + GST + x-vector -> durations."""
    from a3t_tpu.compat.fs2_import import convert_fs2_state

    t_len = 7
    text = rng.integers(1, IDIM - 1, t_len)
    speech = rng.standard_normal((40, ODIM)).astype(np.float32)
    spembs = rng.standard_normal(SPK_DIM).astype(np.float32)

    # torch: mirror duration_predict (sedit_inference.py:398-424)
    tt = torch.from_numpy(np.concatenate([text, [IDIM - 1]]))[None]
    ilens = torch.tensor([t_len + 1])
    with torch.no_grad():
        x_masks = torch_fs2._source_mask(ilens)
        hs, _ = torch_fs2.encoder(tt, x_masks)
        style = torch_fs2.gst(torch.from_numpy(speech)[None])
        hs = hs + style.unsqueeze(1)
        hs = torch_fs2._integrate_with_spk_embed(
            hs, torch.from_numpy(spembs)[None])
        from espnet.nets.pytorch_backend.nets_utils import make_pad_mask

        d_masks = make_pad_mask(ilens)
        ref_d = torch_fs2.duration_predictor.inference(hs, d_masks)[0].numpy()
        ref_hs = hs[0].numpy()

    model = _jax_fs2()
    variables = convert_fs2_state(torch_fs2.state_dict())
    jt = jnp.asarray(np.concatenate([text, [IDIM - 1]])[None], jnp.int32)
    jmask = jnp.ones_like(jt, bool)
    hs_jax = model.apply(
        variables, jt, jmask, speech=jnp.asarray(speech[None]),
        spembs=jnp.asarray(spembs[None]), method=model.encode_hidden)
    np.testing.assert_allclose(np.asarray(hs_jax)[0], ref_hs, atol=2e-4,
                               rtol=1e-3)
    d_jax = model.apply(
        variables, jt, jmask, speech=jnp.asarray(speech[None]),
        spembs=jnp.asarray(spembs[None]), method=model.predict_durations)
    np.testing.assert_array_equal(np.asarray(d_jax)[0], ref_d)


@requires_reference
def test_conformer_duration_prediction_parity(rng):
    """Conformer FS2 (the published gst+xvector duration predictors,
    sedit_inference.py:32-36) through the same path."""
    sys.path.insert(0, REFERENCE_DIR)
    from espnet2.tts.fastspeech2.fastspeech2 import FastSpeech2 as TorchFS2
    from espnet.nets.pytorch_backend.nets_utils import make_pad_mask

    from a3t_tpu.compat.fs2_import import convert_fs2_state, espnet_fs2_config
    from a3t_tpu.models.fastspeech2 import FastSpeech2

    torch.manual_seed(1)
    tts_conf = dict(
        adim=ADIM, aheads=2, elayers=2, eunits=64, dlayers=1, dunits=64,
        postnet_layers=0, duration_predictor_chans=16,
        pitch_predictor_layers=3, pitch_predictor_chans=16,
        energy_predictor_layers=2, energy_predictor_chans=16,
        pitch_embed_kernel_size=1, energy_embed_kernel_size=1,
        positionwise_layer_type="conv1d", positionwise_conv_kernel_size=3,
        encoder_type="conformer", decoder_type="conformer",
        conformer_pos_enc_layer_type="rel_pos",
        conformer_self_attn_layer_type="rel_selfattn",
        use_macaron_style_in_conformer=True, use_cnn_in_conformer=True,
        conformer_enc_kernel_size=7, conformer_dec_kernel_size=7,
        use_gst=True, gst_tokens=4, gst_heads=2, spk_embed_dim=SPK_DIM,
        spk_embed_integration_type="add",
        transformer_enc_dropout_rate=0.0,
        transformer_enc_positional_dropout_rate=0.0,
        transformer_enc_attn_dropout_rate=0.0,
        transformer_dec_dropout_rate=0.0,
        transformer_dec_positional_dropout_rate=0.0,
        transformer_dec_attn_dropout_rate=0.0,
    )
    m = TorchFS2(idim=IDIM, odim=ODIM,
                 gst_conv_chans_list=(4, 8), gst_conv_layers=2,
                 gst_gru_units=16,
                 duration_predictor_dropout_rate=0.0,
                 pitch_predictor_dropout=0.0, energy_predictor_dropout=0.0,
                 pitch_embed_dropout=0.0, energy_embed_dropout=0.0,
                 **tts_conf)
    m.eval()

    t_len = 7
    text = rng.integers(1, IDIM - 1, t_len)
    speech = rng.standard_normal((40, ODIM)).astype(np.float32)
    spembs = rng.standard_normal(SPK_DIM).astype(np.float32)

    tt = torch.from_numpy(np.concatenate([text, [IDIM - 1]]))[None]
    ilens = torch.tensor([t_len + 1])
    with torch.no_grad():
        x_masks = m._source_mask(ilens)
        hs, _ = m.encoder(tt, x_masks)
        style = m.gst(torch.from_numpy(speech)[None])
        hs = hs + style.unsqueeze(1)
        hs = m._integrate_with_spk_embed(hs, torch.from_numpy(spembs)[None])
        d_masks = make_pad_mask(ilens)
        ref_d = m.duration_predictor.inference(hs, d_masks)[0].numpy()

    cfg = espnet_fs2_config(tts_conf, idim=IDIM, odim=ODIM)
    cfg = cfg.__class__(**{
        **{f.name: getattr(cfg, f.name)
           for f in __import__("dataclasses").fields(cfg)},
        "gst_conv_chans_list": (4, 8), "gst_gru_units": 16,
        "max_feat_len": 64})
    model = FastSpeech2(cfg)
    variables = convert_fs2_state(m.state_dict())
    jt = jnp.asarray(np.concatenate([text, [IDIM - 1]])[None], jnp.int32)
    jmask = jnp.ones_like(jt, bool)
    d_jax = model.apply(
        variables, jt, jmask, speech=jnp.asarray(speech[None]),
        spembs=jnp.asarray(spembs[None]), method=model.predict_durations)
    np.testing.assert_array_equal(np.asarray(d_jax)[0], ref_d)


@requires_reference
def test_teacher_forced_synthesis_parity(torch_fs2, rng):
    """Full forward with given durations/pitch/energy matches."""
    from a3t_tpu.compat.fs2_import import convert_fs2_state

    t_len = 6
    text = np.concatenate([rng.integers(1, IDIM - 1, t_len), [IDIM - 1]])
    durs = rng.integers(1, 5, t_len + 1).astype(np.int64)
    pitch = rng.standard_normal((t_len + 1, 1)).astype(np.float32)
    energy = rng.standard_normal((t_len + 1, 1)).astype(np.float32)
    speech = rng.standard_normal((40, ODIM)).astype(np.float32)
    spembs = rng.standard_normal(SPK_DIM).astype(np.float32)
    total = int(durs.sum())

    with torch.no_grad():
        before, after, *_ = torch_fs2._forward(
            xs=torch.from_numpy(text)[None],
            ilens=torch.tensor([t_len + 1]),
            ys=torch.from_numpy(speech)[None],  # GST reference mel
            ds=torch.from_numpy(durs)[None],
            ps=torch.from_numpy(pitch)[None],
            es=torch.from_numpy(energy)[None],
            spembs=torch.from_numpy(spembs)[None],
            is_inference=False,
        )
    ref_before = before[0].numpy()

    model = _jax_fs2()
    variables = convert_fs2_state(torch_fs2.state_dict())
    out = model.apply(
        variables,
        jnp.asarray(text[None], jnp.int32),
        jnp.ones((1, t_len + 1), bool),
        speech=jnp.asarray(speech[None]),
        spembs=jnp.asarray(spembs[None]),
        durations=jnp.asarray(durs[None], jnp.int32),
        pitch=jnp.asarray(pitch[None]),
        energy=jnp.asarray(energy[None]),
        train=False,
    )
    got = np.asarray(out["before"])[0, :total]
    np.testing.assert_allclose(got, ref_before[:total], atol=5e-4, rtol=1e-3)
