"""Golden parity vs the reference PyTorch implementation.

Builds the reference ESPnetMLMEncAsDecoderModel (imported live from
/root/reference, CPU torch), converts its randomly-initialized weights with
a3t_tpu.compat, and checks the full forward pass and the masked-L1 loss
agree to float32 tolerance.  This is the strongest correctness evidence the
rebuild has: same inputs, same weights, same outputs.
"""

import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from conftest import requires_reference, REFERENCE_DIR

torch = pytest.importorskip("torch")

B, F, T = 2, 24, 6
ODIM, VOCAB, ADIM = 8, 20, 32


def _torch_conf(cnn_kernel=7):
    return dict(
        attention_dim=ADIM,
        attention_heads=2,
        linear_units=64,
        num_blocks=2,
        dropout_rate=0.0,
        positional_dropout_rate=0.0,
        attention_dropout_rate=0.0,
        normalize_before=True,
        macaron_style=True,
        use_cnn_module=True,
        cnn_module_kernel=cnn_kernel,
        selfattention_layer_type="legacy_rel_selfattn",
        pos_enc_layer_type="legacy_rel_pos",
        positionwise_layer_type="conv1d",
        positionwise_conv_kernel_size=3,
        activation_type="swish",
    )


@pytest.fixture(scope="module")
def reference_model():
    sys.path.insert(0, REFERENCE_DIR)
    # stub optional deps the reference imports at module level but that the
    # exercised code paths never call
    import types

    if "editdistance" not in sys.modules:
        stub = types.ModuleType("editdistance")
        stub.eval = lambda a, b: 0
        sys.modules["editdistance"] = stub
    from espnet.nets.pytorch_backend.conformer.encoder import MLMEncoder, MLMDecoder
    from espnet2.tts.sedit.sedit_model import ESPnetMLMEncAsDecoderModel

    torch.manual_seed(0)
    encoder = MLMEncoder(
        ODIM, vocab_size=VOCAB, input_layer="sega_mlm", **_torch_conf(7)
    )
    decoder = MLMDecoder(0, input_layer=None, **_torch_conf(7))
    model = ESPnetMLMEncAsDecoderModel(
        token_list=[str(i) for i in range(VOCAB)],
        odim=ODIM,
        feats_extract=None,
        normalize=None,
        encoder=encoder,
        decoder=decoder,
        postnet_layers=2,
        postnet_chans=16,
        postnet_filts=5,
        report_cer=False,
        report_wer=False,
        masking_schema="phn_span",
        mean_phn_span=8,
        mlm_prob=0.8,
    )
    model.eval()
    return model


def _jax_model():
    from a3t_tpu.models import A3TMLMModel, A3TModelConfig, EncoderConfig

    enc = EncoderConfig(
        attention_dim=ADIM, attention_heads=2, linear_units=64, num_blocks=2,
        cnn_module_kernel=7, dropout_rate=0.0, positional_dropout_rate=0.0,
        attention_dropout_rate=0.0,
    )
    return A3TMLMModel(A3TModelConfig(
        odim=ODIM, vocab_size=VOCAB, encoder=enc, decoder=enc,
        postnet_layers=2, postnet_chans=16, postnet_filts=5,
    ))


def _batch(rng):
    align = np.linspace(0, F, T + 1).astype(np.int64)
    ssp = np.repeat(np.arange(1, T + 1), np.diff(align))
    batch = dict(
        speech=rng.standard_normal((B, F, ODIM)).astype(np.float32),
        text=rng.integers(0, VOCAB, (B, T)),
        masked_position=(rng.random((B, F)) < 0.4),
        speech_mask=np.concatenate(
            [np.ones((1, F), bool),
             np.concatenate([np.ones((1, F - 4), bool),
                             np.zeros((1, 4), bool)], axis=1)]
        ),
        text_mask=np.ones((B, T), bool),
        speech_segment_pos=np.tile(ssp, (B, 1)),
        text_segment_pos=np.tile(np.arange(1, T + 1), (B, 1)),
    )
    return batch


@requires_reference
def test_full_forward_parity(reference_model, rng):
    from a3t_tpu.compat import convert_model_state

    np_batch = _batch(rng)

    tb = {
        "speech_pad": torch.from_numpy(np_batch["speech"]),
        "text_pad": torch.from_numpy(np_batch["text"]),
        "masked_position": torch.from_numpy(np_batch["masked_position"]),
        "speech_mask": torch.from_numpy(np_batch["speech_mask"][:, None, :]),
        "text_mask": torch.from_numpy(np_batch["text_mask"][:, None, :]),
        "speech_segment_pos": torch.from_numpy(np_batch["speech_segment_pos"]),
        "text_segment_pos": torch.from_numpy(np_batch["text_segment_pos"]),
    }
    with torch.no_grad():
        ref_before, ref_after, _, _ = reference_model._forward(
            tb, tb["speech_segment_pos"]
        )

    variables = convert_model_state(reference_model.state_dict())
    model = _jax_model()
    jb = {k: jnp.asarray(v) for k, v in np_batch.items()}
    jb["text"] = jb["text"].astype(jnp.int32)
    before, after, _ = model.apply(variables, **jb, train=False)

    np.testing.assert_allclose(
        np.asarray(before), ref_before.numpy(), atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(after), ref_after.numpy(), atol=2e-4, rtol=1e-3
    )


@requires_reference
def test_loss_parity(reference_model, rng):
    from a3t_tpu.compat import convert_model_state
    from a3t_tpu.models.mlm import mlm_loss

    np_batch = _batch(rng)
    variables = convert_model_state(reference_model.state_dict())
    model = _jax_model()
    jb = {k: jnp.asarray(v) for k, v in np_batch.items()}
    jb["text"] = jb["text"].astype(jnp.int32)
    before, after, _ = model.apply(variables, **jb, train=False)

    with torch.no_grad():
        ref_loss, _ = reference_model._calc_mlm_loss(
            torch.from_numpy(np.asarray(before)),
            torch.from_numpy(np.asarray(after)),
            torch.from_numpy(np_batch["speech"]),
            torch.from_numpy(np_batch["masked_position"]),
        )
    mine = mlm_loss(before, after, jb["speech"], jb["masked_position"])
    np.testing.assert_allclose(float(mine), float(ref_loss), rtol=1e-5)


@requires_reference
def test_param_count_matches(reference_model):
    from a3t_tpu.compat import convert_model_state

    variables = convert_model_state(reference_model.state_dict())
    n_ref = sum(p.numel() for p in reference_model.parameters())
    n_mine = sum(
        x.size for x in jax.tree_util.tree_leaves(variables["params"])
    )
    assert n_mine == n_ref


@requires_reference
def test_converted_tree_matches_init_structure(reference_model, rng):
    """Converted param tree must be structurally identical to a fresh init."""
    from a3t_tpu.compat import convert_model_state

    np_batch = _batch(rng)
    jb = {k: jnp.asarray(v) for k, v in np_batch.items()}
    jb["text"] = jb["text"].astype(jnp.int32)
    model = _jax_model()
    init_vars = model.init(jax.random.PRNGKey(0), **jb, train=False)
    conv_vars = convert_model_state(reference_model.state_dict())

    init_paths = {
        jax.tree_util.keystr(p): v.shape
        for p, v in jax.tree_util.tree_flatten_with_path(init_vars["params"])[0]
    }
    conv_paths = {
        jax.tree_util.keystr(p): np.shape(v)
        for p, v in jax.tree_util.tree_flatten_with_path(conv_vars["params"])[0]
    }
    assert init_paths == conv_paths


@requires_reference
def test_load_espnet_a3t_exp_dir(reference_model, rng, tmp_path):
    """The published-checkpoint loading path: .pth + espnet config.yaml ->
    (model, variables, frontend, tokens), forward-parity with torch."""
    import yaml

    from a3t_tpu.compat.torch_import import load_espnet_a3t

    ckpt = str(tmp_path / "train.loss.ave_5best.pth")
    torch.save(reference_model.state_dict(), ckpt)
    espnet_cfg = dict(
        token_list=[str(i) for i in range(VOCAB)],
        encoder="conformer",
        encoder_conf=dict(input_layer="sega_mlm", **_torch_conf(7)),
        decoder="conformer",
        decoder_conf=_torch_conf(7),
        model_conf=dict(lsm_weight=0.1, postnet_layers=2, postnet_chans=16,
                        postnet_filts=5, mlm_prob=0.8, mean_phn_span=8),
        feats_extract_conf=dict(fs=8000, n_fft=256, hop_length=80,
                                win_length=240, n_mels=ODIM, fmin=20,
                                fmax=4000),
    )
    with open(tmp_path / "config.yaml", "w") as f:
        yaml.safe_dump(espnet_cfg, f)

    model, variables, fe_cfg, conv = load_espnet_a3t(ckpt)
    assert fe_cfg.fs == 8000 and fe_cfg.n_mels == ODIM
    assert len(conv) == VOCAB
    # the config translation must pick the legacy rel-pos fallback
    assert model.config.encoder.selfattention_layer_type == \
        "legacy_rel_selfattn"

    np_batch = _batch(rng)
    tb = {
        "speech_pad": torch.from_numpy(np_batch["speech"]),
        "text_pad": torch.from_numpy(np_batch["text"]),
        "masked_position": torch.from_numpy(np_batch["masked_position"]),
        "speech_mask": torch.from_numpy(np_batch["speech_mask"][:, None, :]),
        "text_mask": torch.from_numpy(np_batch["text_mask"][:, None, :]),
        "speech_segment_pos": torch.from_numpy(
            np_batch["speech_segment_pos"]),
        "text_segment_pos": torch.from_numpy(np_batch["text_segment_pos"]),
    }
    with torch.no_grad():
        ref_before, ref_after, _, _ = reference_model._forward(
            tb, tb["speech_segment_pos"])
    jb = {k: jnp.asarray(v) for k, v in np_batch.items()}
    jb["text"] = jb["text"].astype(jnp.int32)
    before, after, _ = model.apply(variables, **jb, train=False)
    np.testing.assert_allclose(
        np.asarray(before), ref_before.numpy(), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(after), ref_after.numpy(), atol=2e-4, rtol=1e-3)
