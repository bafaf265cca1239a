"""Validation plot hooks: attention-map capture + dumping
(train/plots.py, the reference's att_ws plots, trainer.py:764+)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from a3t_tpu.data import make_synthetic_batch
from a3t_tpu.dsp import LogMelConfig, LogMelFrontend
from a3t_tpu.models import A3TMLMModel, A3TModelConfig, EncoderConfig


def tiny():
    hop = 64
    fe = LogMelFrontend(LogMelConfig(
        fs=8000, n_fft=256, hop_length=hop, win_length=256, n_mels=20,
        fmin=20, fmax=4000))
    enc = EncoderConfig(attention_dim=32, attention_heads=2,
                        linear_units=48, num_blocks=2, cnn_module_kernel=7,
                        use_flash_attention=False,
                        use_pallas_attention=False)
    dec = EncoderConfig(attention_dim=32, attention_heads=2,
                        linear_units=48, num_blocks=1, cnn_module_kernel=7,
                        use_flash_attention=False,
                        use_pallas_attention=False)
    cfg = A3TModelConfig(odim=20, vocab_size=30, encoder=enc, decoder=dec,
                         postnet_layers=1, postnet_chans=8)
    rng = np.random.default_rng(0)
    batch = make_synthetic_batch(rng, batch_size=2, n_samples=hop * 20,
                                 n_text=5, hop_length=hop, vocab_size=30,
                                 fs=8000)
    return A3TMLMModel(cfg), fe, batch


@pytest.mark.slow
def test_sow_captures_attention_probs():
    from a3t_tpu.train.plots import _attn_entries
    from a3t_tpu.train.train_step import featurize

    model, fe, batch = tiny()
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    mb = featurize(fe, jb, use_fused=False)
    variables = model.init(jax.random.PRNGKey(0), **mb, train=False)
    _, inter = model.apply(variables, **mb, train=False,
                           mutable=["intermediates"])
    entries = _attn_entries(jax.tree.map(np.asarray,
                                         inter["intermediates"]))
    # 2 encoder blocks + 1 decoder block
    assert len(entries) == 3
    L = mb["speech"].shape[1] + mb["text"].shape[1]
    for path, a in entries:
        assert a.shape == (2, 2, L, L)
        np.testing.assert_allclose(a.sum(-1), 1.0, atol=1e-4)


def test_attention_plot_fn_writes_pngs(tmp_path):
    from a3t_tpu.train.plots import make_attention_plot_fn
    from a3t_tpu.train.train_step import featurize

    model, fe, batch = tiny()
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = model.init(jax.random.PRNGKey(0),
                           **featurize(fe, jb, use_fused=False),
                           train=False)

    class State:
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})

    out = str(tmp_path / "plots")
    fn = make_attention_plot_fn(model, fe, None, batch, out, n_examples=2)
    fn(State, epoch=3)
    assert os.path.exists(os.path.join(out, "att_epoch3_utt0.png"))
    assert os.path.exists(os.path.join(out, "att_epoch3_utt1.png"))
