"""FastSpeech2 (JAX/flax) — non-autoregressive TTS with variance adaptors.

Rebuild of the reference FastSpeech2 (espnet2/tts/fastspeech2/fastspeech2.py:
40-842) which the A3T inference stack uses in two roles:

* duration prediction for new/edited phones (sedit_inference.py:398-424:
  encoder -> optional GST style embedding -> optional x-vector integration
  -> duration_predictor.inference), and
* a baseline TTS for comparisons (get_baseline1/2/3).

TPU-first differences: the length regulator is a static-shape gather
(cumulative-duration searchsorted) instead of per-utterance python repeats,
so synthesis jits with a fixed ``max_feat_len``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from a3t_tpu.models.dropout import SeededDropout

from a3t_tpu.models.conformer import (
    AbsPosEncoding,
    ConformerStack,
    EncoderConfig,
    RelPosEncoding,
)
from a3t_tpu.models.gst import StyleEncoder
from a3t_tpu.models.layers import (
    DurationPredictor,
    Postnet,
    duration_loss as dp_loss,
    normal_init,
    xavier,
    zeros,
)


def transformer_stack_config(
    adim=384, aheads=4, layers=6, units=1536, dropout=0.1,
    positionwise_layer_type="conv1d", positionwise_conv_kernel_size=1,
) -> EncoderConfig:
    """Plain transformer expressed as a ConformerStack config
    (macaron/conv off, absolute-positional self-attention)."""
    return EncoderConfig(
        attention_dim=adim, attention_heads=aheads, linear_units=units,
        num_blocks=layers, dropout_rate=dropout,
        positional_dropout_rate=dropout, attention_dropout_rate=dropout,
        macaron_style=False, use_cnn_module=False,
        positionwise_layer_type=positionwise_layer_type,
        positionwise_conv_kernel_size=positionwise_conv_kernel_size,
        selfattention_layer_type="selfattn",
    )


@dataclasses.dataclass(frozen=True)
class FastSpeech2Config:
    idim: int = 100  # vocab (eos = idim - 1, pad = 0)
    odim: int = 80
    adim: int = 384
    encoder: EncoderConfig = transformer_stack_config()
    decoder: EncoderConfig = transformer_stack_config()
    encoder_conformer: bool = False  # True: conformer enc/dec (rel-pos)
    use_scaled_pos_enc: bool = True
    postnet_layers: int = 5
    postnet_chans: int = 512
    postnet_filts: int = 5
    duration_predictor_layers: int = 2
    duration_predictor_chans: int = 384
    duration_predictor_kernel: int = 3
    variance_predictor_layers: int = 2
    variance_predictor_chans: int = 384
    variance_predictor_kernel: int = 3
    variance_embed_kernel: int = 9
    variance_dropout: float = 0.5
    # per-predictor overrides (None -> variance_* defaults); the published
    # gst+xvector conformer FS2 uses a 5-layer pitch predictor with
    # kernel-1 embeds (train_gst+xvector_conformer_fastspeech2.yaml:54-66)
    pitch_predictor_layers: Optional[int] = None
    pitch_predictor_chans: Optional[int] = None
    pitch_predictor_kernel: Optional[int] = None
    pitch_embed_kernel: Optional[int] = None
    energy_predictor_layers: Optional[int] = None
    energy_predictor_chans: Optional[int] = None
    energy_predictor_kernel: Optional[int] = None
    energy_embed_kernel: Optional[int] = None
    use_gst: bool = False
    gst_tokens: int = 10
    gst_heads: int = 4
    gst_conv_chans_list: tuple = (32, 32, 64, 64, 128, 128)
    gst_gru_units: int = 128
    spk_embed_dim: Optional[int] = None
    spk_embed_integration_type: str = "add"  # "add" | "concat"
    max_feat_len: int = 2048  # static synthesis length cap


class VariancePredictor(nn.Module):
    """Pitch/energy predictor (variance_predictor.py): conv+relu+LN+dropout
    stack + linear -> (B, T, 1)."""

    n_layers: int = 2
    n_chans: int = 384
    kernel_size: int = 3
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(self, x, pad_mask=None, deterministic: bool = True):
        h = x
        for _ in range(self.n_layers):
            h = nn.Conv(self.n_chans, (self.kernel_size,), padding="SAME",
                        kernel_init=xavier(), bias_init=zeros)(h)
            h = nn.relu(h)
            h = nn.LayerNorm(epsilon=1e-5)(h)
            h = SeededDropout(self.dropout_rate)(h, deterministic=deterministic)
        out = nn.Dense(1, kernel_init=xavier(), bias_init=zeros)(h)
        if pad_mask is not None:
            out = jnp.where(pad_mask[..., None], 0.0, out)
        return out


def length_regulate(hs, durations, max_len: int):
    """Static-shape length regulator.

    hs: (B, T, D); durations: (B, T) int. Output (B, max_len, D) where
    output frame t copies hs[i] with cum_dur[i-1] <= t < cum_dur[i]; frames
    beyond total duration are zero.  Matches
    espnet/nets/pytorch_backend/fastspeech/length_regulator.py semantics
    (repeat_interleave) with XLA-friendly gathers.
    """
    cum = jnp.cumsum(durations, axis=1)  # (B, T)
    t_idx = jnp.arange(max_len)[None, :]  # (1, L)
    # index of the phone covering frame t = #cum_entries <= t
    src = (t_idx[:, :, None] >= cum[:, None, :]).sum(-1)  # (B, L)
    total = cum[:, -1:]
    valid = t_idx < total
    src = jnp.clip(src, 0, hs.shape[1] - 1)
    out = jnp.take_along_axis(hs, src[..., None], axis=1)
    return jnp.where(valid[..., None], out, 0.0), valid


class FastSpeech2(nn.Module):
    config: FastSpeech2Config

    def setup(self):
        c = self.config
        self.text_embed = nn.Embed(c.idim, c.adim, embedding_init=normal_init,
                                   name="text_embed")
        legacy = c.encoder.selfattention_layer_type == "legacy_rel_selfattn"
        if c.encoder_conformer:
            self.enc_posenc = RelPosEncoding(
                c.adim, c.encoder.positional_dropout_rate, legacy=legacy,
                name="enc_posenc")
            self.dec_posenc = RelPosEncoding(
                c.adim, c.decoder.positional_dropout_rate, legacy=legacy,
                name="dec_posenc")
        else:
            self.enc_posenc = AbsPosEncoding(
                c.adim, c.encoder.positional_dropout_rate,
                scaled=c.use_scaled_pos_enc, name="enc_posenc")
            self.dec_posenc = AbsPosEncoding(
                c.adim, c.decoder.positional_dropout_rate,
                scaled=c.use_scaled_pos_enc, name="dec_posenc")
        self.encoder = ConformerStack(c.encoder, name="encoder")
        self.decoder = ConformerStack(c.decoder, name="decoder")

        if c.use_gst:
            self.gst = StyleEncoder(
                gst_tokens=c.gst_tokens, gst_token_dim=c.adim,
                gst_heads=c.gst_heads,
                conv_chans_list=c.gst_conv_chans_list,
                gru_units=c.gst_gru_units, name="gst")
        if c.spk_embed_dim is not None:
            self.projection = nn.Dense(c.adim, kernel_init=xavier(),
                                       bias_init=zeros, name="projection")

        self.duration_predictor = DurationPredictor(
            n_layers=c.duration_predictor_layers,
            n_chans=c.duration_predictor_chans,
            kernel_size=c.duration_predictor_kernel,
            name="duration_predictor")
        def _or(v, default):
            return default if v is None else v

        self.pitch_predictor = VariancePredictor(
            _or(c.pitch_predictor_layers, c.variance_predictor_layers),
            _or(c.pitch_predictor_chans, c.variance_predictor_chans),
            _or(c.pitch_predictor_kernel, c.variance_predictor_kernel),
            c.variance_dropout, name="pitch_predictor")
        self.energy_predictor = VariancePredictor(
            _or(c.energy_predictor_layers, c.variance_predictor_layers),
            _or(c.energy_predictor_chans, c.variance_predictor_chans),
            _or(c.energy_predictor_kernel, c.variance_predictor_kernel),
            c.variance_dropout, name="energy_predictor")
        self.pitch_embed = nn.Conv(
            c.adim, (_or(c.pitch_embed_kernel, c.variance_embed_kernel),),
            padding="SAME",
            kernel_init=xavier(), bias_init=zeros, name="pitch_embed")
        self.energy_embed = nn.Conv(
            c.adim, (_or(c.energy_embed_kernel, c.variance_embed_kernel),),
            padding="SAME",
            kernel_init=xavier(), bias_init=zeros, name="energy_embed")

        self.feat_out = nn.Dense(c.odim, kernel_init=xavier(),
                                 bias_init=zeros, name="feat_out")
        if c.postnet_layers > 0:
            self.postnet = Postnet(c.odim, c.postnet_layers, c.postnet_chans,
                                   c.postnet_filts, name="postnet")

    # -- encoder side ----------------------------------------------------
    def encode_hidden(
        self, text, text_mask, speech=None, spembs=None, train: bool = False,
    ):
        """text ids (B, T) -> hidden (B, T, adim) after GST/x-vector
        integration (the duration-prediction entry point,
        sedit_inference.py:398-424)."""
        c = self.config
        h = self.text_embed(text)
        if c.encoder_conformer:
            h, pos = self.enc_posenc(h, deterministic=not train)
            hs = self.encoder(h, pos, text_mask[:, None, :], train)
        else:
            h = self.enc_posenc(h, deterministic=not train)
            hs = self.encoder(h, None, text_mask[:, None, :], train)

        if c.use_gst and speech is not None:
            style = self.gst(speech, train)
            hs = hs + style[:, None, :]
        if c.spk_embed_dim is not None and spembs is not None:
            if c.spk_embed_integration_type == "add":
                norm = spembs / jnp.linalg.norm(
                    spembs, axis=-1, keepdims=True)
                hs = hs + self.projection(norm)[:, None, :]
            else:
                e = jnp.linalg.norm(spembs, axis=-1, keepdims=True)
                norm = spembs / e
                tiled = jnp.repeat(norm[:, None, :], hs.shape[1], axis=1)
                hs = self.projection(
                    jnp.concatenate([hs, tiled], axis=-1))
        return hs

    def predict_durations(
        self, text, text_mask, speech=None, spembs=None,
    ) -> jnp.ndarray:
        """Integer frame durations per token (inference path)."""
        hs = self.encode_hidden(text, text_mask, speech, spembs, train=False)
        log_d = self.duration_predictor(hs, pad_mask=~text_mask)
        return DurationPredictor.to_durations(log_d) * text_mask

    # -- full synthesis --------------------------------------------------
    def __call__(
        self,
        text,
        text_mask,
        speech=None,
        spembs=None,
        durations=None,
        pitch=None,
        energy=None,
        train: bool = False,
        alpha: float = 1.0,
    ):
        """Returns dict with before/after mels, predicted d/p/e and the
        valid-frame mask.  With ``durations/pitch/energy`` given (training/
        teacher-forcing) they are used; otherwise predictions are."""
        c = self.config
        hs = self.encode_hidden(text, text_mask, speech, spembs, train)
        pad = ~text_mask

        log_d = self.duration_predictor(hs, pad_mask=pad,
                                        deterministic=not train)
        p_out = self.pitch_predictor(hs, pad_mask=pad, deterministic=not train)
        e_out = self.energy_predictor(hs, pad_mask=pad,
                                      deterministic=not train)

        use_pitch = pitch if pitch is not None else p_out
        use_energy = energy if energy is not None else e_out
        hs = hs + self.pitch_embed(use_pitch) + self.energy_embed(use_energy)

        if durations is None:
            d = DurationPredictor.to_durations(log_d) * text_mask
            if alpha != 1.0:
                d = jnp.round(d.astype(jnp.float32) * alpha).astype(jnp.int32)
        else:
            d = durations
        hs_up, frame_valid = length_regulate(hs, d, c.max_feat_len)

        if c.encoder_conformer:
            h, pos = self.dec_posenc(hs_up, deterministic=not train)
            zs = self.decoder(h, pos, frame_valid[:, None, :], train)
        else:
            h = self.dec_posenc(hs_up, deterministic=not train)
            zs = self.decoder(h, None, frame_valid[:, None, :], train)

        before = self.feat_out(zs)
        after = before
        if c.postnet_layers > 0:
            after = before + self.postnet(before, train)
        return dict(
            before=before, after=after, log_duration=log_d, pitch=p_out,
            energy=e_out, frame_valid=frame_valid,
            durations=d,
        )


def fastspeech2_loss(out: dict, targets: dict, text_mask) -> dict:
    """L1 mel + MSE log-duration/pitch/energy (fastspeech2/loss.py)."""
    frame_w = out["frame_valid"].astype(jnp.float32)[..., None]
    mel_t = targets["mel"]
    l1 = jnp.abs(out["before"] - mel_t) + jnp.abs(out["after"] - mel_t)
    l1 = (l1 * frame_w).sum() / (frame_w.sum() * mel_t.shape[-1] + 1e-10)

    tw = text_mask.astype(jnp.float32)
    d_l = dp_loss(out["log_duration"], targets["durations"])
    d_l = (d_l * tw).sum() / (tw.sum() + 1e-10)
    p_l = ((out["pitch"] - targets["pitch"]) ** 2 * tw[..., None]).sum() / (
        tw.sum() + 1e-10)
    e_l = ((out["energy"] - targets["energy"]) ** 2 * tw[..., None]).sum() / (
        tw.sum() + 1e-10)
    total = l1 + d_l + p_l + e_l
    return dict(loss=total, l1_loss=l1, duration_loss=d_l, pitch_loss=p_l,
                energy_loss=e_l)
