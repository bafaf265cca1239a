"""The A3T masked-reconstruction model (TPU-native rebuild).

Equivalent of ``ESPnetMLMEncAsDecoderModel``
(espnet2/tts/sedit/sedit_model.py:47-375): a dual-embed Conformer encoder
consumes [masked mel frames ; phoneme tokens] with a shared *segment*
embedding aligning the two modalities; a second non-causal Conformer stack
("decoder") refines the concatenated hidden states; the speech slice goes
through a linear ``sfc`` head and a Tacotron2 postnet; the loss is L1 on
masked frames, before and after the postnet.

Differences from the reference (deliberate, TPU-first):

* static shapes — callers pad to bucket sizes; masks carry the true lengths;
* features are computed on-device by ``a3t_tpu.dsp`` inside the same jit,
  not on CPU in the collate fn;
* the dead autoregressive decode path (sedit_model.py:285-317, crashes on
  undefined vars in the reference) is not reproduced; inference is the
  non-autoregressive teacher-forced pass the published model actually uses.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from a3t_tpu.models.conformer import (
    AbsPosEncoding,
    ConformerStack,
    EncoderConfig,
    RelPosEncoding,
)
from a3t_tpu.models.layers import (
    DurationPredictor,
    MaskedInput,
    Postnet,
    normal_init,
    xavier,
    zeros,
)


class _PosEnc(nn.Module):
    """Positional encoding dispatch: rel-pos variants return (x, pos_emb);
    absolute (used by selfattn/longformer stacks, embedding.py:35-94)
    returns (x, None)."""

    d_model: int
    dropout_rate: float
    kind: str  # "legacy_rel" | "rel" | "abs"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.kind == "abs":
            return (
                AbsPosEncoding(self.d_model, self.dropout_rate,
                               name="abs")(x, deterministic=deterministic),
                None,
            )
        return RelPosEncoding(
            self.d_model, self.dropout_rate,
            legacy=self.kind == "legacy_rel", name="rel",
        )(x, deterministic=deterministic)


@dataclasses.dataclass(frozen=True)
class A3TModelConfig:
    """Model hyperparameters (conf/fsp2_conformer.yaml:26-75 defaults)."""

    odim: int = 80  # mel bins
    vocab_size: int = 100
    encoder: EncoderConfig = EncoderConfig(cnn_module_kernel=7)
    decoder: Optional[EncoderConfig] = EncoderConfig(cnn_module_kernel=31)
    use_segment_emb: bool = True  # input_layer == "sega_mlm"
    segment_vocab: int = 500
    postnet_layers: int = 5
    postnet_chans: int = 256
    postnet_filts: int = 5
    # > 0 enables the duration-aware TTS variant (ESPnetMLMTTSModel)
    duration_predictor_layers: int = 0
    # Loss settings (sedit_model.py:105-108: MSE only if lsm_weight > 50)
    use_mse_loss: bool = False
    mlm_prob: float = 0.8
    mean_phn_span: int = 8
    # > 0 conditions both modalities on an utterance-level speaker
    # embedding (x-vector), L2-normalized then projected and added — the
    # espnet2 spk_embed integration recipe (tts/fastspeech2/fastspeech2.py
    # "add" projection) applied to the MLM.  The reference MLM omits this
    # (sedit_model.py:246 accepts `spembs` but never uses them) and must
    # infer speaker identity from unmasked context alone; measured on the
    # 16-speaker soak corpus that fails on short context (docs/QUALITY.md),
    # so the TPU rebuild makes the conditioning real.
    spemb_dim: int = 0


class A3TMLMModel(nn.Module):
    """Encoder-as-decoder A3T model.

    Inputs (all padded to static shapes):
        speech:             (B, F, odim) mel features
        text:               (B, T) int32 phone ids
        masked_position:    (B, F) bool — frames to reconstruct
        speech_mask:        (B, F) bool — valid (non-pad) frames
        text_mask:          (B, T) bool — valid text tokens
        speech_segment_pos: (B, F) int32 — phone index + 1 per frame (0 = none)
        text_segment_pos:   (B, T) int32 — phone index + 1 per token
    """

    config: A3TModelConfig

    def setup(self):
        c = self.config
        enc = c.encoder
        d = enc.attention_dim
        kind = {
            "legacy_rel_selfattn": "legacy_rel",
            "rel_selfattn": "rel",
        }.get(enc.selfattention_layer_type, "abs")

        # speech_embed = MaskedInput -> Linear -> LayerNorm -> ReLU -> posenc
        # (conformer/encoder.py:399-407, mySequential over NewMaskInputLayer)
        self.speech_masked_input = MaskedInput(c.odim, name="speech_masked_input")
        self.speech_proj = nn.Dense(d, kernel_init=xavier(), bias_init=zeros,
                                    name="speech_proj")
        self.speech_norm = nn.LayerNorm(epsilon=1e-5, name="speech_norm")
        self.speech_posenc = _PosEnc(d, enc.positional_dropout_rate, kind,
                                     name="speech_posenc")

        self.text_embed = nn.Embed(c.vocab_size, d, embedding_init=normal_init,
                                   name="text_embed")
        self.text_posenc = _PosEnc(d, enc.positional_dropout_rate, kind,
                                   name="text_posenc")

        if c.use_segment_emb:
            self.segment_emb = nn.Embed(c.segment_vocab, d,
                                        embedding_init=normal_init,
                                        name="segment_emb")

        if c.spemb_dim > 0:
            # two integration sites: the modality embeddings (input) and
            # the decoder input (the espnet2 FastSpeech2 "add" site, after
            # the encoder).  Input-only conditioning measured ~ignored:
            # the additive vector washes out through the pre-LN stacks
            # (spemb-swap moved the masked-span output by 0.02 vs a 0.65
            # error scale after 3k steps); the post-encoder site feeds the
            # reconstruction head directly.
            self.spemb_proj = nn.Dense(d, kernel_init=xavier(),
                                       bias_init=zeros, name="spemb_proj")
            self.spemb_proj_mid = nn.Dense(d, kernel_init=xavier(),
                                           bias_init=zeros,
                                           name="spemb_proj_mid")
            # direct linear speaker offset on the output mel (zero-init:
            # exactly preserves a warm-started model at step 0, and the
            # L1 gradient through a single linear layer adopts the
            # conditioning immediately, pulling the deeper sites along)
            self.spemb_out = nn.Dense(c.odim, kernel_init=zeros,
                                      bias_init=zeros, name="spemb_out")

        if enc.pre_speech_layers > 0:
            pre_cfg = dataclasses.replace(enc, num_blocks=enc.pre_speech_layers)
            self.pre_speech_encoders = ConformerStack(
                pre_cfg, apply_final_norm=False, name="pre_speech_encoders")
        self.encoder = ConformerStack(enc, name="encoder")
        if c.decoder is not None:
            dec_kind = {
                "legacy_rel_selfattn": "legacy_rel",
                "rel_selfattn": "rel",
            }.get(c.decoder.selfattention_layer_type, "abs")
            self.decoder_posenc = _PosEnc(
                d, c.decoder.positional_dropout_rate, dec_kind,
                name="decoder_posenc")
            self.decoder = ConformerStack(c.decoder, name="decoder")

        self.sfc = nn.Dense(c.odim, kernel_init=xavier(), bias_init=zeros,
                            name="sfc")
        if c.postnet_layers > 0:
            self.postnet = Postnet(
                c.odim, c.postnet_layers, c.postnet_chans, c.postnet_filts,
                dtype=c.encoder.dtype, name="postnet")

        if c.duration_predictor_layers > 0:
            self.duration_predictor = DurationPredictor(
                n_layers=c.duration_predictor_layers, name="duration_predictor")

    def encode(
        self,
        speech,
        text,
        masked_position,
        speech_mask,
        text_mask,
        speech_segment_pos,
        text_segment_pos,
        train: bool = False,
        speech_only: bool = False,
        spemb=None,
    ):
        """Embed both modalities and run the encoder stack.

        Returns ((B, F + T, d) encoder hidden states, (B, 1, F + T) mask).
        """
        c = self.config
        det = not train

        dt = self.config.encoder.dtype
        if dt is not None:
            speech = speech.astype(dt)
        h_speech = self.speech_masked_input(speech, masked_position)
        h_speech = nn.relu(self.speech_norm(self.speech_proj(h_speech)))
        if dt is not None:
            h_speech = h_speech.astype(dt)
        h_speech, pos_speech = self.speech_posenc(h_speech, deterministic=det)

        h_text = self.text_embed(text)
        if dt is not None:
            h_text = h_text.astype(dt)
        h_text, pos_text = self.text_posenc(h_text, deterministic=det)

        if c.use_segment_emb:
            if speech_only:
                # Reference speech-only branch (conformer/encoder.py:531-537):
                # the sentinel text token gets segment_emb(0); speech gets none.
                h_text = h_text + self.segment_emb(jnp.zeros_like(text))
            else:
                h_speech = h_speech + self.segment_emb(speech_segment_pos)
                h_text = h_text + self.segment_emb(text_segment_pos)

        if c.spemb_dim > 0:
            se = self._norm_spemb(spemb, speech.shape[0])
            se = self.spemb_proj(se.astype(h_speech.dtype))[:, None, :]
            h_speech = h_speech + se
            h_text = h_text + se

        n_frames = speech.shape[1]
        if c.encoder.pre_speech_layers > 0:
            # speech-only windowed pre-encoder (transformer/encoder.py:538-563)
            h_speech = self.pre_speech_encoders(
                h_speech, pos_speech, speech_mask[:, None, :], train,
                n_frames=n_frames)

        x = jnp.concatenate([h_speech, h_text], axis=1)
        if pos_speech is None:
            pos_emb = None
        else:
            pos_emb = jnp.concatenate([pos_speech, pos_text], axis=1)
        mask = jnp.concatenate([speech_mask, text_mask], axis=1)[:, None, :]

        return self.encoder(x, pos_emb, mask, train, n_frames=n_frames), mask

    def _norm_spemb(self, spemb, batch_size: int):
        """L2-normalized speaker embedding; zeros when absent (the
        no-enrolment path projects to the biases alone)."""
        if spemb is None:
            spemb = jnp.zeros((batch_size, self.config.spemb_dim),
                              jnp.float32)
        return spemb / (jnp.linalg.norm(spemb, axis=-1, keepdims=True)
                        + 1e-8)

    def decode(self, x, mask, train: bool = False, n_frames=None):
        """Refinement ("decoder") stack over the concatenated hidden states.

        MLMDecoder with input_layer=None re-applies scaling + a fresh
        positional table over the full concatenated length
        (conformer/encoder.py:568-614, tasks/mlm.py:405-411).
        """
        x, pos_full = self.decoder_posenc(x, deterministic=not train)
        return self.decoder(x, pos_full, mask, train, n_frames=n_frames)

    def __call__(
        self,
        speech,
        text,
        masked_position,
        speech_mask,
        text_mask,
        speech_segment_pos,
        text_segment_pos,
        train: bool = False,
        speech_only: bool = False,
        spemb=None,
    ):
        """Returns (before_outs, after_outs, log_durations).

        ``log_durations`` is None unless the duration-aware TTS variant is
        configured; it is predicted from the *encoder* output's speech slice
        (sedit_model.py:420-428), before the decoder stack.
        """
        c = self.config
        n_frames = speech.shape[1]
        enc_out, mask = self.encode(
            speech, text, masked_position, speech_mask, text_mask,
            speech_segment_pos, text_segment_pos, train=train,
            speech_only=speech_only, spemb=spemb,
        )
        if c.spemb_dim > 0:
            se = self._norm_spemb(spemb, speech.shape[0])
            enc_out = enc_out + self.spemb_proj_mid(
                se.astype(enc_out.dtype))[:, None, :]
        log_durations = None
        if c.duration_predictor_layers > 0:
            log_durations = self.duration_predictor(
                enc_out[:, :n_frames], pad_mask=~speech_mask,
                deterministic=not train,
            )
        hidden = (
            self.decode(enc_out, mask, train, n_frames=n_frames)
            if c.decoder is not None else enc_out
        )
        speech_hidden = hidden[:, :n_frames]
        before_outs = self.sfc(speech_hidden).astype(jnp.float32)
        if c.spemb_dim > 0:
            se = self._norm_spemb(spemb, speech.shape[0])
            before_outs = before_outs + self.spemb_out(
                se).astype(jnp.float32)[:, None, :]
        if c.postnet_layers > 0:
            after_outs = before_outs + self.postnet(before_outs, train)
        else:
            after_outs = None
        return before_outs, after_outs, log_durations

    def tts_forward(
        self,
        speech,  # (B, R, odim) duration-REDUCED mel (first frame per phone)
        text,
        masked_position,  # (B, R) reduced
        speech_mask,  # (B, R) reduced validity
        text_mask,
        speech_segment_pos,  # (B, R) reduced
        text_segment_pos,
        durations,  # (B, R) frames per reduced position (1 for unmasked)
        out_frames: int,  # static full-resolution frame count
        train: bool = False,
        spemb=None,
    ):
        """Duration-aware TTS variant forward (ESPnetMLMTTSModel._forward,
        sedit_model.py:415-452).

        The encoder runs over the *reduced* sequence (masked phones
        collapsed to their first frame); the predicted/target durations
        length-regulate the encoder output back to frame resolution before
        the decoder, so ``before/after`` align with the full-resolution
        target mel.  TPU-first deviation: the text tokens are re-appended
        after the statically-padded expanded speech (the reference appends
        them after the dynamic speech length).
        """
        c = self.config
        n_red = speech.shape[1]
        enc_out, _ = self.encode(
            speech, text, masked_position, speech_mask, text_mask,
            speech_segment_pos, text_segment_pos, train=train, spemb=spemb,
        )
        if c.spemb_dim > 0:
            se = self._norm_spemb(spemb, speech.shape[0])
            enc_out = enc_out + self.spemb_proj_mid(
                se.astype(enc_out.dtype))[:, None, :]
        log_d = self.duration_predictor(
            enc_out[:, :n_red], pad_mask=~speech_mask, deterministic=not train)

        from a3t_tpu.models.fastspeech2 import length_regulate

        d = (durations * speech_mask).astype(jnp.int32)
        expanded, frame_valid = length_regulate(
            enc_out[:, :n_red], d, out_frames)
        full = jnp.concatenate([expanded, enc_out[:, n_red:]], axis=1)
        full_mask = jnp.concatenate([frame_valid, text_mask], axis=1)[:, None, :]

        hidden = (
            self.decode(full, full_mask, train, n_frames=out_frames)
            if c.decoder is not None else full
        )
        speech_hidden = hidden[:, :out_frames]
        before_outs = self.sfc(speech_hidden).astype(jnp.float32)
        if c.spemb_dim > 0:
            before_outs = before_outs + self.spemb_out(
                se).astype(jnp.float32)[:, None, :]
        after_outs = None
        if c.postnet_layers > 0:
            after_outs = before_outs + self.postnet(before_outs, train)
        return before_outs, after_outs, log_d


def mlm_loss(before_outs, after_outs, target, masked_position, use_mse=False):
    """Masked reconstruction loss (sedit_model.py:320-340).

    Per-frame L1 (or MSE) summed over the mel dim, before + after postnet,
    averaged over masked frames only.
    """
    if use_mse:
        err = (before_outs - target) ** 2
    else:
        err = jnp.abs(before_outs - target)
    loss = err.sum(axis=-1)
    if after_outs is not None:
        if use_mse:
            err2 = (after_outs - target) ** 2
        else:
            err2 = jnp.abs(after_outs - target)
        loss = loss + err2.sum(axis=-1)
    w = masked_position.astype(loss.dtype)
    return (loss * w).sum() / (w.sum() + 1e-10)
