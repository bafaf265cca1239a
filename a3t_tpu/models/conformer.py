"""Conformer encoder/decoder stacks (flax.linen).

Mirrors the reference Conformer MLM encoder
(espnet/nets/pytorch_backend/conformer/{encoder,encoder_layer,convolution}.py)
with the shipped A3T settings: macaron feed-forward halves, legacy rel-pos
self-attention, conv module with BatchNorm, pre-LayerNorm everywhere and a
final LayerNorm (normalize_before=true).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from a3t_tpu.models.dropout import SeededDropout

from a3t_tpu.models.attention import (
    MultiHeadedAttention,
    RelPositionMultiHeadedAttention,
)
from a3t_tpu.models.windowed_attention import WindowedSelfAttention
from a3t_tpu.models.layers import (
    MultiLayeredConv1d,
    PositionwiseFeedForward,
    ConvolutionModule,
    sinusoidal_table,
)


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    """Conformer stack hyperparameters.

    Defaults follow egs2/vctk/sedit/conf/fsp2_conformer.yaml:26-64 (encoder
    values; the decoder differs only in cnn_module_kernel=31).
    """

    attention_dim: int = 384
    attention_heads: int = 2
    linear_units: int = 1536
    num_blocks: int = 4
    dropout_rate: float = 0.2
    positional_dropout_rate: float = 0.2
    attention_dropout_rate: float = 0.2
    normalize_before: bool = True
    macaron_style: bool = True
    use_cnn_module: bool = True
    cnn_module_kernel: int = 7
    # "linear" | "conv1d" | "conv1d_shifted" (conv as k shifted matmuls,
    # identical params/numerics — a lowering choice, see _ShiftedConv1d)
    positionwise_layer_type: str = "conv1d"
    # lower the conv module's depthwise conv as k shifted multiply-adds
    # (identical params/numerics, see _ShiftedDepthwiseConv1d)
    cnn_module_shifted: bool = False
    # run the conv module's BatchNorm in the compute dtype instead of the
    # fp32 round trip (bench knob; fp32 is the shipped default)
    cnn_module_bn_compute_dtype: bool = False
    positionwise_conv_kernel_size: int = 3
    activation_type: str = "swish"
    # "legacy_rel_selfattn" (the trained A3T path, see tasks/mlm.py:366-392)
    # | "rel_selfattn" | "selfattn" | "longformer" (sliding window + global
    # text tokens, the long-audio path — transformer/encoder.py:522-563)
    selfattention_layer_type: str = "legacy_rel_selfattn"
    attention_window: int = 0  # full window size for "longformer"
    # longformer attention dilation (encoder.py:544-546 passes the
    # encoder-wide value to every LongformerAttention layer): each speech
    # query attends every n-th frame in a dilation-x wider band
    attention_dilation: int = 1
    # fused Pallas banded-attention kernel for the longformer speech band
    # (ops/banded_attention.py; exact softmax, so only engaged when
    # attention dropout is inactive).  Default on: measured 1.7-1.9x
    # faster fwd+bwd than the chunked-einsum path at T=8192 on v5e
    # (docs/KERNEL_BENCH.json)
    use_pallas_attention: bool = True
    # fused Pallas softmax+dropout+PV for the full (rel-pos) attention
    # path, with in-kernel dropout regenerated in backward
    # (ops/fused_attention.py).  Default on (engaged on TPU backends
    # only): 237 -> 195 ms/step at the bench shape, with attention
    # dropout included at no measurable cost (docs/STEP_BENCH.json)
    use_flash_attention: bool = True
    # speech-only pre-encoder layers before the text concat
    # (transformer/encoder.py:538-563, pre_speech_layer)
    pre_speech_layers: int = 0
    # "float32" (reference parity) or "bfloat16" (mixed precision: bf16
    # matmuls/convs with fp32 params, fp32 softmax and norms)
    compute_dtype: str = "float32"
    # rematerialize each block in backward (FLOPs for HBM bandwidth)
    remat: bool = False
    # rematerialize only the self-attention (recompute the (B,H,L,L)
    # scores/probs/dropout in backward instead of storing them)
    remat_attention: bool = False

    @property
    def dtype(self):
        return None if self.compute_dtype == "float32" else jnp.dtype(
            self.compute_dtype)


class RelPosEncoding(nn.Module):
    """x -> (dropout(x * sqrt(d)), dropout(pos_emb)).

    ``legacy=True``: the quirky LegacyRelPositionalEncoding semantics
    (embedding.py:133-170): the reversed sinusoidal table is built over
    ``max(T, max_len)`` positions at construction and the FIRST T rows are
    sliced, so row i carries position ``max(T, max_len) - 1 - i`` — NOT
    ``T - 1 - i``.  Trained reference checkpoints depend on this exact
    table.  ``legacy=False``: symmetric 2T-1 table (embedding.py:173-244).
    """

    d_model: int
    dropout_rate: float
    legacy: bool = True
    max_len: int = 5000

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        t = x.shape[1]
        if self.legacy:
            length = max(t, self.max_len)
            pe = sinusoidal_table(length, self.d_model, reverse=True)[:t]
        else:
            pos = sinusoidal_table(t, self.d_model, reverse=False)
            neg = sinusoidal_table(t, self.d_model, reverse=False)
            neg[:, 0::2] *= -1.0  # sin(-x) = -sin(x); cos part unchanged
            pe = np.concatenate([pos[::-1], neg[1:]], axis=0)
        pos_emb = jnp.asarray(pe)[None].astype(x.dtype)
        x = x * np.sqrt(self.d_model).astype(np.float32)
        drop = SeededDropout(self.dropout_rate)
        return (
            drop(x, deterministic=deterministic),
            drop(pos_emb, deterministic=deterministic),
        )


class AbsPosEncoding(nn.Module):
    """x -> dropout(x * sqrt(d) + pe) (embedding.py:35-94)."""

    d_model: int
    dropout_rate: float
    scaled: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        pe = jnp.asarray(sinusoidal_table(x.shape[1], self.d_model))[None]
        if self.scaled:
            alpha = self.param("alpha", nn.initializers.ones, ())
            x = x + alpha * pe.astype(x.dtype)
        else:
            x = x * np.sqrt(self.d_model).astype(np.float32) + pe.astype(x.dtype)
        return SeededDropout(self.dropout_rate)(x, deterministic=deterministic)


class ConformerBlock(nn.Module):
    """One Conformer layer (conformer/encoder_layer.py:17-180):

    x += 1/2 ff_macaron(LN(x)); x += attn(LN(x)); x += conv(LN(x));
    x += 1/2 ff(LN(x)); x = LN(x)
    """

    config: EncoderConfig

    def _positionwise(self, name: str):
        c = self.config
        if c.positionwise_layer_type in ("conv1d", "conv1d_shifted"):
            return MultiLayeredConv1d(
                c.linear_units, c.positionwise_conv_kernel_size, c.dropout_rate,
                dtype=c.dtype, name=name,
                shifted=c.positionwise_layer_type == "conv1d_shifted",
            )
        return PositionwiseFeedForward(
            c.linear_units, c.dropout_rate, c.activation_type, dtype=c.dtype,
            name=name,
        )

    @nn.compact
    def __call__(self, x, pos_emb, mask, train: bool = False, n_frames=None):
        c = self.config
        det = not train
        drop = SeededDropout(c.dropout_rate)
        ff_scale = 0.5 if c.macaron_style else 1.0

        if c.macaron_style:
            h = nn.LayerNorm(epsilon=1e-5, name="norm_ff_macaron")(x)
            h = self._positionwise("feed_forward_macaron")(h, det)
            x = x + ff_scale * drop(h, deterministic=det)

        h = nn.LayerNorm(epsilon=1e-5, name="norm_mha")(x)
        if c.selfattention_layer_type == "longformer":
            flat_mask = mask[:, 0] if mask is not None and mask.ndim == 3 \
                else mask
            h = WindowedSelfAttention(
                c.attention_heads, c.attention_window,
                c.attention_dropout_rate, dtype=c.dtype,
                dilation=c.attention_dilation,
                # TPU only: interpret-mode kernels would crawl on CPU
                use_pallas=(c.use_pallas_attention
                            and jax.default_backend() == "tpu"),
                name="self_attn",
            )(h, n_frames if n_frames is not None else h.shape[1],
              flat_mask, deterministic=det)
        elif c.selfattention_layer_type in ("legacy_rel_selfattn", "rel_selfattn"):
            attn_cls = RelPositionMultiHeadedAttention
            if c.remat_attention:
                # recompute scores/softmax/dropout in backward: saves the
                # (B,H,L,L) activations, costs one extra QK^T matmul
                attn_cls = nn.remat(attn_cls, static_argnums=(4,))
            h = attn_cls(
                c.attention_heads,
                c.attention_dropout_rate,
                legacy=c.selfattention_layer_type == "legacy_rel_selfattn",
                dtype=c.dtype,
                # engage the fused kernel on TPU; CPU keeps the XLA path
                # (interpret-mode kernels would dominate test runtime)
                use_flash=(c.use_flash_attention
                           and jax.default_backend() == "tpu"),
                name="self_attn",
            )(h, pos_emb, mask, det)
        else:
            h = MultiHeadedAttention(
                c.attention_heads, c.attention_dropout_rate, dtype=c.dtype,
                name="self_attn",
            )(h, h, h, mask, deterministic=det)
        x = x + drop(h, deterministic=det)

        if c.use_cnn_module:
            h = nn.LayerNorm(epsilon=1e-5, name="norm_conv")(x)
            h = ConvolutionModule(
                c.cnn_module_kernel, c.activation_type, dtype=c.dtype,
                shifted=c.cnn_module_shifted,
                bn_compute_dtype=c.cnn_module_bn_compute_dtype,
                name="conv_module",
            )(h, train)
            x = x + drop(h, deterministic=det)

        h = nn.LayerNorm(epsilon=1e-5, name="norm_ff")(x)
        h = self._positionwise("feed_forward")(h, det)
        x = x + ff_scale * drop(h, deterministic=det)

        if c.use_cnn_module:
            x = nn.LayerNorm(epsilon=1e-5, name="norm_final")(x)
        return x


class ConformerStack(nn.Module):
    """num_blocks ConformerBlocks + optional final LayerNorm.

    ``apply_final_norm=False`` is used for the speech-only pre-encoder,
    which shares block structure but has no after_norm of its own
    (transformer/encoder.py:547-548).  With ``remat=True`` each block is
    wrapped in jax.checkpoint: attention scores/probabilities are
    recomputed in the backward pass instead of living in HBM between
    passes — a FLOPs-for-bandwidth trade that usually wins when
    B x H x T^2 activations dominate."""

    config: EncoderConfig
    apply_final_norm: bool = True

    @nn.compact
    def __call__(self, x, pos_emb, mask, train: bool, n_frames=None):
        c = self.config
        block_cls = ConformerBlock
        if c.remat:
            block_cls = nn.remat(ConformerBlock, static_argnums=(4, 5))
        for i in range(c.num_blocks):
            x = block_cls(c, name=f"block_{i}")(
                x, pos_emb, mask, train, n_frames)
        if c.normalize_before and self.apply_final_norm:
            x = nn.LayerNorm(epsilon=1e-5, name="after_norm")(x)
        return x
