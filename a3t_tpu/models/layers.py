"""Building-block layers shared by the Conformer/Transformer stacks.

Shapes follow the JAX convention (batch, time, channels) throughout; the
reference's (batch, channels, time) transposes around torch Conv1d
disappear — XLA lays out convolutions natively.

Numerical semantics mirror the reference modules cited on each class.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax.numpy as jnp
from flax import linen as nn

from a3t_tpu.models.dropout import SeededDropout

# torch xavier_uniform + zero bias, the reference's `init: xavier_uniform`
# (espnet2/torch_utils/initialize.py applied via tasks/mlm.py:438-440).
xavier = nn.initializers.xavier_uniform
zeros = nn.initializers.zeros
normal_init = nn.initializers.normal(stddev=1.0)


def swish(x):
    return x * nn.sigmoid(x)


ACTIVATIONS: dict[str, Callable] = {
    "swish": swish,
    "relu": nn.relu,
    "gelu": nn.gelu,
    "tanh": jnp.tanh,
}


def sinusoidal_table(length: int, d_model: int, reverse: bool = False) -> np.ndarray:
    """Standard sinusoidal positional table (length, d_model).

    ``reverse=True`` reproduces LegacyRelPositionalEncoding
    (espnet/nets/pytorch_backend/transformer/embedding.py:133-170), whose
    positions run length-1 .. 0.
    """
    if reverse:
        position = np.arange(length - 1, -1, -1.0, dtype=np.float64)[:, None]
    else:
        position = np.arange(length, dtype=np.float64)[:, None]
    div_term = np.exp(
        np.arange(0, d_model, 2, dtype=np.float64) * -(np.log(10000.0) / d_model)
    )
    pe = np.zeros((length, d_model), dtype=np.float32)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe


class PositionwiseFeedForward(nn.Module):
    """Linear -> activation -> dropout -> Linear
    (espnet/nets/pytorch_backend/transformer/positionwise_feed_forward.py)."""

    hidden: int
    dropout_rate: float
    activation: str = "swish"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, deterministic: bool):
        d = x.shape[-1]
        h = nn.Dense(self.hidden, kernel_init=xavier(), bias_init=zeros,
                     dtype=self.dtype)(x)
        h = ACTIVATIONS[self.activation](h)
        h = SeededDropout(self.dropout_rate)(h, deterministic=deterministic)
        return nn.Dense(d, kernel_init=xavier(), bias_init=zeros,
                        dtype=self.dtype)(h)


class _ShiftedConv1d(nn.Module):
    """Same-padded Conv1d computed as ``kernel_size`` shifted matmuls.

    Mathematically identical to ``nn.Conv`` (same parameter names/shapes —
    checkpoint- and TP-rule-compatible), but each tap is a plain
    (B·T, D)x(D, H) matmul, which can map onto the MXU without the conv
    im2col lowering.  Accumulates taps in fp32."""

    features: int
    kernel_size: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        kernel = self.param(
            "kernel", xavier(), (self.kernel_size, d, self.features))
        bias = self.param("bias", zeros, (self.features,))
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
        k, t = self.kernel_size, x.shape[1]
        pad = (k - 1) // 2
        xp = jnp.pad(x, ((0, 0), (pad, k - 1 - pad), (0, 0)))
        out = None
        for i in range(k):
            tap = jnp.einsum("btd,dh->bth", xp[:, i:i + t], kernel[i],
                             preferred_element_type=jnp.float32)
            out = tap if out is None else out + tap
        out = out.astype(x.dtype)
        return out + bias.astype(out.dtype)


class _ShiftedDepthwiseConv1d(nn.Module):
    """Same-padded depthwise Conv1d as ``kernel_size`` shifted elementwise
    multiply-adds.

    Identical params to ``nn.Conv(features, (k,), feature_group_count=
    features)`` (kernel (k, 1, D), bias (D,)) — a lowering choice only:
    each tap is a (B, T, D) * (D,) broadcast on the VPU, accumulated in
    fp32, avoiding XLA's grouped-conv lowering."""

    features: int
    kernel_size: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", xavier(), (self.kernel_size, 1, self.features))
        bias = self.param("bias", zeros, (self.features,))
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
        k, t = self.kernel_size, x.shape[1]
        pad = (k - 1) // 2
        xp = jnp.pad(x, ((0, 0), (pad, k - 1 - pad), (0, 0)))
        out = None
        for i in range(k):
            tap = (xp[:, i:i + t] * kernel[i, 0]).astype(jnp.float32)
            out = tap if out is None else out + tap
        out = out.astype(x.dtype)
        return out + bias.astype(out.dtype)


class MultiLayeredConv1d(nn.Module):
    """Two same-padded Conv1d with ReLU, FastSpeech-style position-wise layer
    (espnet/nets/pytorch_backend/transformer/multi_layer_conv.py, activation
    hard-coded to ReLU).  ``shifted=True`` swaps the conv lowering for the
    shifted-matmul formulation (identical params, see _ShiftedConv1d)."""

    hidden: int
    kernel_size: int
    dropout_rate: float
    dtype: Optional[jnp.dtype] = None
    shifted: bool = False

    def _conv(self, features: int, name: str):
        if self.shifted:
            return _ShiftedConv1d(features, self.kernel_size,
                                  dtype=self.dtype, name=name)
        return nn.Conv(
            features,
            (self.kernel_size,),
            padding="SAME",
            kernel_init=xavier(),
            bias_init=zeros,
            dtype=self.dtype,
            name=name,
        )

    @nn.compact
    def __call__(self, x, deterministic: bool):
        d = x.shape[-1]
        h = self._conv(self.hidden, "Conv_0")(x)
        h = nn.relu(h)
        h = SeededDropout(self.dropout_rate)(h, deterministic=deterministic)
        return self._conv(d, "Conv_1")(h)


class ConvolutionModule(nn.Module):
    """Conformer convolution module: pointwise(2d)+GLU -> depthwise ->
    BatchNorm -> activation -> pointwise
    (espnet/nets/pytorch_backend/conformer/convolution.py:13-79)."""

    kernel_size: int
    activation: str = "swish"
    dtype: Optional[jnp.dtype] = None
    # lower the depthwise conv as k shifted multiply-adds (identical
    # params/numerics, see _ShiftedDepthwiseConv1d)
    shifted: bool = False
    # keep the BatchNorm computation in the compute dtype instead of the
    # default fp32 round trip (a bench knob: sizes the cast+reduce cost;
    # fp32 stays the shipped default for statistics stability)
    bn_compute_dtype: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        d = x.shape[-1]
        h = nn.Conv(2 * d, (1,), kernel_init=xavier(), bias_init=zeros,
                    dtype=self.dtype, name="Conv_0")(x)
        a, b = jnp.split(h, 2, axis=-1)
        h = a * nn.sigmoid(b)  # GLU over the channel dim
        if self.shifted:
            h = _ShiftedDepthwiseConv1d(
                d, self.kernel_size, dtype=self.dtype, name="Conv_1")(h)
        else:
            h = nn.Conv(
                d,
                (self.kernel_size,),
                padding="SAME",
                feature_group_count=d,
                kernel_init=xavier(),
                bias_init=zeros,
                dtype=self.dtype,
                name="Conv_1",
            )(h)
        if self.bn_compute_dtype and self.dtype is not None:
            h = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype,
            )(h)
        else:
            # BatchNorm statistics stay float32 for stability
            h = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5
            )(h.astype(jnp.float32))
            if self.dtype is not None:
                h = h.astype(self.dtype)
        h = ACTIVATIONS[self.activation](h)
        return nn.Conv(d, (1,), kernel_init=xavier(), bias_init=zeros,
                       dtype=self.dtype, name="Conv_2")(h)


class Postnet(nn.Module):
    """Tacotron2 postnet: (n_layers-1) x [Conv(k, no bias) -> BN -> tanh ->
    dropout] + final [Conv -> BN -> dropout], residual added by the caller
    (espnet/nets/pytorch_backend/tacotron2/decoder.py:150-262)."""

    odim: int
    n_layers: int = 5
    n_chans: int = 256
    n_filts: int = 5
    dropout_rate: float = 0.5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool):
        h = x if self.dtype is None else x.astype(self.dtype)
        for _ in range(self.n_layers - 1):
            h = nn.Conv(
                self.n_chans,
                (self.n_filts,),
                padding="SAME",
                use_bias=False,
                kernel_init=xavier(),
                dtype=self.dtype,
            )(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9)(
                h.astype(jnp.float32))
            if self.dtype is not None:
                h = h.astype(self.dtype)
            h = jnp.tanh(h)
            h = SeededDropout(self.dropout_rate)(h, deterministic=not train)
        h = nn.Conv(
            self.odim,
            (self.n_filts,),
            padding="SAME",
            use_bias=False,
            kernel_init=xavier(),
            dtype=self.dtype,
        )(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9)(
            h.astype(jnp.float32))
        h = SeededDropout(self.dropout_rate)(h, deterministic=not train)
        return h


class MaskedInput(nn.Module):
    """Learned mask embedding replacing masked frames:
    ``where(masked, mask_emb, x)``
    (espnet2/asr/encoder/mlm_encoder.py:57-70, NewMaskInputLayer)."""

    features: int

    @nn.compact
    def __call__(self, x, masked_position):
        mask_emb = self.param("mask_feature", normal_init, (1, 1, self.features))
        m = masked_position[..., None]
        return jnp.where(m, mask_emb.astype(x.dtype), x)


class DurationPredictor(nn.Module):
    """FastSpeech duration predictor: conv -> relu -> LN -> dropout stack +
    linear head, log-domain in training / rounded linear at inference
    (espnet/nets/pytorch_backend/fastspeech/duration_predictor.py:14-113)."""

    n_layers: int = 2
    n_chans: int = 256
    kernel_size: int = 3
    dropout_rate: float = 0.1
    offset: float = 1.0

    @nn.compact
    def __call__(self, x, pad_mask=None, deterministic: bool = True):
        h = x
        for _ in range(self.n_layers):
            h = nn.Conv(
                self.n_chans,
                (self.kernel_size,),
                padding="SAME",
                kernel_init=xavier(),
                bias_init=zeros,
            )(h)
            h = nn.relu(h)
            h = nn.LayerNorm(epsilon=1e-5)(h)
            h = SeededDropout(self.dropout_rate)(h, deterministic=deterministic)
        out = nn.Dense(1, kernel_init=xavier(), bias_init=zeros)(h)[..., 0]
        if pad_mask is not None:
            out = jnp.where(pad_mask, 0.0, out)
        return out

    @staticmethod
    def to_durations(log_durations, offset: float = 1.0):
        """Log-domain prediction -> non-negative integer durations."""
        return jnp.maximum(jnp.round(jnp.exp(log_durations) - offset), 0.0).astype(
            jnp.int32
        )


def duration_loss(log_pred, target_durations, offset: float = 1.0):
    """MSE in log domain (fastspeech/duration_predictor.py:116-153)."""
    t = jnp.log(target_durations.astype(jnp.float32) + offset)
    return (log_pred - t) ** 2
