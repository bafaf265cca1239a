"""Global Style Token (GST) encoder (espnet2/tts/gst/style_encoder.py:16-273).

Reference mel -> 6x strided Conv2d+BN+ReLU -> GRU -> style-token attention.
The GRU runs as an ``nn.scan`` over time (XLA unrolls it into a fused loop);
everything else is dense TPU-friendly compute.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from a3t_tpu.models.layers import xavier, zeros


class ReferenceEncoder(nn.Module):
    """(B, T, idim) mel -> (B, gru_units) reference embedding."""

    conv_chans_list: Sequence[int] = (32, 32, 64, 64, 128, 128)
    conv_kernel_size: int = 3
    conv_stride: int = 2
    gru_units: int = 128

    @nn.compact
    def __call__(self, speech, train: bool = False):
        h = speech[..., None]  # (B, T, F, 1) channels-last 2D
        for chans in self.conv_chans_list:
            h = nn.Conv(
                chans,
                (self.conv_kernel_size, self.conv_kernel_size),
                strides=(self.conv_stride, self.conv_stride),
                padding=(self.conv_kernel_size - 1) // 2,
                use_bias=False,
                kernel_init=xavier(),
            )(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9)(h)
            h = nn.relu(h)
        b, t, f, c = h.shape
        # torch views (B, T', C, F') -> (B, T', C*F'); ours is (B, T', F', C):
        # transpose so the flattened order matches the reference GRU input.
        h = h.transpose(0, 1, 3, 2).reshape(b, t, c * f)

        gru = nn.GRUCell(self.gru_units, kernel_init=xavier())
        carry = jnp.zeros((b, self.gru_units), h.dtype)

        def step(cell, carry, x):
            return cell(carry, x)

        scan = nn.scan(
            step, variable_broadcast="params", split_rngs={"params": False},
            in_axes=1, out_axes=1,
        )
        carry, _ = scan(gru, carry, h)
        return carry


class StyleTokenLayer(nn.Module):
    """Reference embedding -> style embedding via attention over learned
    tokens (style_encoder.py:194-252)."""

    gst_tokens: int = 10
    gst_token_dim: int = 256
    gst_heads: int = 4

    @nn.compact
    def __call__(self, ref_embs):
        d_k = self.gst_token_dim // self.gst_heads
        gst_embs = self.param(
            "gst_embs", nn.initializers.normal(1.0), (self.gst_tokens, d_k))
        tokens = jnp.tanh(gst_embs)[None].repeat(ref_embs.shape[0], axis=0)

        q = nn.Dense(self.gst_token_dim, kernel_init=xavier(),
                     bias_init=zeros, name="linear_q")(ref_embs[:, None])
        k = nn.Dense(self.gst_token_dim, kernel_init=xavier(),
                     bias_init=zeros, name="linear_k")(tokens)
        v = nn.Dense(self.gst_token_dim, kernel_init=xavier(),
                     bias_init=zeros, name="linear_v")(tokens)

        b = q.shape[0]
        q = q.reshape(b, 1, self.gst_heads, d_k)
        k = k.reshape(b, self.gst_tokens, self.gst_heads, d_k)
        v = v.reshape(b, self.gst_tokens, self.gst_heads, d_k)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(d_k)
        attn = nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(
            b, 1, self.gst_token_dim)
        out = nn.Dense(self.gst_token_dim, kernel_init=xavier(),
                       bias_init=zeros, name="linear_out")(out)
        return out[:, 0]


class StyleEncoder(nn.Module):
    """(B, T, idim) mel -> (B, gst_token_dim) style embedding."""

    gst_tokens: int = 10
    gst_token_dim: int = 256
    gst_heads: int = 4
    conv_chans_list: Sequence[int] = (32, 32, 64, 64, 128, 128)
    conv_kernel_size: int = 3
    conv_stride: int = 2
    gru_units: int = 128

    @nn.compact
    def __call__(self, speech, train: bool = False):
        ref = ReferenceEncoder(
            self.conv_chans_list, self.conv_kernel_size, self.conv_stride,
            self.gru_units, name="ref_enc",
        )(speech, train)
        return StyleTokenLayer(
            self.gst_tokens, self.gst_token_dim, self.gst_heads, name="stl"
        )(ref)
