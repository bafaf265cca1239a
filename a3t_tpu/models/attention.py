"""Multi-head attention with (legacy) relative positional encoding.

The shipped A3T config requests ``rel_selfattn``/``rel_pos`` and the task
force-falls-back to the *legacy* Transformer-XL formulation
(espnet2/tasks/mlm.py:366-392), so that is the default here:

* positions enter as a sinusoidal table over reversed positions
  (embedding.py:133-170),
* scores = ((q + u) k^T + rel_shift((q + v) p^T)) / sqrt(d_k)
  (attention.py:117-209),
* masked columns get the dtype minimum before softmax and are re-zeroed
  after (attention.py:64-96).

The "latest" RelPosition variant (2T-1 table, shift-and-crop) is also
provided for completeness.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp
from flax import linen as nn

from a3t_tpu.models.dropout import SeededDropout

from a3t_tpu.models.layers import xavier, zeros


def legacy_rel_shift(x: jnp.ndarray) -> jnp.ndarray:
    """Transformer-XL relative shift (attention.py:145-165).

    x: (B, H, T1, T2) -> same shape with scores realigned so that column j
    holds relative offset (j - i) terms.
    """
    b, h, t1, t2 = x.shape
    zp = jnp.zeros((b, h, t1, 1), x.dtype)
    xp = jnp.concatenate([zp, x], axis=-1)
    xp = xp.reshape(b, h, t2 + 1, t1)
    return xp[:, :, 1:].reshape(b, h, t1, t2)


def latest_rel_shift(x: jnp.ndarray) -> jnp.ndarray:
    """New-style shift for a (B, H, T, 2T-1) score matrix (attention.py:240-263)."""
    b, h, t1, t2 = x.shape
    zp = jnp.zeros((b, h, t1, 1), x.dtype)
    xp = jnp.concatenate([zp, x], axis=-1)
    xp = xp.reshape(b, h, t2 + 1, t1)
    return xp[:, :, 1:].reshape(b, h, t1, t2)[:, :, :, : t2 // 2 + 1]


def apply_attn_mask(scores: jnp.ndarray, mask: jnp.ndarray | None):
    """Softmax with masked columns forced to zero probability.

    mask: (B, 1, T2) or (B, T1, T2) boolean/int; 0 = masked out.
    """
    if mask is None:
        return nn.softmax(scores, axis=-1)
    m = (mask != 0)[:, None] if mask.ndim == 3 else (mask != 0)
    min_value = jnp.finfo(scores.dtype).min
    scores = jnp.where(m, scores, min_value)
    attn = nn.softmax(scores, axis=-1)
    return jnp.where(m, attn, 0.0)


class MultiHeadedAttention(nn.Module):
    """Vanilla scaled dot-product MHA (attention.py:16-114)."""

    n_head: int
    dropout_rate: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, query, key, value, mask=None, deterministic: bool = True):
        d_model = query.shape[-1]
        d_k = d_model // self.n_head

        def proj(x, name):
            y = nn.Dense(d_model, kernel_init=xavier(), bias_init=zeros,
                         dtype=self.dtype, name=name)(x)
            return y.reshape(*y.shape[:-1], self.n_head, d_k)

        q = proj(query, "linear_q")
        k = proj(key, "linear_k")
        v = proj(value, "linear_v")
        scores = jnp.einsum("bthd,bshd->bhts", q, k,
                            preferred_element_type=jnp.float32) / np.sqrt(d_k)
        attn = apply_attn_mask(scores, mask)
        # free unless the caller makes "intermediates" mutable (the
        # attention-plot path, train/plots.py)
        self.sow("intermediates", "attn", attn)
        attn = SeededDropout(self.dropout_rate)(attn, deterministic=deterministic)
        out = jnp.einsum("bhts,bshd->bthd", attn.astype(v.dtype), v)
        out = out.reshape(*out.shape[:-2], d_model)
        return nn.Dense(d_model, kernel_init=xavier(), bias_init=zeros,
                        dtype=self.dtype, name="linear_out")(out)


class RelPositionMultiHeadedAttention(nn.Module):
    """Self-attention with relative positional encoding.

    ``legacy=True`` -> LegacyRelPositionMultiHeadedAttention semantics
    (pos_emb of length T over reversed positions); ``legacy=False`` -> the
    2T-1 "latest" variant.
    """

    n_head: int
    dropout_rate: float = 0.0
    legacy: bool = True
    dtype: Optional[jnp.dtype] = None
    # fused Pallas softmax(+in-kernel dropout)+PV path
    # (ops/fused_attention.py); the rel-shifted positional scores stay an
    # XLA-computed additive bias so their gradient path is unchanged
    use_flash: bool = False

    @nn.compact
    def __call__(self, x, pos_emb, mask=None, deterministic: bool = True):
        # NOTE: deterministic is positional arg 4 for nn.remat static_argnums
        d_model = x.shape[-1]
        d_k = d_model // self.n_head
        if self.dtype is not None:
            pos_emb = pos_emb.astype(self.dtype)

        def proj(y, name, use_bias=True):
            out = nn.Dense(
                d_model,
                kernel_init=xavier(),
                bias_init=zeros,
                use_bias=use_bias,
                dtype=self.dtype,
                name=name,
            )(y)
            return out.reshape(*out.shape[:-1], self.n_head, d_k)

        q = proj(x, "linear_q")
        k = proj(x, "linear_k")
        v = proj(x, "linear_v")
        p = proj(pos_emb, "linear_pos", use_bias=False)  # (1, P, H, d_k)

        bias_u = self.param("pos_bias_u", xavier(), (self.n_head, d_k))
        bias_v = self.param("pos_bias_v", xavier(), (self.n_head, d_k))

        q_u = q + bias_u.astype(q.dtype)
        q_v = q + bias_v.astype(q.dtype)

        matrix_bd = jnp.einsum("bthd,bshd->bhts", q_v, jnp.broadcast_to(
            p, (x.shape[0],) + p.shape[1:]),
            preferred_element_type=jnp.float32)
        matrix_bd = legacy_rel_shift(matrix_bd) if self.legacy else latest_rel_shift(
            matrix_bd
        )

        flat_mask = None
        if mask is not None:
            m3 = mask if mask.ndim == 3 else mask[:, None, :]
            if m3.shape[1] == 1:
                flat_mask = m3[:, 0] != 0

        if self.use_flash and (mask is None or flat_mask is not None):
            from a3t_tpu.ops.fused_attention import fused_attention

            rate = self.dropout_rate if not deterministic else 0.0
            rng = self.make_rng("dropout") if rate > 0.0 else None
            bias = matrix_bd
            if self.dtype is not None:
                bias = bias.astype(self.dtype)
            if flat_mask is None:
                flat_mask = jnp.ones(x.shape[:2], bool)
            out = fused_attention(
                q_u.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3),
                bias, flat_mask, dropout_rate=rate, dropout_rng=rng)
            out = out.astype(v.dtype).transpose(0, 2, 1, 3)
            out = out.reshape(*out.shape[:-2], d_model)
            return nn.Dense(d_model, kernel_init=xavier(), bias_init=zeros,
                            dtype=self.dtype, name="linear_out")(out)

        matrix_ac = jnp.einsum("bthd,bshd->bhts", q_u, k,
                               preferred_element_type=jnp.float32)
        scores = (matrix_ac + matrix_bd) / np.sqrt(d_k)
        attn = apply_attn_mask(scores, mask)
        # free unless the caller makes "intermediates" mutable (the
        # attention-plot path, train/plots.py)
        self.sow("intermediates", "attn", attn)
        if self.dtype is not None:
            # softmax stays fp32; the big (B,H,T,T) prob tensor is stored,
            # dropout-masked and PV-multiplied at compute precision
            attn = attn.astype(self.dtype)
        attn = SeededDropout(self.dropout_rate)(attn, deterministic=deterministic)
        out = jnp.einsum("bhts,bshd->bthd", attn.astype(v.dtype), v)
        out = out.reshape(*out.shape[:-2], d_model)
        return nn.Dense(d_model, kernel_init=xavier(), bias_init=zeros,
                        dtype=self.dtype, name="linear_out")(out)
