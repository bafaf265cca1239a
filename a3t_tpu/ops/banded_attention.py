"""Pallas TPU kernel: banded self-attention with global text tokens.

The TPU equivalent of the reference's TVM-compiled CUDA diagonal-matmul
kernel (espnet/nets/pytorch_backend/transformer/diagonaled_mm_tvm.py:8-329)
used by Longformer attention.  One fused kernel computes, per query chunk of
``c = window // 2`` speech frames:

    scores = [q @ K_band^T ; q @ K_text^T] / sqrt(d)   (MXU)
    softmax over the 3c-band + text columns             (VPU, in VMEM)
    out    = attn @ [V_band ; V_text]                   (MXU)

so neither the (T, 3c) score band nor the probabilities ever reach HBM.
Text queries (a short global block) are handled by the caller with a plain
einsum.  Forward-only: training uses the XLA chunked formulation in
models/windowed_attention.py (same math, autodiff-able); this kernel serves
long-audio inference where T is large.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def banded_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    k_text: jnp.ndarray,
    v_text: jnp.ndarray,
    text_mask: jnp.ndarray,
    window: int,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fused banded attention for the speech queries.

    Args:
        q, k, v:        (B, H, T, d) speech-side tensors, T % (window//2) == 0
        k_text, v_text: (B, H, Tt, d) global text keys/values
        text_mask:      (B, Tt) validity of text tokens
        window:         full window size (band = +/- window//2)
    Returns:
        (B, H, T, d) attention outputs for the speech queries.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, t, d = q.shape
    c = window // 2
    if t % c != 0:
        raise ValueError(f"T={t} not a multiple of half-window {c}")
    nc = t // c
    tt = k_text.shape[2]

    txm = jnp.broadcast_to(
        text_mask[:, None, :].astype(jnp.int32), (b, 1, tt))

    def chunk_spec(offset):
        def index_map(bi, hi, ci):
            return (bi, hi, jnp.clip(ci + offset, 0, nc - 1), 0, 0)
        return pl.BlockSpec((1, 1, 1, c, d), index_map,
                            memory_space=pltpu.VMEM)

    text_spec = pl.BlockSpec(
        (1, 1, tt, d), lambda bi, hi, ci: (bi, hi, 0, 0),
        memory_space=pltpu.VMEM)
    txm_spec = pl.BlockSpec(
        (1, 1, tt), lambda bi, hi, ci: (bi, 0, 0), memory_space=pltpu.VMEM)

    def to_chunks(x):
        return x.reshape(b, h, nc, c, d)

    scale = np.float32(1.0 / np.sqrt(d))

    def kernel(q_r, kp, kc, kn, kt, vp, vc, vn, vt, tm, out):
        i = pl.program_id(2)
        n_i = pl.num_programs(2)
        qq = q_r[0, 0, 0]
        kb = jnp.concatenate([kp[0, 0, 0], kc[0, 0, 0], kn[0, 0, 0]], axis=0)
        vb = jnp.concatenate([vp[0, 0, 0], vc[0, 0, 0], vn[0, 0, 0]], axis=0)

        band = jax.lax.dot_general(
            qq, kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (c, 3c)
        text = jax.lax.dot_general(
            qq, kt[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (c, Tt)

        neg = jnp.float32(-1e30)
        col = jax.lax.broadcasted_iota(jnp.int32, (c, 3 * c), 1)
        band = jnp.where((i == 0) & (col < c), neg, band)
        band = jnp.where((i == n_i - 1) & (col >= 2 * c), neg, band)
        text = jnp.where(tm[0] > 0, text, neg)

        m = jnp.maximum(band.max(axis=1, keepdims=True),
                        text.max(axis=1, keepdims=True))
        eb = jnp.exp(band - m)
        et = jnp.exp(text - m)
        denom = eb.sum(axis=1, keepdims=True) + et.sum(axis=1, keepdims=True)
        res = (
            jnp.dot(eb, vb, preferred_element_type=jnp.float32)
            + jnp.dot(et, vt[0, 0], preferred_element_type=jnp.float32)
        ) / denom
        out[0, 0, 0] = res.astype(out.dtype)

    out = pl.pallas_call(
        kernel,
        grid=(b, h, nc),
        in_specs=[
            chunk_spec(0),                                   # q
            chunk_spec(-1), chunk_spec(0), chunk_spec(1),    # k band
            text_spec,                                       # k text
            chunk_spec(-1), chunk_spec(0), chunk_spec(1),    # v band
            text_spec,                                       # v text
            txm_spec,
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 1, c, d), lambda bi, hi, ci: (bi, hi, ci, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, nc, c, d), q.dtype),
        interpret=interpret,
    )(
        to_chunks(q), to_chunks(k), to_chunks(k), to_chunks(k), k_text,
        to_chunks(v), to_chunks(v), to_chunks(v), v_text, txm,
    )
    return out.reshape(b, h, t, d)
