"""Fused full-attention Pallas kernel with in-kernel dropout.

The production A3T config uses *full* (legacy rel-pos) attention over
~500-frame sequences; step-time ablations (docs/STEP_BENCH.json) show the
XLA formulation pays ~15 ms/step for attention-prob dropout plus several
HBM materializations of the (B, H, T, T) score/prob tensors.  Whole rows
fit VMEM at these lengths, so one kernel per (batch, head) computes

    s    = (q_u @ k^T + bias) / sqrt(d)     (MXU; bias = the XLA-computed
                                             legacy-rel-shifted pos scores)
    p    = softmax(s) * col_mask            (VPU, fp32)
    out  = (p * dropout_mask / keep) @ v    (MXU)

without the probabilities or the dropout mask ever reaching HBM — the
dropout mask is regenerated in the backward kernel from the same
(seed, b, h) PRNG stream (flash-attention-2 style; residuals are one
logsumexp per row).  The positional-score *gradient* is `ds`, emitted to
HBM so XLA can chain it through the rel-shift into linear_pos.

The bias stays an input (rather than fusing the p-matmul + rel-shift)
because the legacy shift mixes adjacent query rows (see
tests/test_fused_attention.py for the identity) — a gather in-kernel;
one bf16 bias read costs far less.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = np.float32(-1e30)


def _specs(l, d, tl):
    mat = pl.BlockSpec((1, 1, l, d), lambda bi, hi: (bi, hi, 0, 0),
                       memory_space=pltpu.VMEM)
    sq = pl.BlockSpec((1, 1, l, tl), lambda bi, hi: (bi, hi, 0, 0),
                      memory_space=pltpu.VMEM)
    msk = pl.BlockSpec((1, 1, tl), lambda bi, hi: (bi, 0, 0),
                       memory_space=pltpu.VMEM)
    row = pl.BlockSpec((1, 1, 1, l), lambda bi, hi: (bi, hi, 0, 0),
                       memory_space=pltpu.VMEM)
    seed = pl.BlockSpec(memory_space=pltpu.SMEM)
    return mat, sq, msk, row, seed


def _random_bits(shape, seed, lane, interpret: bool, offset: int = 0):
    """uint32 stream keyed by (seed, lane): the hardware PRNG on TPU, a
    counter-based hash in interpret mode (prng_seed has no CPU lowering).
    Forward and backward call this with identical keys, so the dropout
    mask regenerates exactly.  ``lane`` folds the grid coordinates into one
    integer (Mosaic takes at most two seed values); ``offset`` distinguishes
    several draws under the same lane.  On hardware each call re-seeds the
    PRNG (prng_seed restarts the stream — two calls with the same key would
    return the same bits), so the offset must be folded into the seed."""
    if not interpret:
        hw_seed = seed
        if offset:
            hw_seed = seed.astype(jnp.uint32) ^ np.uint32(
                (offset * 2654435761) & 0xFFFFFFFF)
        pltpu.prng_seed(hw_seed, lane)
        bits = pltpu.prng_random_bits(shape)
        return bits.astype(jnp.uint32) if bits.dtype != jnp.uint32 else bits
    # xxhash-style integer mix over a flat counter
    n = int(np.prod(shape))
    ctr = jax.lax.broadcasted_iota(jnp.uint32, (n, 1), 0)[:, 0]
    ctr = ctr + np.uint32(offset)
    x = (ctr * np.uint32(2654435761)
         + seed.astype(jnp.uint32) * np.uint32(2246822519)
         + jnp.asarray(lane).astype(jnp.uint32) * np.uint32(374761393))
    for shift, mult in ((15, 2246822519), (13, 3266489917)):
        x = x ^ (x >> np.uint32(shift))
        x = x * np.uint32(mult)
    x = x ^ (x >> np.uint32(16))
    return x.reshape(shape)


def _dropout_mask(shape, rate: float, seed, lane, interpret: bool,
                  offset: int = 0):
    """keep-mask / keep_prob from the seeded in-kernel PRNG stream."""
    bits = _random_bits(shape, seed, lane, interpret, offset)
    threshold = np.uint32(int(rate * 0xFFFFFFFF))
    keep = (bits >= threshold).astype(jnp.float32)
    return keep * np.float32(1.0 / (1.0 - rate))


def _fwd_call(q_u, k, v, bias, mask, seed, rate: float, interpret: bool):
    b, h, l, d = q_u.shape
    tl = k.shape[2]
    scale = np.float32(1.0 / np.sqrt(d))

    def kernel(seed_r, q_r, k_r, v_r, b_r, m_r, out, lse):
        bi = pl.program_id(0)
        hi = pl.program_id(1)
        s = (jax.lax.dot_general(
            q_r[0, 0], k_r[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
            + b_r[0, 0].astype(jnp.float32)) * scale
        valid = m_r[0] > 0  # (1, tl)
        s = jnp.where(valid, s, _NEG)
        m = s.max(axis=1, keepdims=True)
        e = jnp.exp(s - m)
        denom = e.sum(axis=1, keepdims=True)
        p = e / denom
        # espnet re-zeroes masked columns after softmax (attention.py:64-96)
        p = jnp.where(valid, p, 0.0)
        if rate > 0.0:
            p = p * _dropout_mask(p.shape, rate, seed_r[0], bi * 4096 + hi,
                                  interpret)
        out[0, 0] = jax.lax.dot_general(
            p, v_r[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(out.dtype)
        lse[0, 0, 0] = (m + jnp.log(denom))[:, 0]

    mat, sq, msk, row, seed_spec = _specs(l, d, tl)
    out, lse = pl.pallas_call(
        kernel,
        grid=(b, h),
        in_specs=[seed_spec, mat, mat, mat, sq, msk],
        out_specs=[mat, row],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, l, d), q_u.dtype),
            jax.ShapeDtypeStruct((b, h, 1, l), jnp.float32),
        ],
        interpret=interpret,
    )(seed, q_u, k, v, bias, mask)
    return out, lse


def _bwd_call(q_u, k, v, bias, mask, seed, out, lse, g, rate: float,
              interpret: bool):
    b, h, l, d = q_u.shape
    tl = k.shape[2]
    scale = np.float32(1.0 / np.sqrt(d))
    delta = (g.astype(jnp.float32) * out.astype(jnp.float32)).sum(-1)
    delta = delta[:, :, None, :]  # (B, H, 1, L)

    def kernel(seed_r, q_r, k_r, v_r, b_r, m_r, do_r, l_r, dl_r,
               dq, dk, dv, dbias):
        bi = pl.program_id(0)
        hi = pl.program_id(1)
        s = (jax.lax.dot_general(
            q_r[0, 0], k_r[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
            + b_r[0, 0].astype(jnp.float32)) * scale
        valid = m_r[0] > 0
        s = jnp.where(valid, s, _NEG)
        p = jnp.exp(s - l_r[0, 0, 0][:, None])
        p = jnp.where(valid, p, 0.0)
        if rate > 0.0:
            keep = _dropout_mask(p.shape, rate, seed_r[0], bi * 4096 + hi,
                                 interpret)
        else:
            keep = None
        do = do_r[0, 0].astype(jnp.float32)
        p_d = p * keep if keep is not None else p

        dv[0, 0] = jax.lax.dot_general(  # p_d^T @ do
            p_d, do, (((0,), (0,)), ((), ()))).astype(dv.dtype)
        dp = jax.lax.dot_general(  # do @ v^T
            do, v_r[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if keep is not None:
            dp = dp * keep
        ds = p * (dp - dl_r[0, 0, 0][:, None]) * scale
        dq[0, 0] = jax.lax.dot_general(  # ds @ k
            ds, k_r[0, 0], (((1,), (0,)), ((), ()))).astype(dq.dtype)
        dk[0, 0] = jax.lax.dot_general(  # ds^T @ q_u
            ds, q_r[0, 0], (((0,), (0,)), ((), ()))).astype(dk.dtype)
        dbias[0, 0] = ds.astype(dbias.dtype)

    mat, sq, msk, row, seed_spec = _specs(l, d, tl)
    dq, dk, dv, dbias = pl.pallas_call(
        kernel,
        grid=(b, h),
        in_specs=[seed_spec, mat, mat, mat, sq, msk, mat, row, row],
        out_specs=[mat, mat, mat, sq],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, l, d), q_u.dtype),
            jax.ShapeDtypeStruct((b, h, l, d), k.dtype),
            jax.ShapeDtypeStruct((b, h, l, d), v.dtype),
            jax.ShapeDtypeStruct((b, h, l, tl), bias.dtype),
        ],
        interpret=interpret,
    )(seed, q_u, k, v, bias, mask, g, lse, delta)
    return dq, dk, dv, dbias


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _fused_attention(q_u, k, v, bias, mask, seed, rate, interpret):
    out, _ = _fwd_call(q_u, k, v, bias, mask, seed, rate, interpret)
    return out


def _fused_fwd(q_u, k, v, bias, mask, seed, rate, interpret):
    out, lse = _fwd_call(q_u, k, v, bias, mask, seed, rate, interpret)
    return out, (q_u, k, v, bias, mask, seed, out, lse)


def _fused_bwd(rate, interpret, res, g):
    q_u, k, v, bias, mask, seed, out, lse = res
    dq, dk, dv, dbias = _bwd_call(q_u, k, v, bias, mask, seed, out, lse, g,
                                  rate, interpret)
    return dq, dk, dv, dbias, None, None


_fused_attention.defvjp(_fused_fwd, _fused_bwd)


def fused_attention(
    q_u: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,
    mask: jnp.ndarray,
    dropout_rate: float = 0.0,
    dropout_rng: jnp.ndarray | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fused softmax(+dropout)+PV attention for full-sequence scores.

    Args:
        q_u:  (B, H, L, d) query (+pos_bias_u already added, unscaled)
        k, v: (B, H, L, d)
        bias: (B, H, L, L) additive pre-scale score bias (the rel-shifted
              positional scores); its gradient flows back through XLA
        mask: (B, L) key validity
        dropout_rate / dropout_rng: attention-prob dropout; the rng is
              folded to one int32 seed (mask regenerated in backward)
    Returns:
        (B, H, L, d) attention output (fp32 accumulated).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, l, d = q_u.shape
    if dropout_rate > 0.0:
        if dropout_rng is None:
            raise ValueError("dropout_rate > 0 needs dropout_rng")
        seed = jax.random.randint(
            dropout_rng, (1,), minval=0, maxval=np.iinfo(np.int32).max,
            dtype=jnp.int32)
    else:
        seed = jnp.zeros((1,), jnp.int32)
    m = mask.astype(jnp.int32).reshape(b, 1, l)
    return _fused_attention(q_u, k, v, bias, m, seed,
                            float(dropout_rate), interpret)
