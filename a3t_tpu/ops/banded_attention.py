"""Pallas TPU kernels: banded self-attention with global text tokens.

The TPU equivalent of the reference's TVM-compiled CUDA diagonal-matmul
kernel (espnet/nets/pytorch_backend/transformer/diagonaled_mm_tvm.py:8-329)
used by Longformer attention — including its custom backward (the reference
kernel is an autograd.Function used in *training*).  One fused forward
kernel computes, per query chunk of ``c = window // 2`` speech frames:

    scores = [q @ K_band^T ; q @ K_text^T] / sqrt(d)   (MXU)
    softmax over the 3c-band + text columns             (VPU, in VMEM)
    out    = attn @ [V_band ; V_text]                   (MXU)

so neither the (T, 3c) score band nor the probabilities ever reach HBM.
The backward is the flash-attention dataflow: the forward saves one
logsumexp per query row, the backward recomputes probabilities in VMEM
(two kernels: query-chunk-centric for dq + the global text-side grads,
key-chunk-centric for dk/dv).  Text queries (a short global block) are
handled by the caller with a plain einsum.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from a3t_tpu.ops.fused_attention import _dropout_mask

_NEG = np.float32(-1e30)

# draw offset separating the text-mask draw from the band-mask draw under
# one (seed, lane); folded into the counter in interpret mode and into the
# hardware seed on TPU (prng_seed restarts the stream per call, so the two
# draws would otherwise return identical bits — see _random_bits)
_TEXT_DRAW = 1 << 20


def _chunk_spec(c, d, nc, offset):
    def index_map(bi, hi, ci):
        return (bi, hi, jnp.clip(ci + offset, 0, nc - 1), 0, 0)
    return pl.BlockSpec((1, 1, 1, c, d), index_map, memory_space=pltpu.VMEM)


def _row_spec(c, nc, offset):
    """(B, H, nc, 1, c) per-row statistics (lse / delta); the singleton
    axis keeps the trailing block dims TPU-tileable."""
    def index_map(bi, hi, ci):
        return (bi, hi, jnp.clip(ci + offset, 0, nc - 1), 0, 0)
    return pl.BlockSpec((1, 1, 1, 1, c), index_map, memory_space=pltpu.VMEM)


def _text_spec(tt, d):
    return pl.BlockSpec((1, 1, tt, d), lambda bi, hi, ci: (bi, hi, 0, 0),
                        memory_space=pltpu.VMEM)


def _txm_spec(tt):
    return pl.BlockSpec((1, 1, tt), lambda bi, hi, ci: (bi, 0, 0),
                        memory_space=pltpu.VMEM)


def _bandm_spec(c):
    """(B, nc, 1, 3c) per-chunk banded key-validity, precomputed by the
    wrapper (phantom edge chunks and padded keys are already zeroed —
    Mosaic cannot concatenate 1-D mask vectors in-kernel)."""
    return pl.BlockSpec((1, 1, 1, 3 * c),
                        lambda bi, hi, ci: (bi, ci, 0, 0),
                        memory_space=pltpu.VMEM)


def _spm_spec(c):
    """(B, nc, 1, c) key-chunk validity (dkv pass)."""
    return pl.BlockSpec((1, 1, 1, c),
                        lambda bi, hi, ci: (bi, ci, 0, 0),
                        memory_space=pltpu.VMEM)


def _band_masks(band, text, tm, kmask):
    """Mask invalid band keys (phantom edges + padding, precomputed as a
    (1, 3c) row) and invalid text keys."""
    band = jnp.where(kmask > 0, band, _NEG)
    text = jnp.where(tm[0] > 0, text, _NEG)
    return band, text


def _fwd_call(q, k, v, k_text, v_text, txm, bandm, seed, window: int,
              rate: float, interpret: bool):
    b, h, t, d = q.shape
    c = window // 2
    nc = t // c
    tt = k_text.shape[2]
    scale = np.float32(1.0 / np.sqrt(d))

    def kernel(seed_r, q_r, kp, kc, kn, kt, vp, vc, vn, vt, tm, bm,
               out, lse):
        bi, hi, ci = pl.program_id(0), pl.program_id(1), pl.program_id(2)
        qq = q_r[0, 0, 0]
        kb = jnp.concatenate([kp[0, 0, 0], kc[0, 0, 0], kn[0, 0, 0]], axis=0)
        vb = jnp.concatenate([vp[0, 0, 0], vc[0, 0, 0], vn[0, 0, 0]], axis=0)

        band = jax.lax.dot_general(
            qq, kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (c, 3c)
        text = jax.lax.dot_general(
            qq, kt[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (c, Tt)
        band, text = _band_masks(band, text, tm, bm[0, 0])

        m = jnp.maximum(band.max(axis=1, keepdims=True),
                        text.max(axis=1, keepdims=True))
        eb = jnp.exp(band - m)
        et = jnp.exp(text - m)
        denom = eb.sum(axis=1, keepdims=True) + et.sum(axis=1, keepdims=True)
        if rate > 0.0:
            # dropout on the *probabilities*: the denominator stays the
            # un-dropped softmax normalizer (reference semantics — dropout
            # is applied to the attention matrix after softmax)
            lane = (bi * h + hi) * nc + ci
            eb = eb * _dropout_mask(eb.shape, rate, seed_r[0], lane,
                                    interpret)
            et = et * _dropout_mask(et.shape, rate, seed_r[0], lane,
                                    interpret, offset=_TEXT_DRAW)
        res = (
            jnp.dot(eb, vb, preferred_element_type=jnp.float32)
            + jnp.dot(et, vt[0, 0], preferred_element_type=jnp.float32)
        ) / denom
        out[0, 0, 0] = res.astype(out.dtype)
        lse[0, 0, 0, 0] = (m + jnp.log(denom))[:, 0]

    cs = functools.partial(_chunk_spec, c, d, nc)

    def to_chunks(x):
        return x.reshape(b, h, nc, c, d)

    out, lse = pl.pallas_call(
        kernel,
        grid=(b, h, nc),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
            cs(0),                     # q
            cs(-1), cs(0), cs(1),      # k band
            _text_spec(tt, d),         # k text
            cs(-1), cs(0), cs(1),      # v band
            _text_spec(tt, d),         # v text
            _txm_spec(tt),
            _bandm_spec(c),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 1, c, d),
                         lambda bi, hi, ci: (bi, hi, ci, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, 1, c),
                         lambda bi, hi, ci: (bi, hi, ci, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, nc, c, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, nc, 1, c), jnp.float32),
        ],
        interpret=interpret,
    )(
        seed, to_chunks(q), to_chunks(k), to_chunks(k), to_chunks(k), k_text,
        to_chunks(v), to_chunks(v), to_chunks(v), v_text, txm, bandm,
    )
    return out.reshape(b, h, t, d), lse


def _bwd_dq_call(q, k, v, k_text, v_text, txm, bandm, out_g, lse, delta,
                 seed, window: int, rate: float, interpret: bool):
    """Query-chunk pass: dq + the accumulated global text-side grads."""
    b, h, t, d = q.shape
    c = window // 2
    nc = t // c
    tt = k_text.shape[2]
    scale = np.float32(1.0 / np.sqrt(d))

    def kernel(seed_r, q_r, kp, kc, kn, kt, vp, vc, vn, vt, tm, bm,
               do_r, lse_r, dl_r, dq, dkt, dvt):
        bi, hi, i = pl.program_id(0), pl.program_id(1), pl.program_id(2)
        qq = q_r[0, 0, 0]
        kb = jnp.concatenate([kp[0, 0, 0], kc[0, 0, 0], kn[0, 0, 0]], axis=0)
        vb = jnp.concatenate([vp[0, 0, 0], vc[0, 0, 0], vn[0, 0, 0]], axis=0)
        do = do_r[0, 0, 0].astype(jnp.float32)
        l_i = lse_r[0, 0, 0, 0][:, None]
        d_i = dl_r[0, 0, 0, 0][:, None]

        band = jax.lax.dot_general(
            qq, kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        text = jax.lax.dot_general(
            qq, kt[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        band, text = _band_masks(band, text, tm, bm[0, 0])

        pb = jnp.exp(band - l_i)  # (c, 3c); masked entries exp(-inf) = 0
        pt = jnp.exp(text - l_i)  # (c, Tt)

        if rate > 0.0:
            # regenerate the forward's masks: same (seed, lane), same order
            lane = (bi * h + hi) * nc + i
            keep_b = _dropout_mask(pb.shape, rate, seed_r[0], lane,
                                   interpret)
            keep_t = _dropout_mask(pt.shape, rate, seed_r[0], lane,
                                   interpret, offset=_TEXT_DRAW)
        else:
            keep_b = keep_t = None

        dp_b = jax.lax.dot_general(
            do, vb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp_t = jax.lax.dot_general(
            do, vt[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if keep_b is not None:
            dp_b = dp_b * keep_b
            dp_t = dp_t * keep_t
        ds_b = pb * (dp_b - d_i)
        ds_t = pt * (dp_t - d_i)

        dq_i = (jnp.dot(ds_b, kb, preferred_element_type=jnp.float32)
                + jnp.dot(ds_t, kt[0, 0],
                          preferred_element_type=jnp.float32)) * scale
        dq[0, 0, 0] = dq_i.astype(dq.dtype)

        dkt_p = jax.lax.dot_general(  # (Tt, d) = ds_t^T @ q
            ds_t, qq, (((0,), (0,)), ((), ()))) * scale
        pt_d = pt * keep_t if keep_t is not None else pt
        dvt_p = jax.lax.dot_general(  # (Tt, d) = p_t_dropped^T @ do
            pt_d, do, (((0,), (0,)), ((), ())))

        @pl.when(i == 0)
        def _init():
            dkt[0, 0] = jnp.zeros_like(dkt[0, 0])
            dvt[0, 0] = jnp.zeros_like(dvt[0, 0])

        dkt[0, 0] += dkt_p.astype(dkt.dtype)
        dvt[0, 0] += dvt_p.astype(dvt.dtype)

    cs = functools.partial(_chunk_spec, c, d, nc)
    rs = functools.partial(_row_spec, c, nc)

    def to_chunks(x):
        return x.reshape(b, h, nc, c, d)

    dq, dkt, dvt = pl.pallas_call(
        kernel,
        grid=(b, h, nc),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
            cs(0),
            cs(-1), cs(0), cs(1),
            _text_spec(tt, d),
            cs(-1), cs(0), cs(1),
            _text_spec(tt, d),
            _txm_spec(tt),
            _bandm_spec(c),
            cs(0),   # dout
            rs(0),   # lse
            rs(0),   # delta
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 1, c, d),
                         lambda bi, hi, ci: (bi, hi, ci, 0, 0),
                         memory_space=pltpu.VMEM),
            _text_spec(tt, d),
            _text_spec(tt, d),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, nc, c, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, tt, d), jnp.float32),
            jax.ShapeDtypeStruct((b, h, tt, d), jnp.float32),
        ],
        interpret=interpret,
    )(
        seed, to_chunks(q), to_chunks(k), to_chunks(k), to_chunks(k), k_text,
        to_chunks(v), to_chunks(v), to_chunks(v), v_text, txm, bandm,
        to_chunks(out_g), lse, delta,
    )
    return dq.reshape(b, h, t, d), dkt, dvt


def _bwd_dkv_call(q, k, v, spm, out_g, lse, delta, seed, window: int,
                  rate: float, interpret: bool):
    """Key-chunk pass: dk/dv from the three neighbouring query chunks."""
    b, h, t, d = q.shape
    c = window // 2
    nc = t // c
    scale = np.float32(1.0 / np.sqrt(d))

    def kernel(seed_r, k_r, v_r, m_r, qp, qc, qn, dop, doc, don, lp, lc, ln,
               dp_, dc_, dn_, dk, dv):
        bi, hi = pl.program_id(0), pl.program_id(1)
        j = pl.program_id(2)
        n_j = pl.num_programs(2)
        kk = k_r[0, 0, 0]
        vv = v_r[0, 0, 0]
        kmask = m_r[0, 0, 0] > 0  # (1, c): this key chunk's validity

        dk_acc = jnp.zeros((c, d), jnp.float32)
        dv_acc = jnp.zeros((c, d), jnp.float32)
        neighbours = (
            (-1, qp, dop, lp, dp_),
            (0, qc, doc, lc, dc_),
            (1, qn, don, ln, dn_),
        )
        for off, q_r, do_r, l_r, dl_r in neighbours:
            i_q = j + off
            valid = jnp.logical_and(i_q >= 0, i_q <= n_j - 1)
            w = jnp.where(valid, jnp.float32(1.0), jnp.float32(0.0))
            qq = q_r[0, 0, 0]
            do = do_r[0, 0, 0].astype(jnp.float32)
            l_i = l_r[0, 0, 0, 0][:, None]
            d_i = dl_r[0, 0, 0, 0][:, None]

            s = jax.lax.dot_general(
                qq, kk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale  # (c, c)
            s = jnp.where(kmask, s, _NEG)  # forward masked padded keys
            p = jnp.exp(s - l_i)
            dp = jax.lax.dot_general(
                do, vv, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if rate > 0.0:
                # regenerate query chunk i_q's full (c, 3c) band mask (the
                # forward's first draw under its lane) and slice the column
                # block where key chunk j sits: offsets -1/0/+1 land in
                # blocks 2/1/0 of the band
                lane = (bi * h + hi) * nc + i_q
                keep_full = _dropout_mask((c, 3 * c), rate, seed_r[0],
                                          lane, interpret)
                blk = 1 - off
                keep = keep_full[:, blk * c : (blk + 1) * c]
                dp = dp * keep
                p_d = p * keep
            else:
                p_d = p
            ds = p * (dp - d_i)

            dv_acc += w * jax.lax.dot_general(  # p_dropped^T @ do
                p_d, do, (((0,), (0,)), ((), ())))
            dk_acc += w * scale * jax.lax.dot_general(  # ds^T @ q
                ds, qq, (((0,), (0,)), ((), ())))

        dk[0, 0, 0] = dk_acc.astype(dk.dtype)
        dv[0, 0, 0] = dv_acc.astype(dv.dtype)

    cs = functools.partial(_chunk_spec, c, d, nc)
    rs = functools.partial(_row_spec, c, nc)

    def to_chunks(x):
        return x.reshape(b, h, nc, c, d)

    dk, dv = pl.pallas_call(
        kernel,
        grid=(b, h, nc),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
            cs(0), cs(0),                    # k_j, v_j
            _spm_spec(c),                    # k_j's validity
            cs(-1), cs(0), cs(1),            # q neighbours
            cs(-1), cs(0), cs(1),            # dout neighbours
            rs(-1), rs(0), rs(1),            # lse neighbours
            rs(-1), rs(0), rs(1),            # delta neighbours
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 1, c, d),
                         lambda bi, hi, ci: (bi, hi, ci, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, c, d),
                         lambda bi, hi, ci: (bi, hi, ci, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, nc, c, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, nc, c, d), q.dtype),
        ],
        interpret=interpret,
    )(
        seed, to_chunks(k), to_chunks(v), spm,
        to_chunks(q), to_chunks(q), to_chunks(q),
        to_chunks(out_g), to_chunks(out_g), to_chunks(out_g),
        lse, lse, lse, delta, delta, delta,
    )
    return dk.reshape(b, h, t, d), dv.reshape(b, h, t, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def _banded_attention(q, k, v, k_text, v_text, txm, bandm, spm, seed,
                      window, rate, interpret):
    out, _ = _fwd_call(q, k, v, k_text, v_text, txm, bandm, seed, window,
                       rate, interpret)
    return out


def _banded_fwd(q, k, v, k_text, v_text, txm, bandm, spm, seed, window,
                rate, interpret):
    out, lse = _fwd_call(q, k, v, k_text, v_text, txm, bandm, seed, window,
                         rate, interpret)
    return out, (q, k, v, k_text, v_text, txm, bandm, spm, seed, out, lse)


def _banded_bwd(window, rate, interpret, residuals, g):
    q, k, v, k_text, v_text, txm, bandm, spm, seed, out, lse = residuals
    b, h, t, d = q.shape
    c = window // 2
    nc = t // c
    # delta = rowsum(dout * out) — the softmax-backward correction term
    delta = (g.astype(jnp.float32) * out.astype(jnp.float32)).sum(-1)
    delta = delta.reshape(b, h, nc, 1, c)

    dq, dkt, dvt = _bwd_dq_call(q, k, v, k_text, v_text, txm, bandm, g, lse,
                                delta, seed, window, rate, interpret)
    dk, dv = _bwd_dkv_call(q, k, v, spm, g, lse, delta, seed, window, rate,
                           interpret)
    return (dq, dk, dv, dkt.astype(k_text.dtype), dvt.astype(v_text.dtype),
            None, None, None, None)


_banded_attention.defvjp(_banded_fwd, _banded_bwd)


def banded_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    k_text: jnp.ndarray,
    v_text: jnp.ndarray,
    text_mask: jnp.ndarray,
    window: int,
    speech_mask: jnp.ndarray | None = None,
    dropout_rate: float = 0.0,
    dropout_rng: jnp.ndarray | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fused banded attention for the speech queries (differentiable).

    Args:
        q, k, v:        (B, H, T, d) speech-side tensors, T % (window//2) == 0
        k_text, v_text: (B, H, Tt, d) global text keys/values
        text_mask:      (B, Tt) validity of text tokens
        window:         full window size (band = +/- window//2)
        speech_mask:    optional (B, T) validity of speech keys (padding)
        dropout_rate / dropout_rng: in-kernel attention-prob dropout (the
            reference trains Longformer attention with dropout,
            fsp2_conformer.yaml transformer-attn-dropout-rate); the mask is
            regenerated in both backward kernels from one int32 seed
    Returns:
        (B, H, T, d) attention outputs for the speech queries.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if dropout_rate > 0.0:
        if dropout_rng is None:
            raise ValueError("dropout_rate > 0 needs dropout_rng")
        seed = jax.random.randint(
            dropout_rng, (1,), minval=0, maxval=np.iinfo(np.int32).max,
            dtype=jnp.int32)
    else:
        seed = jnp.zeros((1,), jnp.int32)
    b, h, t, d = q.shape
    c = window // 2
    if t % c != 0:
        raise ValueError(f"T={t} not a multiple of half-window {c}")
    nc = t // c
    if k_text.shape[2] == 0:
        # speech-only batches: keep the kernel's text block non-empty but
        # fully masked (its probabilities come out exactly 0)
        k_text = jnp.zeros((b, h, 128, d), k_text.dtype)
        v_text = jnp.zeros((b, h, 128, d), v_text.dtype)
        text_mask = jnp.zeros((b, 128), bool)
    tt = k_text.shape[2]
    txm = jnp.broadcast_to(
        text_mask[:, None, :].astype(jnp.int32), (b, 1, tt))
    if speech_mask is None:
        m = jnp.ones((b, nc, c), jnp.int32)
    else:
        m = speech_mask.astype(jnp.int32).reshape(b, nc, c)
    # banded key validity per query chunk, phantom edge chunks zeroed
    zero = jnp.zeros_like(m[:, :1])
    prev = jnp.concatenate([zero, m[:, :-1]], axis=1)
    nxt = jnp.concatenate([m[:, 1:], zero], axis=1)
    bandm = jnp.concatenate([prev, m, nxt], axis=2)[:, :, None, :]
    spm = m[:, :, None, :]
    return _banded_attention(q, k, v, k_text, v_text, txm, bandm, spm, seed,
                             window, float(dropout_rate), interpret)
