"""Real-chip kernel benchmarks: banded attention + log-mel front-end.

Measures, at long-audio shapes, the three ways to compute the longformer
attention band (fused Pallas kernel / XLA chunked einsums / full attention)
for forward and forward+backward, and the three front-end paths (rfft /
DFT-matmul / fused Pallas).  Writes docs/KERNEL_BENCH.json.

Timing follows the axon rule: every iteration fetches a concrete value to
synchronize (block_until_ready returns early through the tunnel).
"""

from __future__ import annotations

import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=3, warmup=2):
    """ms per call.  fn must be jitted and already amortize dispatch
    internally (see chain()) — the axon tunnel costs ~30 ms per
    dispatch+fetch round trip, so per-op timing must divide it away."""
    for _ in range(warmup):
        r = fn(*args)
        _ = float(jnp.asarray(r).ravel()[0].astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
        _ = float(jnp.asarray(r).ravel()[0].astype(jnp.float32))
    return (time.perf_counter() - t0) / iters * 1e3  # ms


REPEAT = 50  # inner chained repetitions per dispatch


def chain(fn, repeat=REPEAT):
    """fn(q, *rest) -> jit of `repeat` sequential applications feeding the
    output back as q (shapes must match), so one dispatch measures
    `repeat` executions."""

    @jax.jit
    def run(q, *rest):
        return jax.lax.fori_loop(
            0, repeat, lambda i, acc: fn(acc, *rest), q)

    return run


def bench_attention(b, h, t, d_k, tt, window, dtype=jnp.float32):
    from a3t_tpu.ops.banded_attention import banded_attention

    c = window // 2
    rng = np.random.default_rng(0)

    def mk(*shape):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32),
                           dtype=dtype)

    q, k, v = mk(b, h, t, d_k), mk(b, h, t, d_k), mk(b, h, t, d_k)
    kt, vt = mk(b, h, tt, d_k), mk(b, h, tt, d_k)
    tmask = jnp.ones((b, tt), bool)
    scale = 1.0 / np.sqrt(d_k)

    # --- candidates (speech-query part only; same math) -------------------
    def pallas_fwd(q, k, v):
        return banded_attention(q, k, v, kt, vt, tmask, window)

    def chunked_fwd(q, k, v):
        nc = t // c
        qc = q.reshape(b, h, nc, c, d_k)
        kc_ = k.reshape(b, h, nc, c, d_k)
        vc_ = v.reshape(b, h, nc, c, d_k)
        z = jnp.zeros_like(kc_[:, :, :1])
        kb = jnp.concatenate([
            jnp.concatenate([z, kc_[:, :, :-1]], 2), kc_,
            jnp.concatenate([kc_[:, :, 1:], z], 2)], 3)  # (B,H,nc,3c,d)
        vb = jnp.concatenate([
            jnp.concatenate([z, vc_[:, :, :-1]], 2), vc_,
            jnp.concatenate([vc_[:, :, 1:], z], 2)], 3)
        band = jnp.einsum("bhncd,bhnkd->bhnck", qc, kb,
                          preferred_element_type=jnp.float32) * scale
        valid = np.ones((nc, 3 * c), bool)
        valid[0, :c] = False
        valid[-1, 2 * c:] = False
        band = jnp.where(jnp.asarray(valid)[None, None, :, None, :], band,
                         jnp.float32(-1e30))
        text = jnp.einsum("bhncd,bhsd->bhncs", qc, kt,
                          preferred_element_type=jnp.float32) * scale
        s = jnp.concatenate([band, text], -1)
        p = jax.nn.softmax(s, -1)
        ob = jnp.einsum("bhnck,bhnkd->bhncd",
                        p[..., : 3 * c].astype(vb.dtype), vb)
        ot = jnp.einsum("bhncs,bhsd->bhncd",
                        p[..., 3 * c:].astype(vt.dtype), vt)
        return (ob + ot).reshape(b, h, t, d_k)

    def full_fwd(q, k, v):
        allk = jnp.concatenate([k, kt], 2)
        allv = jnp.concatenate([v, vt], 2)
        s = jnp.einsum("bhtd,bhsd->bhts", q, allk,
                       preferred_element_type=jnp.float32) * scale
        qi = np.arange(t)[:, None] // c
        ki = np.arange(t)[None, :] // c
        ok = np.concatenate(
            [np.abs(qi - ki) <= 1, np.ones((t, tt), bool)], 1)
        s = jnp.where(jnp.asarray(ok)[None, None], s, jnp.float32(-1e30))
        p = jax.nn.softmax(s, -1)
        return jnp.einsum("bhts,bhsd->bhtd", p.astype(allv.dtype), allv)

    def pallas_drop_fwd(q, k, v):
        return banded_attention(q, k, v, kt, vt, tmask, window,
                                dropout_rate=0.2,
                                dropout_rng=jax.random.PRNGKey(0))

    results = {}
    cands = {"pallas": pallas_fwd, "pallas_drop": pallas_drop_fwd,
             "chunked": chunked_fwd}
    if t <= 4096:  # full attention OOMs/crawls beyond this
        cands["full"] = full_fwd
    for name, fn in cands.items():
        results[f"{name}_fwd_ms"] = timeit(chain(fn), q, k, v) / REPEAT

        def gstep(q, k, v, fn=fn):
            return jax.grad(
                lambda qq, kk, vv: (fn(qq, kk, vv) ** 2).sum(),
                argnums=(0, 1, 2))(q, k, v)[0]

        results[f"{name}_fwdbwd_ms"] = timeit(
            chain(gstep), q, k, v) / REPEAT
    for k_, v_ in list(results.items()):
        results[k_] = round(v_, 4)
    return results


def bench_frontend(b, seconds, cfg=None):
    from a3t_tpu.dsp import LogMelConfig, LogMelFrontend
    from a3t_tpu.ops import fused_logmel

    cfg = cfg or LogMelConfig()  # 24 kHz production settings
    fe = LogMelFrontend(cfg)
    n = int(cfg.fs * seconds) // cfg.hop_length * cfg.hop_length
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32) * 0.1)
    lengths = jnp.full((b,), n, jnp.int32)

    def chained(mel_fn):
        # feed a scalar of the mel back into the audio so the loop stays
        # sequential and the extraction can't be hoisted
        def body(a):
            mel = mel_fn(a)
            return a * (1.0 + 1e-20 * mel[0, 0, 0])

        return chain(body, repeat=20)

    out = {}
    out["rfft_ms"] = timeit(
        chained(lambda a: fe(a, lengths)[0]), audio) / 20
    out["dft_matmul_ms"] = timeit(
        chained(lambda a: fe.fused(a, lengths)[0]), audio) / 20
    out["pallas_ms"] = timeit(
        chained(lambda a: fused_logmel(a, cfg, lengths)[0]), audio) / 20
    frames = b * (n // cfg.hop_length + 1)
    for k_, v_ in list(out.items()):
        out[k_.replace("_ms", "_mframes_per_s")] = round(
            frames / (v_ / 1e3) / 1e6, 2)
        out[k_] = round(out[k_], 4)
    return out


def main():
    report = {"device": str(jax.devices()[0])}

    print("== banded attention ==", flush=True)
    for t, window in ((4096, 256), (8192, 256), (8192, 512)):
        key = f"attn_b2_h2_t{t}_d192_w{window}"
        r = bench_attention(b=2, h=2, t=t, d_k=192, tt=128, window=window)
        report[key] = r
        print(key, json.dumps(r), flush=True)

    print("== frontend (24 kHz, hop 300) ==", flush=True)
    for b, sec in ((8, 10.0), (32, 10.0)):
        key = f"frontend_b{b}_{int(sec)}s"
        r = bench_frontend(b, sec)
        report[key] = r
        print(key, json.dumps(r), flush=True)

    with open("docs/KERNEL_BENCH.json", "w") as f:
        json.dump(report, f, indent=1)
    print("wrote docs/KERNEL_BENCH.json")


if __name__ == "__main__":
    main()
