"""Step-time ablations at the production bench shape (real chip).

Chains R training steps inside one jit dispatch (the axon tunnel costs
~30 ms per dispatch+fetch, so per-step timing must amortize it) and
reports ms/step for config variants — the measurement base for step-time
optimization work.

    python bench_step.py [--variants prod nodrop ...]

Writes docs/STEP_BENCH.json.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time

import numpy as np

HOP = 300
N_FRAMES = 432
BATCH = 88
REPEAT = 20


def build(variant: str):
    import jax

    jax.config.update("jax_default_prng_impl", "unsafe_rbg")
    import jax.numpy as jnp

    from a3t_tpu.data import make_synthetic_batch
    from a3t_tpu.dsp import LogMelConfig, LogMelFrontend
    from a3t_tpu.models import A3TMLMModel, A3TModelConfig, EncoderConfig
    from a3t_tpu.train import (
        OptimConfig, create_train_state, make_optimizer, make_train_step)
    from a3t_tpu.train.train_step import featurize

    enc_kw: dict = dict(cnn_module_kernel=7, compute_dtype="bfloat16")
    dec_kw: dict = dict(cnn_module_kernel=31, compute_dtype="bfloat16")
    model_kw: dict = {}
    precompute_feats = False
    # production 24 kHz shape unless a variant overrides
    fe_kw: dict = {}
    hop, n_frames, batch_size = HOP, N_FRAMES, BATCH
    long_variants = ("longformer", "longformer_chunked", "full_4096",
                     "longformer_8192", "longformer_chunked_8192",
                     "full_8192")
    if variant in long_variants:
        # long-audio path: 16 kHz front-end (tasks/mlm.py:544-548),
        # T=4096/8192-frame utterances, same 3e6-numel budget -> batch
        # 9/4; banded Pallas kernel vs XLA chunked einsum vs full (flash)
        # attention — which attention wins at each production length
        # (reference long-audio kernel: diagonaled_mm_tvm.py:8-329)
        fe_kw = dict(fs=16000, n_fft=1024, hop_length=200, win_length=800)
        T = 8192 if variant.endswith("8192") else 4096
        hop, n_frames, batch_size = 200, T, (4 if T == 8192 else 9)
        for kw in (enc_kw, dec_kw):
            # exact-softmax comparisons: attention dropout off everywhere
            kw["attention_dropout_rate"] = 0.0
            if not variant.startswith("full"):
                kw["selfattention_layer_type"] = "longformer"
                kw["attention_window"] = 256
                kw["use_pallas_attention"] = variant.startswith(
                    "longformer") and "chunked" not in variant
    if variant == "fp32":
        enc_kw["compute_dtype"] = dec_kw["compute_dtype"] = "float32"
    if variant == "xla_attn":
        enc_kw["use_flash_attention"] = False
        dec_kw["use_flash_attention"] = False
    if variant == "nofrontend":
        # features precomputed outside the step: sizes the on-device
        # DFT-matmul front-end's share of the step
        precompute_feats = True
    if variant == "noconv":
        enc_kw["use_cnn_module"] = False
        dec_kw["use_cnn_module"] = False
    if variant == "linear_ffn":
        enc_kw["positionwise_layer_type"] = "linear"
        dec_kw["positionwise_layer_type"] = "linear"
    if variant == "shifted_ffn":
        # conv1d-k3 FFN as 3 shifted matmuls (identical numerics; tests
        # whether the MXU matmul path beats XLA's conv lowering)
        enc_kw["positionwise_layer_type"] = "conv1d_shifted"
        dec_kw["positionwise_layer_type"] = "conv1d_shifted"
    if variant == "bn_bf16":
        # conv-module BatchNorm in bf16 (sizes the fp32 cast+reduce share
        # of the ~23 ms conv-module cost)
        enc_kw["cnn_module_bn_compute_dtype"] = True
        dec_kw["cnn_module_bn_compute_dtype"] = True
    if variant == "shifted_conv":
        # depthwise conv as k shifted multiply-adds (identical numerics;
        # tests whether the VPU broadcast path beats XLA's grouped-conv
        # lowering — the conv modules are ~23 ms of the prod step)
        enc_kw["cnn_module_shifted"] = True
        dec_kw["cnn_module_shifted"] = True
    if variant == "nopostnet":
        model_kw["postnet_layers"] = 0
    # Dropout mask bit-generator A/B: this bench runs under
    # jax_default_prng_impl=unsafe_rbg (hardware RngBitGenerator), but the
    # production trainer derives threefry keys — "threefry_dropout"
    # measures what real training pays for software PRNG bits, and
    # models/dropout.py::set_prng_impl is the knob that closes the gap.
    from a3t_tpu.models import dropout as _dropout

    _dropout.set_prng_impl(
        "threefry" if variant == "threefry_dropout" else "unsafe_rbg")
    if variant in ("noattndrop", "nodrop"):
        enc_kw["attention_dropout_rate"] = 0.0
        dec_kw["attention_dropout_rate"] = 0.0
    if variant == "nodrop":
        for kw in (enc_kw, dec_kw):
            kw["dropout_rate"] = 0.0
            kw["positional_dropout_rate"] = 0.0
    if variant == "remat_attention":
        enc_kw["remat_attention"] = True
        dec_kw["remat_attention"] = True
    if variant in ("flash", "flash_nodrop", "flash_only_attn_drop"):
        enc_kw["use_flash_attention"] = True
        dec_kw["use_flash_attention"] = True
        if variant == "flash_nodrop":
            enc_kw["attention_dropout_rate"] = 0.0
            dec_kw["attention_dropout_rate"] = 0.0
        if variant == "flash_only_attn_drop":
            # attention dropout stays (free, in-kernel); every elementwise
            # dropout site off — sizes the remaining dropout cost
            for kw in (enc_kw, dec_kw):
                kw["dropout_rate"] = 0.0
                kw["positional_dropout_rate"] = 0.0

    fe = LogMelFrontend(LogMelConfig(**fe_kw))
    model = A3TMLMModel(A3TModelConfig(
        vocab_size=80, encoder=EncoderConfig(**enc_kw),
        decoder=EncoderConfig(**dec_kw), **model_kw))
    tx = make_optimizer(OptimConfig())

    rng = np.random.default_rng(0)
    host_batch = make_synthetic_batch(
        rng, batch_size=batch_size, n_samples=hop * (n_frames - 1),
        n_text=64, hop_length=hop, vocab_size=80, fs=fe.config.fs)
    batch = {k: jnp.asarray(v) for k, v in host_batch.items()}
    small = {k: v[:2] for k, v in batch.items()}
    state = create_train_state(
        model, tx, featurize(fe, small, use_fused=False))
    if precompute_feats:
        batch = jax.jit(lambda b: featurize(fe, b))(batch)
        step = make_train_step(model, None, donate=False)
    else:
        step = make_train_step(model, fe, donate=False)

    @jax.jit
    def run_n(state, batch, key):
        def body(i, carry):
            st, k = carry
            k, sk = jax.random.split(k)
            st, _ = step.__wrapped__(st, batch, sk) \
                if hasattr(step, "__wrapped__") else step(st, batch, sk)
            return (st, k)

        st, _ = jax.lax.fori_loop(0, REPEAT, body, (state, key))
        return st

    return state, batch, run_n, (batch_size, n_frames)


def measure(variant: str, reps: int = 3) -> tuple:
    import jax
    import jax.numpy as jnp

    state, batch, run_n, shape = build(variant)
    key = jax.random.PRNGKey(0)
    # warmup/compile
    st = run_n(state, batch, key)
    _ = float(jnp.asarray(st.step))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        st = run_n(state, batch, key)
        _ = float(jnp.asarray(st.step))
        times.append((time.perf_counter() - t0) / REPEAT * 1e3)
    return min(times), shape


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", nargs="+",
                    default=["prod", "xla_attn", "flash_only_attn_drop",
                             "nodrop", "nofrontend", "noconv",
                             "linear_ffn", "shifted_ffn", "shifted_conv",
                             "nopostnet", "fp32"])
    args = ap.parse_args()

    import os

    # merge into the existing table so partial runs don't clobber it —
    # stale file first, fresh metadata and measurements overwrite
    path = "docs/STEP_BENCH.json"
    report = {}
    if os.path.exists(path):
        with open(path) as f:
            report = json.load(f)
    report.update({"batch": BATCH, "n_frames": N_FRAMES, "repeat": REPEAT})
    for v in args.variants:
        ms, (bsz, n_frames) = measure(v)
        report[v] = {"ms_per_step": round(ms, 1),
                     "frames_per_s": round(bsz * n_frames / (ms / 1e3))}
        if (bsz, n_frames) != (BATCH, N_FRAMES):
            report[v]["batch"] = bsz
            report[v]["n_frames"] = n_frames
        print(v, json.dumps(report[v]), flush=True)

    os.makedirs("docs", exist_ok=True)
    with open(path, "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
