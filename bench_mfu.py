"""Reproducible MFU accounting for the production train step.

Lowers the full prod-shape train step (front-end + conformer MLM +
masked-L1 + Adam) abstractly — no device execution — and reads XLA's HLO
cost analysis for the FLOP count, then divides by the measured step time
from docs/STEP_BENCH.json.  This replaces rule-of-thumb 6·N·T estimates,
which misfit this architecture (conv1d-k3 FFNs are 3x a linear FFN's
FLOPs, conv modules + postnet + front-end add more; docs/DESIGN.md).

    python bench_mfu.py          # prints one JSON dict

The count is taken on the ``xla_attn`` variant of bench_step (identical
matmul FLOPs to prod; the Pallas flash kernel does not lower on CPU).
The HLO is lowered, never compiled or run, so this runs anywhere.
"""

from __future__ import annotations

import json
import os


# v5e (lite) bf16 peak: 197 TFLOP/s per chip (public spec)
V5E_BF16_PEAK = 197e12


def main():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    if jax.config.jax_platforms != "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_prng_impl", "unsafe_rbg")

    import numpy as np
    import jax.numpy as jnp

    import bench_step
    from a3t_tpu.data import make_synthetic_batch
    from a3t_tpu.dsp import LogMelConfig, LogMelFrontend
    from a3t_tpu.models import A3TMLMModel, A3TModelConfig, EncoderConfig
    from a3t_tpu.train import (
        OptimConfig, create_train_state, make_optimizer, make_train_step)
    from a3t_tpu.train.train_step import featurize

    hop, n_frames, batch_size = (
        bench_step.HOP, bench_step.N_FRAMES, bench_step.BATCH)
    fe = LogMelFrontend(LogMelConfig())
    model = A3TMLMModel(A3TModelConfig(
        vocab_size=80,
        encoder=EncoderConfig(cnn_module_kernel=7, compute_dtype="bfloat16",
                              use_flash_attention=False),
        decoder=EncoderConfig(cnn_module_kernel=31,
                              compute_dtype="bfloat16",
                              use_flash_attention=False)))
    tx = make_optimizer(OptimConfig())

    rng = np.random.default_rng(0)
    batch = make_synthetic_batch(
        rng, batch_size=batch_size, n_samples=hop * (n_frames - 1),
        n_text=64, hop_length=hop, vocab_size=80, fs=fe.config.fs)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    state_shape = jax.eval_shape(
        lambda b: create_train_state(model, tx,
                                     featurize(fe, b, use_fused=False)),
        batch)
    step = make_train_step(model, fe, donate=False)
    key = jax.random.PRNGKey(0)
    lowered = jax.jit(step).lower(state_shape, batch, key)
    cost = lowered.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = float(cost["flops"])

    n_params = sum(
        int(np.prod(x.shape))
        for x in jax.tree_util.tree_leaves(state_shape.params))
    bench_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "docs", "STEP_BENCH.json")
    ms = None
    if os.path.exists(bench_path):
        with open(bench_path) as f:
            ms = json.load(f).get("prod", {}).get("ms_per_step")

    out = {
        "batch": batch_size,
        "n_frames": n_frames,
        "n_params": n_params,
        "tflop_per_step": flops / 1e12,
        "ms_per_step": ms,
        "mfu_vs_v5e_bf16_peak": (
            None if ms is None
            else flops / (ms / 1e3) / V5E_BF16_PEAK),
        "note": "flops from XLA HLO cost analysis of the lowered "
                "train step (fwd+bwd+Adam), xla_attn variant",
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
