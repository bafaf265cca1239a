"""The jitted, mesh-sharded A3T training step.

One jit covers the whole hot path of the reference's
``train_one_epoch`` (espnet2/train/trainer.py:491-693) *plus* the feature
extraction the reference does on CPU in the collate fn: raw audio enters the
device, a fused STFT→mel→log front-end produces features, the Conformer MLM
model computes the masked L1 loss, gradients all-reduce over the ``data``
mesh axis (XLA psum — the NCCL analogue), and Adam+Noam updates apply.

Batches are dicts of statically-shaped arrays (see data/batcher.py):

    audio              (B, S)   float32   raw waveform, zero-padded
    audio_lengths      (B,)     int32
    text               (B, T)   int32     phone ids (0 = pad)
    text_mask          (B, T)   bool
    masked_position    (B, F)   bool      F = 1 + S // hop
    speech_segment_pos (B, F)   int32
    text_segment_pos   (B, T)   int32
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from a3t_tpu.dsp import LogMelFrontend
from a3t_tpu.models.mlm import A3TMLMModel, mlm_loss
from a3t_tpu.models.layers import duration_loss as duration_loss_fn
from a3t_tpu.parallel.mesh import (
    DATA_AXIS, SEQ_AXIS, batch_sharding, replicated, seq_axis_size)
from jax.sharding import NamedSharding, PartitionSpec as P


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
        )


def create_train_state(model: A3TMLMModel, tx, sample_batch, rng=None) -> TrainState:
    """Initialize params/batch_stats from a (host) sample batch."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    variables = model.init(rng, **sample_batch, train=False)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        tx=tx,
    )


def featurize(frontend: LogMelFrontend, batch: dict, use_fused: bool = True,
              use_pallas: bool = False, normalizer=None):
    """Raw-audio batch -> model input batch (all on device, inside jit).

    ``use_fused=True`` (default) runs the DFT-as-matmul formulation — two
    MXU matmuls that XLA pipelines, avoiding its scalar-unit TPU FFT; the
    explicit Pallas kernel (ops/fused_logmel.py, ``use_pallas=True``)
    computes the same chain bit-identically without materializing the
    linear spectrum in HBM.  ``use_fused=False`` is the rfft reference
    path.
    """
    audio = batch["audio"]
    if audio.dtype == jnp.int16:
        # int16 PCM shipped over the host->device link (half the bytes,
        # data/batcher.py audio_int16); dequantize on device
        audio = audio.astype(jnp.float32) * (1.0 / 32768.0)
    if use_pallas:
        from a3t_tpu.ops import fused_logmel

        feats, flens = fused_logmel(
            audio, frontend.config, batch["audio_lengths"])
    else:
        fe = frontend.fused if use_fused else frontend
        feats, flens = fe(audio, batch["audio_lengths"])
    if normalizer is not None:
        feats = normalizer(feats)
    n_f = feats.shape[1]
    speech_mask = jnp.arange(n_f)[None, :] < flens[:, None]
    # Reference multiplies the sampled mask by the non-pad mask
    # (collate_fn.py:381-382).
    masked_position = batch["masked_position"] & speech_mask
    return dict(
        speech=feats,
        text=batch["text"],
        masked_position=masked_position,
        speech_mask=speech_mask,
        text_mask=batch["text_mask"],
        speech_segment_pos=batch["speech_segment_pos"],
        text_segment_pos=batch["text_segment_pos"],
    )


def constrain_time_sharding(mb: dict, mesh) -> dict:
    """Shard the frame (time) axis of the featurized batch over ``seq``.

    Context parallelism: the raw-audio front-end is replicated across the
    small seq group (it is measured-free, docs/STEP_BENCH.json nofrontend),
    then every (B, F, ...) tensor is constrained to
    ``P(data, seq, ...)`` so the conformer stack — where the FLOPs and
    activation memory live — runs time-sharded.  For windowed attention
    GSPMD lowers the band structure to collective-permute halo exchanges;
    for full attention it all-gathers K/V (standard sequence parallelism).
    Gradients reduce over both ``data`` and ``seq`` automatically.
    """
    n_f = mb["speech"].shape[1]
    sp = seq_axis_size(mesh)
    if n_f % sp != 0:
        # GSPMD's non-divisible shard padding miscomputes through the
        # rel-shift reshape (verified: F=41 over seq=2 diverges 1.5%,
        # F=40 matches to 3e-5) — require frame buckets to be multiples
        # of the seq axis instead of silently training on wrong numerics.
        raise ValueError(
            f"sequence parallelism needs the frame bucket ({n_f}) to be "
            f"a multiple of the seq axis ({sp}); adjust "
            "BatcherConfig.bucket_frames"
        )
    spec3 = NamedSharding(mesh, P(DATA_AXIS, SEQ_AXIS, None))
    spec2 = NamedSharding(mesh, P(DATA_AXIS, SEQ_AXIS))
    out = dict(mb)
    out["speech"] = jax.lax.with_sharding_constraint(mb["speech"], spec3)
    for k in ("masked_position", "speech_mask", "speech_segment_pos"):
        out[k] = jax.lax.with_sharding_constraint(mb[k], spec2)
    return out


def make_train_step(
    model: A3TMLMModel,
    frontend: Optional[LogMelFrontend],
    mesh=None,
    speech_only: bool = False,
    donate: bool = True,
    normalizer=None,
    use_fused: bool = True,
) -> Callable:
    """Build the jitted train step: (state, batch, rng) -> (state, metrics)."""

    has_duration = model.config.duration_predictor_layers > 0
    seq_sharded = seq_axis_size(mesh) > 1

    def loss_fn(params, batch_stats, batch, rng):
        mb = featurize(frontend, batch, use_fused=use_fused,
                       normalizer=normalizer) \
            if frontend is not None else batch
        if seq_sharded:
            mb = constrain_time_sharding(mb, mesh)
        (before, after, log_d), updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            **mb,
            train=True,
            speech_only=speech_only,
            rngs={"dropout": rng},
            mutable=["batch_stats"],
        )
        loss = mlm_loss(
            before, after, mb["speech"], mb["masked_position"],
            use_mse=model.config.use_mse_loss,
        )
        stats = {"loss_mlm": loss}
        if has_duration and "durations" in batch:
            w = mb["masked_position"].astype(jnp.float32)
            dl = duration_loss_fn(log_d, batch["durations"])
            dl = (dl * w).sum() / (w.sum() + 1e-10)
            loss = loss + dl
            stats["loss_duration"] = dl
        stats["loss"] = loss
        stats["masked_frames"] = mb["masked_position"].sum()
        return loss, (updates["batch_stats"], stats)

    def step_fn(state: TrainState, batch: dict, rng) -> tuple:
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (new_stats, stats)), grads = grad_fn(
            state.params, state.batch_stats, batch, rng
        )
        stats["grad_norm"] = optax.global_norm(grads)
        new_state = state.apply_gradients(grads, new_stats)
        # skipped-step counter from apply_if_finite (the reference's
        # non-finite-grad guard, trainer.py:640-657)
        if hasattr(new_state.opt_state, "notfinite_count"):
            stats["notfinite_count"] = new_state.opt_state.notfinite_count
        return new_state, stats

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    bsharding = batch_sharding(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(None, bsharding, replicated(mesh)),
        donate_argnums=(0,) if donate else (),
    )


def make_tts_train_step(
    model: A3TMLMModel,
    frontend: LogMelFrontend,
    mesh=None,
    donate: bool = True,
) -> Callable:
    """Train step for the duration-aware TTS variant (ESPnetMLMTTSModel,
    sedit_model.py:454-503): gathers the duration-reduced sequence with the
    batcher's ``reordered_index``, runs ``tts_forward`` (encoder on reduced
    frames, length-regulated decoder), and adds the masked duration loss."""

    seq_sharded = seq_axis_size(mesh) > 1

    def loss_fn(params, batch_stats, batch, rng):
        mb = featurize(frontend, batch)
        if seq_sharded:
            # the duration-reduction gather crosses shard boundaries (GSPMD
            # all-gathers the operand), but the conformer stack — where the
            # FLOPs live — still runs time-sharded on the reduced sequence
            mb = constrain_time_sharding(mb, mesh)
        n_f = mb["speech"].shape[1]
        ri = batch["reordered_index"]

        def red(x):
            return jnp.take_along_axis(x, ri, axis=1)

        reduced_valid = (
            jnp.arange(n_f)[None, :] < batch["reduced_lengths"][:, None]
        ) & red(mb["speech_mask"])
        reduced = dict(
            speech=jnp.take_along_axis(mb["speech"], ri[..., None], axis=1),
            text=mb["text"],
            masked_position=red(mb["masked_position"]) & reduced_valid,
            speech_mask=reduced_valid,
            text_mask=mb["text_mask"],
            speech_segment_pos=red(mb["speech_segment_pos"]),
            text_segment_pos=mb["text_segment_pos"],
            durations=red(batch["durations"]),
        )
        (before, after, log_d), updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            **reduced,
            out_frames=n_f,
            train=True,
            rngs={"dropout": rng},
            mutable=["batch_stats"],
            method=model.tts_forward,
        )
        loss_mlm = mlm_loss(
            before, after, mb["speech"], mb["masked_position"],
            use_mse=model.config.use_mse_loss,
        )
        w = reduced["masked_position"].astype(jnp.float32)
        dl = duration_loss_fn(log_d, reduced["durations"])
        dl = (dl * w).sum() / (w.sum() + 1e-10)
        loss = loss_mlm + dl
        stats = {"loss": loss, "loss_mlm": loss_mlm, "loss_duration": dl}
        return loss, (updates["batch_stats"], stats)

    def step_fn(state: TrainState, batch: dict, rng):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (new_stats, stats)), grads = grad_fn(
            state.params, state.batch_stats, batch, rng)
        stats["grad_norm"] = optax.global_norm(grads)
        return state.apply_gradients(grads, new_stats), stats

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())
    return jax.jit(
        step_fn,
        in_shardings=(None, batch_sharding(mesh), replicated(mesh)),
        donate_argnums=(0,) if donate else (),
    )


def make_eval_step(model, frontend, mesh=None, speech_only: bool = False,
                   normalizer=None):
    """Validation step (no grads, running batch stats)."""

    seq_sharded = seq_axis_size(mesh) > 1

    def step_fn(state: TrainState, batch: dict):
        mb = featurize(frontend, batch, normalizer=normalizer) \
            if frontend is not None else batch
        if seq_sharded:
            mb = constrain_time_sharding(mb, mesh)
        before, after, _ = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            **mb,
            train=False,
            speech_only=speech_only,
        )
        loss = mlm_loss(
            before, after, mb["speech"], mb["masked_position"],
            use_mse=model.config.use_mse_loss,
        )
        return {"loss": loss, "loss_mlm": loss}

    if mesh is None:
        return jax.jit(step_fn)
    return jax.jit(step_fn, in_shardings=(None, batch_sharding(mesh)))
