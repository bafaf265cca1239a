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


def gather_audio(corpus, batch: dict, hop_length: int):
    """Assemble the (B, S) audio batch on device from the HBM-resident
    flat int16 corpus (RecordDataset.flat_pcm).

    The host ships only per-utterance sample offsets (+ lengths); the
    batch audio is a vmapped dynamic-slice gather, zero-masked beyond
    each utterance's true length so the result is bit-identical to the
    host-assembled batch (which zero-pads).  Static slice size S is
    recovered from the bucket's frame count ((F - 1) * hop, the
    BucketSpec invariant), so every bucket keeps its one-compile shape.
    """
    n_frames = batch["masked_position"].shape[1]
    n_samples = (n_frames - 1) * hop_length
    offsets = batch["audio_offset"]

    def one(off):
        return jax.lax.dynamic_slice(corpus, (off,), (n_samples,))

    audio = jax.vmap(one)(offsets)
    valid = (jnp.arange(n_samples, dtype=jnp.int32)[None, :]
             < batch["audio_lengths"][:, None])
    return jnp.where(valid, audio, jnp.zeros((), audio.dtype))


def featurize(frontend: LogMelFrontend, batch: dict, use_fused: bool = True,
              use_pallas: bool = False, normalizer=None, corpus=None):
    """Raw-audio batch -> model input batch (all on device, inside jit).

    ``use_fused=True`` (default) runs the DFT-as-matmul formulation — two
    MXU matmuls that XLA pipelines, avoiding its scalar-unit TPU FFT; the
    explicit Pallas kernel (ops/fused_logmel.py, ``use_pallas=True``)
    computes the same chain bit-identically without materializing the
    linear spectrum in HBM.  ``use_fused=False`` is the rfft reference
    path.  When the batch carries ``audio_offset`` instead of ``audio``
    (BatcherConfig.device_audio), the waveforms are gathered from the
    device-resident ``corpus`` buffer first.
    """
    if "audio_offset" in batch:
        if corpus is None:
            raise ValueError(
                "batch has audio_offset (device_audio batcher) but no "
                "corpus buffer was provided to featurize/make_train_step")
        audio = gather_audio(corpus, batch, frontend.config.hop_length)
    else:
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
    out = dict(
        speech=feats,
        text=batch["text"],
        masked_position=masked_position,
        speech_mask=speech_mask,
        text_mask=batch["text_mask"],
        speech_segment_pos=batch["speech_segment_pos"],
        text_segment_pos=batch["text_segment_pos"],
    )
    if "spemb" in batch:
        # utterance-level x-vector conditioning (A3TModelConfig.spemb_dim)
        out["spemb"] = batch["spemb"]
    return out


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


def _make_step_core(
    model: A3TMLMModel,
    frontend: Optional[LogMelFrontend],
    mesh=None,
    speech_only: bool = False,
    normalizer=None,
    use_fused: bool = True,
) -> Callable:
    """The un-jitted step: (state, batch, rng, corpus) -> (state, stats).

    Shared by make_train_step (one jit per step) and
    make_chained_train_step (k steps scanned inside one jit)."""
    has_duration = model.config.duration_predictor_layers > 0
    seq_sharded = seq_axis_size(mesh) > 1

    def loss_fn(params, batch_stats, batch, rng, corpus):
        mb = featurize(frontend, batch, use_fused=use_fused,
                       normalizer=normalizer, corpus=corpus) \
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

    def step_fn(state: TrainState, batch: dict, rng, corpus=None) -> tuple:
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (new_stats, stats)), grads = grad_fn(
            state.params, state.batch_stats, batch, rng, corpus
        )
        stats["grad_norm"] = optax.global_norm(grads)
        new_state = state.apply_gradients(grads, new_stats)
        # skipped-step counter from apply_if_finite (the reference's
        # non-finite-grad guard, trainer.py:640-657)
        if hasattr(new_state.opt_state, "notfinite_count"):
            stats["notfinite_count"] = new_state.opt_state.notfinite_count
        return new_state, stats

    return step_fn


def make_train_step(
    model: A3TMLMModel,
    frontend: Optional[LogMelFrontend],
    mesh=None,
    speech_only: bool = False,
    donate: bool = True,
    normalizer=None,
    use_fused: bool = True,
    corpus=None,
) -> Callable:
    """Build the jitted train step: (state, batch, rng) -> (state, metrics).

    ``corpus`` is the optional device-resident flat int16 PCM buffer
    (RecordDataset.flat_pcm): batches then carry ``audio_offset`` and the
    waveforms are gathered on device (see gather_audio).  It is passed to
    the jitted function as an argument — the same buffer every call, so
    there is no per-step transfer and no retracing.
    """

    step_fn = _make_step_core(model, frontend, mesh=mesh,
                              speech_only=speech_only,
                              normalizer=normalizer, use_fused=use_fused)

    donate_argnums = (0,) if donate else ()
    if mesh is None:
        jitted = jax.jit(step_fn, donate_argnums=donate_argnums)
    else:
        # the corpus buffer (when used) is replicated: every data-parallel
        # rank gathers its own batch rows from a full local copy
        shardings = (None, batch_sharding(mesh), replicated(mesh))
        if corpus is not None:
            shardings = shardings + (replicated(mesh),)
        jitted = jax.jit(step_fn, in_shardings=shardings,
                         donate_argnums=donate_argnums)
    if corpus is None:
        return jitted
    return lambda state, batch, rng: jitted(state, batch, rng, corpus)


def make_chained_train_step(
    model: A3TMLMModel,
    frontend: Optional[LogMelFrontend],
    k: int,
    speech_only: bool = False,
    donate: bool = True,
    normalizer=None,
    use_fused: bool = True,
    corpus=None,
) -> Callable:
    """``k`` optimizer steps per dispatch via an in-graph lax.scan.

    (state, stacked_batch, rng, valid) -> (state, stacked_metrics): every
    batch leaf carries a leading ``k`` axis; ``valid[i]=False`` sub-steps
    (tail padding of a bucket's last group) leave the state untouched and
    zero their metrics.  Per-sub-step dropout keys come from
    ``jax.random.split(rng, k)``.

    Why: on a remote-tunneled chip each dispatch pays a full round trip
    (~120 ms measured) that the device cannot hide because consecutive
    train steps are data-dependent.  Chaining k steps into one program
    amortizes that to ~RTT/k; the same technique lets bench_step time
    steady-state device speed.  The reference has no analogue — its
    trainer blocks per step (espnet2/train/trainer.py:583-640).
    """
    if model.config.duration_predictor_layers > 0:
        raise NotImplementedError(
            "steps_per_dispatch > 1 is not wired for the duration/TTS "
            "train step")

    inner = _make_step_core(model, frontend, speech_only=speech_only,
                            normalizer=normalizer, use_fused=use_fused)

    def chained_fn(state, stacked, rng, valid, corpus=None):
        keys = jax.random.split(rng, k)

        def body(st, xs):
            batch_i, key_i, v = xs
            new_st, stats = inner(st, batch_i, key_i, corpus)
            st = jax.tree_util.tree_map(
                lambda n, o: jnp.where(v, n, o), new_st, st)
            stats = jax.tree_util.tree_map(
                lambda s: jnp.where(v, s, jnp.zeros_like(s)), stats)
            return st, stats

        state, stats = jax.lax.scan(body, state, (stacked, keys, valid))
        return state, stats

    jitted = jax.jit(chained_fn, donate_argnums=(0,) if donate else ())
    if corpus is None:
        return jitted
    return lambda state, stacked, rng, valid: jitted(
        state, stacked, rng, valid, corpus)


def make_tts_train_step(
    model: A3TMLMModel,
    frontend: LogMelFrontend,
    mesh=None,
    donate: bool = True,
    corpus=None,
) -> Callable:
    """Train step for the duration-aware TTS variant (ESPnetMLMTTSModel,
    sedit_model.py:454-503): gathers the duration-reduced sequence with the
    batcher's ``reordered_index``, runs ``tts_forward`` (encoder on reduced
    frames, length-regulated decoder), and adds the masked duration loss."""

    seq_sharded = seq_axis_size(mesh) > 1

    def loss_fn(params, batch_stats, batch, rng, corpus):
        mb = featurize(frontend, batch, corpus=corpus)
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

    def step_fn(state: TrainState, batch: dict, rng, corpus=None):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (new_stats, stats)), grads = grad_fn(
            state.params, state.batch_stats, batch, rng, corpus)
        stats["grad_norm"] = optax.global_norm(grads)
        return state.apply_gradients(grads, new_stats), stats

    donate_argnums = (0,) if donate else ()
    if mesh is None:
        jitted = jax.jit(step_fn, donate_argnums=donate_argnums)
    else:
        shardings = (None, batch_sharding(mesh), replicated(mesh))
        if corpus is not None:
            shardings = shardings + (replicated(mesh),)
        jitted = jax.jit(step_fn, in_shardings=shardings,
                         donate_argnums=donate_argnums)
    if corpus is None:
        return jitted
    return lambda state, batch, rng: jitted(state, batch, rng, corpus)


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
