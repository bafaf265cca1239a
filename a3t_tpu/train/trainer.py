"""The training loop (reference: espnet2/train/trainer.py:94-837).

Epoch structure is kept for parity with the reference's reporting and
retention semantics (fixed ``num_iters_per_epoch`` — already the reference's
XLA-friendly shape, fsp2_conformer.yaml:5), but everything inside an epoch
is a stream of identical jitted steps.  Differences from the reference:

* no DDP wrapper / all_reduce plumbing — the train step is already
  mesh-sharded and XLA emits the collectives;
* no SLURM scontrol self-resubmit dance — preemption safety comes from
  every-epoch checkpoints (and ``resume=True`` picks up the latest);
* data order on resume is reproducible via epoch-seeded iterators,
  like the reference's epoch-seeded samplers
  (iterators/sequence_iter_factory.py:28-35).
"""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import Callable, Iterable, Optional

import jax
import numpy as np

from a3t_tpu.train.checkpoint import CheckpointManager, warm_start_params
from a3t_tpu.train.reporter import Reporter

logger = logging.getLogger("a3t_tpu")


def _batch_weight(batch) -> float:
    """Batch size for weighted stat averaging; handles (corpus, batch)
    tuples from the multi-corpus factory."""
    if isinstance(batch, tuple):
        batch = batch[1]
    if isinstance(batch, dict):
        for key in ("audio", "audio_lengths"):
            if key in batch:
                return float(batch[key].shape[0])
    return 1.0


def _register_pending(sub, pending) -> float:
    """Flush deferred per-step stats into the reporter phase.

    Entries are either (stats, weight) from single-step dispatch or
    ("chained", stacked_stats, weights, valid) from a chained dispatch —
    the latter unpacks into one register per valid sub-step.  Returns the
    last registered loss (for the progress log line)."""
    last_loss = float("nan")
    for entry in pending:
        if len(entry) == 4 and entry[0] == "chained":
            _, stats, weights, valid = entry
            host = {k: np.asarray(v) for k, v in stats.items()}
            for i in range(len(valid)):
                if not valid[i]:
                    continue
                sub.register({k: v[i] for k, v in host.items()},
                             weight=float(weights[i]))
                last_loss = float(host["loss"][i])
        else:
            s, w = entry
            sub.register(s, weight=w)
            last_loss = float(np.asarray(s["loss"]))
    return last_loss


def _total_notfinite(opt_state):
    """Cumulative skipped-step count from optax.apply_if_finite, or None
    when the optimizer isn't wrapped (e.g. tests with a bare optimizer)."""
    tn = getattr(opt_state, "total_notfinite", None)
    if tn is None:
        return None
    return int(jax.device_get(tn))


@dataclasses.dataclass
class TrainerConfig:
    max_epoch: int = 1500
    num_iters_per_epoch: Optional[int] = 800
    keep_nbest_models: int = 5
    best_model_criterion: tuple = ("valid", "loss", "min")
    patience: Optional[int] = None
    log_interval: int = 50
    seed: int = 0
    resume: bool = True
    average_nbest_at_end: bool = True
    # write a jax.profiler trace of iters [10, 15) of epoch 1 to this dir
    profile_dir: Optional[str] = None
    # extra mid-epoch full-state checkpoints (preemption safety at scale;
    # the reference only checkpoints per epoch + SLURM resubmits)
    save_interval_steps: Optional[int] = None
    # walltime-aware self-resubmission (reference trainer.py:179-198,
    # 459-475 + utils/slurm.py): when less budget remains than the longest
    # observed epoch, checkpoint, run `resubmit_command` (e.g. an sbatch /
    # gcloud queued-resources call re-launching this job; resume picks the
    # checkpoint up), and stop.  None disables.
    max_walltime_sec: Optional[float] = None
    resubmit_command: Optional[str] = None
    # warm-start: when no resume checkpoint exists, load model params from a
    # params-only orbax dir (an ``ave_*`` export or ``bin/export_params``
    # stash) and start with a fresh optimizer — the reference's --init_param
    # path (espnet2/torch_utils/load_pretrained_model.py:43-102, consumed by
    # tasks/abs_task.py).  Dtypes/shardings follow the live train state, so
    # a bf16 stash warm-starts fp32 training and sharded meshes both work.
    init_params_dir: Optional[str] = None
    # with init_params_dir: allow the target model's token list to EXTEND
    # the pretraining one (new embedding rows keep their fresh init)
    init_params_grow_vocab: bool = False
    # with init_params_dir: allow the model to hold params the stash lacks
    # (e.g. fine-tuning after adding spemb conditioning); they keep their
    # fresh init
    init_params_allow_missing: bool = False
    # optimizer steps fused into one device dispatch (lax.scan over
    # same-bucket batch groups).  >1 amortizes per-dispatch latency —
    # decisive on a remote-tunneled chip where every dispatch pays a full
    # round trip (~120 ms measured vs the 179 ms device step).  The data
    # order changes (same-bucket runs), num_iters/log/save intervals all
    # stay in sub-steps.  Single-chip, non-TTS path only.
    steps_per_dispatch: int = 1


class Trainer:
    """Drives train/valid epochs over iterator factories.

    ``train_iter_factory(epoch) -> iterable of host batches`` lets the data
    layer reseed per epoch (reproducible resume).
    """

    def __init__(
        self,
        config: TrainerConfig,
        train_step: Callable,
        eval_step: Optional[Callable],
        train_iter_factory: Callable[[int], Iterable],
        valid_iter_factory: Optional[Callable[[int], Iterable]] = None,
        checkpoint_manager: Optional[CheckpointManager] = None,
        tensorboard_writer=None,
        wandb_run=None,
        plot_fn: Optional[Callable] = None,
    ):
        self.config = config
        self.train_step = train_step
        self.eval_step = eval_step
        self.train_iter_factory = train_iter_factory
        self.valid_iter_factory = valid_iter_factory
        self.ckpt = checkpoint_manager
        self.reporter = Reporter()
        self.tb = tensorboard_writer
        self.wandb = wandb_run
        # optional per-epoch artifact dump (mel/attention plots — the
        # reference's num_att_plot path, trainer.py:764+); called as
        # plot_fn(state, epoch) after validation
        self.plot_fn = plot_fn
        self._last_epoch_steps = 0

    def run(self, state):
        cfg = self.config
        start_epoch = 1
        skip_iters = 0
        if cfg.resume and self.ckpt is not None:
            latest = self.ckpt.latest_epoch()
            if latest is not None:
                state = self.ckpt.restore(latest, state)
                # truncate any phantom history newer than the epoch whose
                # weights exist (crash between meta.json and orbax finalize)
                self.ckpt.restore_reporter(self.reporter,
                                           up_to_epoch=latest)
                start_epoch = latest + 1
                logger.info("resumed from epoch %d", latest)
            mid = self.ckpt.latest_mid_epoch()
            if mid is not None and mid[0] >= start_epoch:
                # a mid-epoch save is newer than the last full epoch:
                # resume inside that epoch, fast-forwarding the data stream
                try:
                    state, epoch_m, skip_iters = self.ckpt.restore_mid_epoch(
                        state, self.reporter,
                        steps_per_dispatch=cfg.steps_per_dispatch)
                    start_epoch = epoch_m
                    logger.info("resumed mid-epoch %d at iter %d",
                                epoch_m, skip_iters)
                except ValueError as e:
                    # saved under a different steps_per_dispatch: the replay
                    # can't reach the saved boundary — keep the epoch restore
                    logger.warning("%s", e)
        if cfg.init_params_dir and start_epoch == 1 and skip_iters == 0:
            state = state.replace(
                params=warm_start_params(
                    state.params, cfg.init_params_dir,
                    grow_vocab=cfg.init_params_grow_vocab,
                    allow_missing=cfg.init_params_allow_missing))
            logger.info("warm-started params from %s", cfg.init_params_dir)

        run_t0 = time.perf_counter()
        max_epoch_sec = 0.0
        for epoch in range(start_epoch, cfg.max_epoch + 1):
            epoch_t0 = time.perf_counter()
            self.reporter.start_epoch(epoch)
            notfinite_before = _total_notfinite(state.opt_state)
            state = self.train_one_epoch(state, epoch, skip_iters)
            skip_iters = 0
            jax.block_until_ready(state.params)
            # stop when every step of the epoch was skipped as non-finite
            # (reference trainer.py:445-451 all_steps_are_invalid)
            notfinite_after = _total_notfinite(state.opt_state)
            if (notfinite_before is not None
                    and self._last_epoch_steps > 0
                    and notfinite_after - notfinite_before
                    >= self._last_epoch_steps):
                logger.warning(
                    "the gradients at all %d steps of epoch %d were "
                    "non-finite — something is wrong; stopping training",
                    self._last_epoch_steps, epoch)
                break
            if self.valid_iter_factory is not None and self.eval_step is not None:
                self.validate_one_epoch(state, epoch)
            if self.plot_fn is not None:
                try:
                    self.plot_fn(state, epoch)
                except Exception:  # plots must never kill training
                    logger.exception("plot_fn failed at epoch %d", epoch)
            self.reporter.finish_epoch(self.tb, self.wandb)
            logger.info(self.reporter.log_message())

            if self.ckpt is not None:
                self.ckpt.save_epoch(epoch, state, self.reporter)
                self.ckpt.clear_mid_epoch()  # superseded by the epoch save

            phase, key, mode = cfg.best_model_criterion
            if cfg.patience is not None and self.reporter.check_early_stopping(
                cfg.patience, phase, key, mode
            ):
                logger.info("early stopping at epoch %d", epoch)
                break

            # walltime-aware self-resubmission: mirror of the reference's
            # SLURM TimeLimit dance — if the remaining budget cannot fit
            # another epoch like the longest seen, hand off to the
            # resubmit command (the epoch checkpoint above is the state)
            max_epoch_sec = max(max_epoch_sec,
                                time.perf_counter() - epoch_t0)
            if cfg.max_walltime_sec is not None:
                remaining = cfg.max_walltime_sec - (
                    time.perf_counter() - run_t0)
                if remaining < max_epoch_sec and epoch < cfg.max_epoch:
                    logger.info(
                        "walltime: %.0fs remain < longest epoch %.0fs — "
                        "stopping for resubmission after epoch %d",
                        remaining, max_epoch_sec, epoch)
                    if cfg.resubmit_command:
                        import subprocess

                        subprocess.Popen(cfg.resubmit_command, shell=True,
                                         start_new_session=True)
                        logger.info("resubmitted: %s", cfg.resubmit_command)
                    break

        if (
            cfg.average_nbest_at_end
            and self.ckpt is not None
            and len(self.reporter.history) > 0
        ):
            try:
                self.ckpt.average_nbest(self.reporter, state.params)
            except ValueError:
                pass
        if self.ckpt is not None:
            self.ckpt.flush()  # final epoch's async save must land
        return state

    def train_one_epoch(self, state, epoch: int, skip_iters: int = 0):
        cfg = self.config
        sub = self.reporter.phase("train")
        rng = jax.random.PRNGKey(cfg.seed + epoch)
        t_last = time.perf_counter()
        profiling = False
        pending: list = []
        self._last_epoch_steps = 0
        iterator = self.train_iter_factory(epoch)
        steps_done = 0
        last_saved = 0
        last_logged = 0
        for it, batch in enumerate(iterator):
            chained = (isinstance(batch, tuple) and len(batch) == 4
                       and batch[0] == "chained")
            if (cfg.num_iters_per_epoch is not None
                    and steps_done >= cfg.num_iters_per_epoch):
                break
            if chained:
                n_valid = int(batch[2].sum())
            if steps_done < skip_iters:
                # mid-epoch resume: replay the epoch-seeded stream without
                # stepping; burn the per-iter rng so randomness matches an
                # uninterrupted run (chained groups burn one key per group
                # and always save at group boundaries, so the skip target
                # lands exactly on a group edge)
                rng, _ = jax.random.split(rng)
                steps_done += n_valid if chained else 1
                continue
            if cfg.profile_dir and epoch == 1:
                if it == 10:
                    jax.profiler.start_trace(cfg.profile_dir)
                    profiling = True
                elif it == 15 and profiling:
                    jax.profiler.stop_trace()
                    profiling = False
            rng, step_rng = jax.random.split(rng)
            t0 = time.perf_counter()
            sub.register_time("iter", t0 - t_last)
            if chained:
                _, stacked, valid, weights = batch
                state, stats = self.train_step(state, stacked, step_rng,
                                               valid)
                steps_done += n_valid
                self._last_epoch_steps += n_valid
                pending.append(("chained", stats, weights, valid))
                step_div = max(n_valid, 1)
            else:
                state, stats = self.train_step(state, batch, step_rng)
                steps_done += 1
                self._last_epoch_steps += 1
                # Steps are dispatched asynchronously; stats stay on device
                # and only synchronize at log points, so the host keeps
                # feeding the chip (the reference blocks per step for its
                # reporter).
                pending.append((stats, _batch_weight(batch)))
                step_div = 1
            t_last = time.perf_counter()
            # one chained dispatch covers n_valid sub-steps; normalize so
            # the logged ms/step is per optimizer step in both modes
            sub.register_time("step", (t_last - t0) / step_div)
            if (cfg.save_interval_steps and self.ckpt is not None
                    and steps_done - last_saved >= cfg.save_interval_steps):
                self.ckpt.save_mid_epoch(
                    epoch, steps_done, state, self.reporter,
                    steps_per_dispatch=cfg.steps_per_dispatch)
                last_saved = steps_done
            if steps_done - last_logged >= cfg.log_interval:
                last_logged = steps_done
                jax.block_until_ready(stats["loss"])
                last_loss = _register_pending(sub, pending)
                pending.clear()
                pipe = ""
                n_prod = getattr(iterator, "n_produced", 0)
                if n_prod:
                    # producer-side breakdown: gen = host batch assembly,
                    # put = host->device transform, qfull = waiting on the
                    # consumer (healthy).  Large gen/put explains a large
                    # iter wait; large qfull means the chip is the limit.
                    pipe = (
                        " pipe[gen %.0f put %.0f qfull %.0f ms/b]" % (
                            1e3 * iterator.t_gen / n_prod,
                            1e3 * iterator.t_transform / n_prod,
                            1e3 * iterator.t_qfull / n_prod,
                        ))
                logger.info(
                    "epoch %d iter %d: loss=%.4f (%.0f ms/step incl. "
                    "dispatch, %.0f ms iter wait)%s",
                    epoch, steps_done, last_loss,
                    1e3 * np.mean(sub._timings["step"][-cfg.log_interval:]),
                    1e3 * np.mean(sub._timings["iter"][-cfg.log_interval:]),
                    pipe,
                )
        _register_pending(sub, pending)
        return state

    def validate_one_epoch(self, state, epoch: int):
        sub = self.reporter.phase("valid")
        for batch in self.valid_iter_factory(epoch):
            stats = self.eval_step(state, batch)
            sub.register(stats, weight=_batch_weight(batch))
