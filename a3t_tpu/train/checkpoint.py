"""Checkpointing with the reference's retention semantics, on Orbax.

The reference keeps (trainer.py:366-443, main_funcs/average_nbest_models.py):

* ``checkpoint`` — full training state for resume (params, optimizer,
  scheduler, reporter) written every epoch;
* per-epoch weights ``{n}epoch``;
* n-best retention by a (phase, metric, mode) criterion with pruning;
* post-training averaging of the n best epochs' parameters
  (``train.loss.ave_5best.pth`` analogue).

Here a checkpoint directory holds Orbax-saved pytrees; metadata (reporter
history, epoch) rides along as a JSON-serializable dict.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from a3t_tpu.train.reporter import Reporter


class CheckpointManager:
    def __init__(self, directory: str, keep_nbest: int = 5,
                 criterion=("valid", "loss", "min")):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.keep_nbest = keep_nbest
        self.criterion = tuple(criterion)
        self._ckpt = ocp.StandardCheckpointer()

    # -- paths -----------------------------------------------------------
    def _epoch_dir(self, epoch: int) -> str:
        return os.path.join(self.directory, f"epoch_{epoch}")

    @property
    def resume_dir(self) -> str:
        return os.path.join(self.directory, "latest")

    # -- save / restore --------------------------------------------------
    def flush(self):
        """Block until any in-flight async save has finalized."""
        self._ckpt.wait_until_finished()

    def save_epoch(self, epoch: int, state, reporter: Reporter):
        """Save per-epoch weights + full resume state + prune to n-best.

        The orbax save runs asynchronously (it costs ~40 s on this fs and
        would otherwise block the train loop once per epoch); the wait
        happens at the START of the next save/restore instead, so the
        write overlaps the following epoch's compute.  Crash safety:
        orbax finalizes by renaming its tmp dir, and ``latest_epoch``
        ignores a LATEST pointer whose directory never materialized.
        """
        self.flush()
        tree = {
            "step": state.step,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        }
        path = self._epoch_dir(epoch)
        if os.path.exists(path):
            shutil.rmtree(path)
        # a crash mid-save leaves an unfinalized tmp dir behind; sweep any
        # before reusing the name (orbax would otherwise error on it)
        import glob as _glob
        for stale in _glob.glob(path + ".orbax-checkpoint-tmp*"):
            shutil.rmtree(stale)
        self._ckpt.save(path, tree)
        meta = {"epoch": epoch, "reporter": reporter.state_dict()}
        with open(os.path.join(self.directory, "meta.json"), "w") as f:
            json.dump(meta, f)
        # "latest" pointer file (symlink semantics of latest.pth)
        with open(os.path.join(self.directory, "LATEST"), "w") as f:
            f.write(str(epoch))
        self._prune(reporter)

    @staticmethod
    def _epoch_of(name: str) -> Optional[int]:
        """epoch_<n> -> n; None for anything else (incl. orbax tmp dirs,
        which are named epoch_<n>.orbax-checkpoint-tmp* mid-save)."""
        if not name.startswith("epoch_"):
            return None
        tail = name[len("epoch_"):]
        return int(tail) if tail.isdigit() else None

    def _prune(self, reporter: Reporter):
        phase, key, mode = self.criterion
        ranked = reporter.sort_epochs(phase, key, mode)
        keep = set(ranked[: self.keep_nbest])
        # always keep the newest for resume — even when the criterion phase
        # has no stats yet (e.g. training without a validation set)
        keep.add(reporter.epoch)
        for name in os.listdir(self.directory):
            e = self._epoch_of(name)
            if e is not None and e not in keep:
                shutil.rmtree(os.path.join(self.directory, name))

    # -- mid-epoch (preemption-safety) checkpoints ------------------------
    def _step_dir(self, epoch: int, iteration: int) -> str:
        return os.path.join(self.directory, f"step_e{epoch}_i{iteration}")

    def save_mid_epoch(self, epoch: int, iteration: int, state,
                       reporter: Reporter, steps_per_dispatch: int = 1):
        """Save full training state mid-epoch under a step-keyed name.

        Unlike :meth:`save_epoch` this does not touch the epoch
        checkpoints, n-best ranking or the LATEST pointer; resume picks the
        step checkpoint up only when it is newer than the latest epoch.
        Only the most recent mid-epoch checkpoint is retained.

        ``steps_per_dispatch`` is recorded so resume can verify the replay
        advances the data stream in the same group size: the chained plan
        orders data differently and skips in whole-group jumps, so a k
        mismatch would silently drop or replay up to k-1 batches.
        """
        self.flush()
        tree = {
            "step": state.step,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        }
        path = self._step_dir(epoch, iteration)
        if os.path.exists(path):
            shutil.rmtree(path)
        self._ckpt.save(path, tree)
        self._ckpt.wait_until_finished()
        with open(os.path.join(self.directory, "meta_step.json"), "w") as f:
            json.dump({"epoch": epoch, "iteration": iteration,
                       "steps_per_dispatch": steps_per_dispatch,
                       "reporter": reporter.state_dict()}, f)
        for name in os.listdir(self.directory):
            if name.startswith("step_") and name != os.path.basename(path):
                shutil.rmtree(os.path.join(self.directory, name))

    def latest_mid_epoch(self) -> Optional[tuple[int, int]]:
        """(epoch, iteration) of the newest mid-epoch checkpoint, if any."""
        best = None
        for name in os.listdir(self.directory):
            if not name.startswith("step_e"):
                continue
            e, i = name[len("step_e"):].split("_i")
            key = (int(e), int(i))
            if best is None or key > best:
                best = key
        return best

    def restore_mid_epoch(self, template_state, reporter: Reporter,
                          steps_per_dispatch: int = 1):
        """Restore the newest mid-epoch checkpoint.

        Returns (state, epoch, iteration); caller resumes that epoch
        skipping the first ``iteration`` batches (data order is epoch-seeded
        so the skipped prefix is identical).  Raises ``ValueError`` when the
        checkpoint was saved under a different ``steps_per_dispatch`` — the
        chained replay could not land on the saved sub-step boundary (the
        caller should fall back to the last epoch checkpoint).
        """
        key = self.latest_mid_epoch()
        if key is None:
            raise FileNotFoundError("no mid-epoch checkpoint")
        epoch, iteration = key
        meta_probe = os.path.join(self.directory, "meta_step.json")
        if os.path.exists(meta_probe):
            with open(meta_probe) as f:
                saved_k = int(json.load(f).get("steps_per_dispatch", 1))
            if saved_k != steps_per_dispatch:
                raise ValueError(
                    f"mid-epoch checkpoint was saved with steps_per_dispatch"
                    f"={saved_k} but the run now uses {steps_per_dispatch}; "
                    "the data-stream replay cannot reach the saved sub-step "
                    "boundary — falling back to the epoch checkpoint")
        tree = {
            "step": template_state.step,
            "params": template_state.params,
            "batch_stats": template_state.batch_stats,
            "opt_state": template_state.opt_state,
        }
        restored = self._ckpt.restore(self._step_dir(epoch, iteration), tree)
        meta_path = os.path.join(self.directory, "meta_step.json")
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                reporter.load_state_dict(json.load(f)["reporter"])
        state = template_state.replace(
            step=restored["step"],
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
        )
        return state, epoch, iteration

    def clear_mid_epoch(self):
        """Drop mid-epoch checkpoints (called once their epoch completes)."""
        for name in os.listdir(self.directory):
            if name.startswith("step_"):
                shutil.rmtree(os.path.join(self.directory, name))
        meta = os.path.join(self.directory, "meta_step.json")
        if os.path.exists(meta):
            os.remove(meta)

    def latest_epoch(self) -> Optional[int]:
        self.flush()  # settle any in-flight async save first
        marker = os.path.join(self.directory, "LATEST")
        if not os.path.exists(marker):
            return None
        e = int(open(marker).read().strip())
        if os.path.exists(self._epoch_dir(e)):
            return e
        # the async save behind the LATEST pointer never finalized (crash
        # mid-write): fall back to the newest epoch that did materialize
        done = [self._epoch_of(n) for n in os.listdir(self.directory)]
        done = [d for d in done if d is not None
                and os.path.exists(os.path.join(self._epoch_dir(d),
                                                "_CHECKPOINT_METADATA"))]
        return max(done) if done else None

    def restore(self, epoch: int, template_state):
        """Restore a TrainState (template supplies structure + shardings)."""
        self.flush()
        tree = {
            "step": template_state.step,
            "params": template_state.params,
            "batch_stats": template_state.batch_stats,
            "opt_state": template_state.opt_state,
        }
        restored = self._ckpt.restore(self._epoch_dir(epoch), tree)
        return template_state.replace(
            step=restored["step"],
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
        )

    def restore_reporter(self, reporter: Reporter,
                         up_to_epoch: Optional[int] = None) -> Optional[int]:
        """Load reporter history from meta.json.

        ``up_to_epoch`` drops history entries newer than the epoch whose
        weights actually exist: after a crash mid async save, meta.json may
        record an epoch whose checkpoint never finalized, and a phantom
        entry would skew n-best ranking / early stopping until the epoch
        re-finishes.
        """
        meta_path = os.path.join(self.directory, "meta.json")
        if not os.path.exists(meta_path):
            return None
        with open(meta_path) as f:
            meta = json.load(f)
        reporter.load_state_dict(meta["reporter"])
        epoch = int(meta["epoch"])
        if up_to_epoch is not None and epoch > up_to_epoch:
            reporter.history = {e: h for e, h in reporter.history.items()
                                if e <= up_to_epoch}
            reporter.epoch = up_to_epoch
            epoch = up_to_epoch
        return epoch

    # -- n-best averaging (average_nbest_models.py analogue) -------------
    def average_nbest(self, reporter: Reporter, template_params,
                      n: Optional[int] = None):
        self.flush()
        phase, key, mode = self.criterion
        n = n if n is not None else self.keep_nbest
        epochs = [
            e for e in reporter.sort_epochs(phase, key, mode)[:n]
            if os.path.exists(self._epoch_dir(e))
        ]
        if not epochs:
            raise ValueError("no ranked epochs available to average")
        acc = None
        for e in epochs:
            p = self._ckpt.restore(self._epoch_dir(e))["params"]
            if acc is None:
                acc = jax.tree_util.tree_map(lambda x: np.asarray(x, np.float64), p)
            else:
                acc = jax.tree_util.tree_map(
                    lambda a, x: a + np.asarray(x, np.float64), acc, p
                )
        avg = jax.tree_util.tree_map(
            lambda a, t: np.asarray(a / len(epochs), np.asarray(t).dtype),
            acc, template_params,
        )
        out = os.path.join(self.directory, f"ave_{len(epochs)}best")
        if os.path.exists(out):
            shutil.rmtree(out)
        self._ckpt.save(out, {"params": avg})
        self._ckpt.wait_until_finished()
        return avg, epochs


def wait_finalized(path: str, timeout: float = 180.0):
    """Block until an (async-saved) checkpoint directory is finalized.

    ``CheckpointManager.save_epoch`` initiates orbax saves asynchronously;
    orbax finalizes by renaming ``<path>.orbax-checkpoint-tmp-<ts>`` to
    ``<path>`` and writing ``_CHECKPOINT_METADATA``.  External readers
    (export_params, curve evals) can race that rename, so poll for the
    finalize marker before reading.
    """
    import glob
    import time

    probe = os.path.join(path, "_CHECKPOINT_METADATA")
    deadline = time.monotonic() + timeout
    while not os.path.exists(probe):
        # a checkpoint written without the finalize marker (older orbax, a
        # foreign export) is still restorable: a directory holding _METADATA
        # with no in-flight tmp sibling is not a save in progress
        if (os.path.exists(os.path.join(path, "_METADATA"))
                and not glob.glob(path + ".orbax-checkpoint-tmp*")):
            return
        # fail fast when nothing is (or was ever) being written here
        # (re-probe the marker once first: the tmp dir may have been
        # renamed to `path` between the loop test and this check)
        if (not glob.glob(path + ".orbax-checkpoint-tmp*")
                and not os.path.exists(path)
                and not os.path.exists(probe)):
            raise FileNotFoundError(f"no checkpoint at {path}")
        if time.monotonic() >= deadline:
            raise FileNotFoundError(
                f"checkpoint at {path} never finalized (waited {timeout}s); "
                "was the saving process killed mid-write?")
        time.sleep(0.2)


def restore_portable(path: str):
    """Restore a checkpoint on any backend (drops saved device shardings).

    A raw ``StandardCheckpointer.restore`` resolves the sharding metadata
    the saving devices wrote, which fails when a TPU-trained checkpoint is
    read in a CPU-only process (steps-vs-MCD curve evals, offline tooling).
    Rebuild the abstract template from the checkpoint's own array metadata
    so the restore targets the local backend instead.
    """
    path = os.path.abspath(path)  # orbax metadata() is None on relative paths
    wait_finalized(path)
    ckpt = ocp.StandardCheckpointer()
    meta = ckpt.metadata(path).item_metadata.tree
    sharding = jax.sharding.SingleDeviceSharding(jax.local_devices()[0])
    abstract = jax.tree_util.tree_map(
        lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=sharding),
        meta)
    return ckpt.restore(path, abstract)


def warm_start_params(template_params, path: str, grow_vocab: bool = False,
                      allow_missing: bool = False):
    """Load a params-only checkpoint onto a live train state's layout.

    ``path`` holds ``{"params": ...}`` (an ``ave_*`` export, an epoch
    checkpoint, or a ``bin/export_params`` stash — possibly downcast to
    bf16).  Every leaf is cast to the template's dtype and device_put to
    the template's sharding, so warm-starting works identically on a
    single chip and under a pjit mesh.  Reference analogue: --init_param
    (espnet2/torch_utils/load_pretrained_model.py:43-102).

    ``grow_vocab=True`` permits fine-tuning on a corpus with a LARGER
    token list: leaves whose shapes differ from the template only in the
    leading dimension (embedding tables) keep the checkpoint rows for the
    shared prefix and the template's fresh init for the new ids — so the
    new tokens.txt must extend the pretraining one in-order.  This is the
    partial-load half of the reference's --init_param `:::exclude` syntax
    (load_pretrained_model.py:43-102) redone for vocab growth.

    ``allow_missing=True`` permits the model to have params the checkpoint
    lacks (e.g. fine-tuning with a newly added conditioning module): those
    leaves keep the template's fresh init.  Checkpoint leaves absent from
    the model still raise — that is a config mismatch, not growth.
    """
    tree = restore_portable(path)
    loaded = tree.get("params", tree)
    loaded_by_path = {
        jax.tree_util.keystr(k): v
        for k, v in jax.tree_util.tree_flatten_with_path(loaded)[0]}
    tmpl_paths, tmpl_def = jax.tree_util.tree_flatten_with_path(
        template_params)
    tmpl_keys = {jax.tree_util.keystr(k) for k, _ in tmpl_paths}
    extra = sorted(set(loaded_by_path) - tmpl_keys)
    if extra:
        raise ValueError(
            f"warm-start params structure mismatch: {path} holds params "
            f"the model lacks (first: {extra[:3]}) — did the config "
            "change?")
    fresh = sorted(tmpl_keys - set(loaded_by_path))
    if fresh and not allow_missing:
        raise ValueError(
            f"warm-start params structure mismatch: model params missing "
            f"from {path} (first: {fresh[:3]}); pass allow_missing=True "
            "to keep their fresh init (new-module fine-tune)")
    if fresh:
        import logging

        logging.getLogger("a3t_tpu").info(
            "warm-start: %d param leaves not in %s keep fresh init "
            "(first: %s)", len(fresh), path, fresh[:3])
    out = []
    for key, t in tmpl_paths:
        x = loaded_by_path.get(jax.tree_util.keystr(key))
        if x is None:
            out.append(t)
            continue
        if x.shape != t.shape:
            vocab_growth = (
                grow_vocab and len(x.shape) == len(t.shape)
                and x.shape[1:] == t.shape[1:] and x.shape[0] < t.shape[0])
            if not vocab_growth:
                raise ValueError(
                    f"warm-start shape mismatch: checkpoint {x.shape} vs "
                    f"model {t.shape}")
            grown = np.array(t, dtype=t.dtype)  # writable host copy
            grown[: x.shape[0]] = np.asarray(x).astype(t.dtype)
            cast = grown
        else:
            # t.dtype avoids materializing the template leaf to host (and
            # works on non-fully-addressable arrays under a multi-host mesh)
            cast = np.asarray(x).astype(t.dtype)
        sharding = getattr(t, "sharding", None)
        out.append(jax.device_put(cast, sharding) if sharding is not None
                   else jax.device_put(cast))
    return jax.tree_util.tree_unflatten(tmpl_def, out)
