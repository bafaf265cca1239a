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
    def save_epoch(self, epoch: int, state, reporter: Reporter):
        """Save per-epoch weights + full resume state + prune to n-best."""
        tree = {
            "step": state.step,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        }
        path = self._epoch_dir(epoch)
        if os.path.exists(path):
            shutil.rmtree(path)
        self._ckpt.save(path, tree)
        self._ckpt.wait_until_finished()
        meta = {"epoch": epoch, "reporter": reporter.state_dict()}
        with open(os.path.join(self.directory, "meta.json"), "w") as f:
            json.dump(meta, f)
        # "latest" pointer file (symlink semantics of latest.pth)
        with open(os.path.join(self.directory, "LATEST"), "w") as f:
            f.write(str(epoch))
        self._prune(reporter)

    def _prune(self, reporter: Reporter):
        phase, key, mode = self.criterion
        ranked = reporter.sort_epochs(phase, key, mode)
        keep = set(ranked[: self.keep_nbest])
        if ranked:
            keep.add(reporter.epoch)  # always keep the newest for resume
        for name in os.listdir(self.directory):
            if not name.startswith("epoch_"):
                continue
            e = int(name.split("_")[1])
            if e not in keep:
                shutil.rmtree(os.path.join(self.directory, name))

    def latest_epoch(self) -> Optional[int]:
        marker = os.path.join(self.directory, "LATEST")
        if not os.path.exists(marker):
            return None
        e = int(open(marker).read().strip())
        return e if os.path.exists(self._epoch_dir(e)) else None

    def restore(self, epoch: int, template_state):
        """Restore a TrainState (template supplies structure + shardings)."""
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

    def restore_reporter(self, reporter: Reporter) -> Optional[int]:
        meta_path = os.path.join(self.directory, "meta.json")
        if not os.path.exists(meta_path):
            return None
        with open(meta_path) as f:
            meta = json.load(f)
        reporter.load_state_dict(meta["reporter"])
        return int(meta["epoch"])

    # -- n-best averaging (average_nbest_models.py analogue) -------------
    def average_nbest(self, reporter: Reporter, template_params,
                      n: Optional[int] = None):
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
