"""Orbax checkpointing: best + last, metadata in-checkpoint.

Reference analog: Lightning ``ModelCheckpoint`` monitoring ``val/loss`` with
``save_top_k=1`` + ``save_last`` (``configs/callbacks/default.yaml:8-19``),
and hyperparameters embedded in the checkpoint
(``abstract_recommender.py:40``) enabling ensemble loading.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp


class Checkpointer:
    def __init__(self, directory: str, max_to_keep: int = 1, mode: str = "min"):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.mode = mode
        self._ckptr = ocp.StandardCheckpointer()
        self.best_metric: Optional[float] = None
        self.best_step: Optional[int] = None
        self._meta_path = os.path.join(self.directory, "best.json")
        if os.path.exists(self._meta_path):
            with open(self._meta_path) as f:
                meta = json.load(f)
            self.best_metric = meta.get("metric")
            self.best_step = meta.get("step")

    def _path(self, name: str) -> str:
        return os.path.join(self.directory, name)

    def save(self, state, step: int, metric: Optional[float] = None,
             extra: Optional[Dict[str, Any]] = None) -> bool:
        """Save 'last'; promote to 'best' when the metric improves.
        Returns True if this became the best checkpoint."""
        tree = {"params": state.params, "opt_state": state.opt_state, "step": state.step}
        self._save_tree(tree, "last")
        with open(os.path.join(self.directory, "last.json"), "w") as f:
            json.dump({"step": step, "metric": metric, **(extra or {})}, f)
        is_best = metric is not None and (
            self.best_metric is None
            or (metric < self.best_metric if self.mode == "min" else metric > self.best_metric)
        )
        if is_best:
            self._save_tree(tree, "best")
            self.best_metric = float(metric)
            self.best_step = step
            with open(self._meta_path, "w") as f:
                json.dump({"metric": self.best_metric, "step": step, **(extra or {})}, f)
        return bool(is_best)

    def _save_tree(self, tree, name: str) -> None:
        path = self._path(name)
        if os.path.exists(path):
            import shutil

            shutil.rmtree(path)
        self._ckptr.save(path, tree)
        self._ckptr.wait_until_finished()

    def restore(self, state, which: str = "best"):
        """Restore params/opt_state into the given state (shape template)."""
        tree = {"params": state.params, "opt_state": state.opt_state, "step": state.step}
        restored = self._ckptr.restore(self._path(which), tree)
        return state.replace(
            params=restored["params"],
            opt_state=restored["opt_state"],
            step=restored["step"],
        )

    def restore_params(self, which: str = "best"):
        """Template-free params restore (raw pytree, host numpy arrays).

        Used by eval/ensemble composition (reference
        ``manner_module.py:83-96`` loads submodules from ckpts without the
        training-time optimizer): the optimizer used at training time may
        have a different opt_state structure than the eval-side default, so
        restoring through a TrainState template would fail.
        """
        tree = self._ckptr.restore(self._path(which))
        # host numpy leaves: uncommitted, so downstream jits are free to
        # place them (orbax may otherwise restore onto every local device)
        import numpy as np

        return jax.tree.map(np.asarray, tree["params"])

    def has(self, which: str = "best") -> bool:
        return os.path.exists(self._path(which))

    def meta(self, which: str = "last") -> Dict[str, Any]:
        """Loop bookkeeping (epoch, global step, monitored metric) saved
        alongside the tree — what ``Trainer.fit(resume=True)`` needs to pick
        up where a run stopped (reference ``ckpt_path`` → ``trainer.fit``,
        ``train.py:91``)."""
        p = os.path.join(self.directory, f"{which}.json")
        if not os.path.exists(p):
            return {}
        with open(p) as f:
            return json.load(f)
