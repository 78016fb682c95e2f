"""Native checkpointing with Orbax (TPU-idiomatic replacement of the
reference's fvcore ``DetectionCheckpointer`` + ``PeriodicCheckpointer``:
``checkpoint/detection_checkpoint.py:11``, ``engine/hooks.py:176``).

Saves sharded arrays asynchronously-safe; keeps periodic checkpoints, a
``last`` pointer, and a best-metric model (the demos' keep-best loop,
``demo_train_FLIR.py``)."""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_pytree(path: str, tree: Any):
    """Save any pytree of arrays to ``path`` (a directory)."""
    path = os.path.abspath(path)
    if os.path.exists(path):
        shutil.rmtree(path)
    ckptr = _checkpointer()
    ckptr.save(path, tree)
    ckptr.wait_until_finished()
    ckptr.close()


def restore_pytree(path: str, template: Any) -> Any:
    """Restore a pytree saved by ``save_pytree`` using ``template`` for
    structure/dtypes."""
    path = os.path.abspath(path)
    ckptr = _checkpointer()
    out = ckptr.restore(path, template)
    ckptr.close()
    return out


class CheckpointManager:
    """Periodic + best-model checkpoint management under a root directory.

    Layout: root/iter_<N>/ (periodic), root/best/ (best metric),
    root/last.json (pointer + metadata)."""

    def __init__(self, root: str, max_to_keep: int = 2, higher_is_better: bool = True):
        self.root = os.path.abspath(root)
        os.makedirs(self.root, exist_ok=True)
        self.max_to_keep = max_to_keep
        self.higher_is_better = higher_is_better
        self._kept: list = []
        self.best_metric: Optional[float] = None
        meta = self._read_meta()
        if meta:
            self.best_metric = meta.get("best_metric")
            self._kept = meta.get("kept", [])

    def _meta_path(self):
        return os.path.join(self.root, "last.json")

    def _read_meta(self) -> Dict:
        if os.path.exists(self._meta_path()):
            with open(self._meta_path()) as f:
                return json.load(f)
        return {}

    def _write_meta(self, **kw):
        meta = self._read_meta()
        meta.update(kw)
        with open(self._meta_path(), "w") as f:
            json.dump(meta, f)

    def save(self, step: int, state: Any):
        path = os.path.join(self.root, f"iter_{step:07d}")
        save_pytree(path, state)
        self._kept.append(path)
        while len(self._kept) > self.max_to_keep:
            old = self._kept.pop(0)
            shutil.rmtree(old, ignore_errors=True)
        self._write_meta(last=path, step=step, kept=self._kept)

    def save_best(self, step: int, metric: float, params: Any) -> bool:
        better = (
            self.best_metric is None
            or (metric > self.best_metric) == self.higher_is_better
            or metric == self.best_metric
        )
        if self.best_metric is not None and metric == self.best_metric:
            better = False
        if better:
            self.best_metric = float(metric)
            save_pytree(os.path.join(self.root, "best"), params)
            self._write_meta(best_metric=self.best_metric, best_step=step)
        return better

    def latest_path(self) -> Optional[str]:
        meta = self._read_meta()
        p = meta.get("last")
        return p if p and os.path.exists(p) else None

    def latest_step(self) -> Optional[int]:
        meta = self._read_meta()
        return meta.get("step")

    def restore_latest(self, template: Any) -> Optional[Any]:
        p = self.latest_path()
        return restore_pytree(p, template) if p else None

    def restore_best(self, template: Any) -> Optional[Any]:
        p = os.path.join(self.root, "best")
        return restore_pytree(p, template) if os.path.exists(p) else None
