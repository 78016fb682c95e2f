"""Deployment export (replaces reference ``detectron2/export/`` caffe2/ONNX
tracing, SURVEY §2.4): the TPU-native artifact is a serialized StableHLO
program via ``jax.export`` — portable across JAX versions and loadable without
the model-building python code."""

from __future__ import annotations

import os
import pickle
from typing import Any, Callable, Sequence

import jax
import numpy as np


def export_model(fn: Callable, example_args: Sequence, out_dir: str) -> str:
    """Serialize jit(fn) at the example argument shapes to ``out_dir``:
    ``model.stablehlo`` (the portable program) + ``example_args.pkl``
    (host copies for shape reference). Returns the artifact path."""
    from jax import export as jexport

    os.makedirs(out_dir, exist_ok=True)
    exported = jexport.export(jax.jit(fn))(*example_args)
    blob = exported.serialize()
    path = os.path.join(out_dir, "model.stablehlo")
    with open(path, "wb") as f:
        f.write(blob)
    shapes = jax.tree_util.tree_map(
        lambda x: (tuple(np.shape(x)), str(np.asarray(x).dtype)), tuple(example_args)
    )
    with open(os.path.join(out_dir, "example_args.pkl"), "wb") as f:
        pickle.dump(shapes, f)
    return path


def load_exported(out_dir: str) -> Callable:
    """Load an exported artifact; returns a callable running the program."""
    from jax import export as jexport

    with open(os.path.join(out_dir, "model.stablehlo"), "rb") as f:
        exported = jexport.deserialize(f.read())
    return lambda *args: exported.call(*args)
