"""Model analysis: FLOP/parameter counting via XLA cost analysis
(reference ``detectron2/utils/analysis.py:23-66`` flop/activation counters)."""

from __future__ import annotations

from typing import Callable, Dict

import jax
import numpy as np


def parameter_count(params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))


def parameter_count_table(params, max_depth: int = 2) -> str:
    """Per-module parameter counts like the reference's table."""
    rows: Dict[str, int] = {}

    def walk(tree, prefix, depth):
        if depth >= max_depth or not isinstance(tree, (dict, list)):
            rows[prefix] = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))
            return
        items = tree.items() if isinstance(tree, dict) else enumerate(tree)
        for k, v in items:
            walk(v, f"{prefix}.{k}" if prefix else str(k), depth + 1)

    walk(params, "", 0)
    total = sum(rows.values())
    lines = [f"{'module':40s} #params"]
    for k, v in sorted(rows.items()):
        lines.append(f"{k:40s} {v / 1e6:8.2f}M")
    lines.append(f"{'TOTAL':40s} {total / 1e6:8.2f}M")
    return "\n".join(lines)


def flop_count(fn: Callable, *example_args) -> float:
    """Total FLOPs of a jitted function via XLA cost analysis."""
    lowered = jax.jit(fn).lower(*example_args)
    compiled = lowered.compile()
    analysis = compiled.cost_analysis()
    if isinstance(analysis, list):
        analysis = analysis[0]
    return float(analysis.get("flops", float("nan")))
