"""Optimizer and LR schedules (reference ``detectron2/solver/``).

Rebuild of ``solver/build.py:93`` (SGD with per-param lr/weight-decay
overrides) and ``lr_scheduler.py:16,52`` (WarmupMultiStepLR / WarmupCosineLR)
on optax. Torch-SGD semantics are preserved: weight decay is added to the
gradient *before* the momentum buffer update, and the momentum buffer is
multiplied by the (scheduled) lr at apply time like torch does
(v = mu*v + g; p -= lr*v).

Freezing (FREEZE_AT and the KAIST-style whole-module freezes) is expressed as
a trainable-mask pytree that zeroes updates, mirroring requires_grad=False.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """Mirrors the SOLVER.* keys used by the ProbEn configs."""

    base_lr: float = 0.02
    momentum: float = 0.9
    weight_decay: float = 1e-4
    bias_lr_factor: float = 1.0
    weight_decay_bias: float = 1e-4
    warmup_factor: float = 1.0 / 1000
    warmup_iters: int = 1000
    warmup_method: str = "linear"  # linear | constant
    steps: Tuple[int, ...] = (60000, 80000)
    gamma: float = 0.1
    max_iter: int = 90000
    lr_scheduler_name: str = "WarmupMultiStepLR"  # or WarmupCosineLR
    clip_gradients: bool = False
    clip_type: str = "value"  # value | norm
    clip_value: float = 1.0
    norm_type: float = 2.0


def build_lr_schedule(cfg: SolverConfig) -> Callable[[Array], Array]:
    """Returns step -> lr multiplier-applied learning rate."""

    def warmup(step):
        if cfg.warmup_method == "constant":
            w = jnp.asarray(cfg.warmup_factor)
        else:
            alpha = jnp.minimum(step / max(cfg.warmup_iters, 1), 1.0)
            w = cfg.warmup_factor * (1 - alpha) + alpha
        return jnp.where(step >= cfg.warmup_iters, 1.0, w)

    if cfg.lr_scheduler_name == "WarmupCosineLR":

        def schedule(step):
            cos = 0.5 * (1.0 + jnp.cos(jnp.pi * step / cfg.max_iter))
            return cfg.base_lr * warmup(step) * cos

    else:

        def schedule(step):
            milestones = jnp.asarray(cfg.steps) if cfg.steps else jnp.zeros((0,))
            n_passed = jnp.sum(step >= milestones) if len(cfg.steps) else 0
            return cfg.base_lr * warmup(step) * (cfg.gamma ** n_passed)

    return schedule


def _is_bias_path(path) -> bool:
    # biases and affine/norm scale-bias params get the bias treatment
    leaf_key = None
    for p in reversed(path):
        if hasattr(p, "key"):
            leaf_key = p.key
            break
        if hasattr(p, "name"):
            leaf_key = p.name
            break
    return leaf_key in ("b", "bias", "scale")


def build_optimizer(
    cfg: SolverConfig,
    params,
    trainable_mask=None,
) -> optax.GradientTransformation:
    """SGD + momentum with per-param lr factors and weight decay.

    ``trainable_mask``: pytree of bools (True = trainable); frozen leaves get
    exactly zero updates (torch requires_grad=False parity).
    """
    schedule = build_lr_schedule(cfg)
    bias_paths = jax.tree_util.tree_map_with_path(
        lambda path, _: _is_bias_path(path), params
    )

    def init_fn(params_):
        return {
            "momentum": jax.tree_util.tree_map(jnp.zeros_like, params_),
            "step": jnp.zeros((), jnp.int32),
        }

    def update_fn(grads, state, params_):
        step = state["step"]
        lr = schedule(step)

        if cfg.clip_gradients:
            if cfg.clip_type == "value":
                grads = jax.tree_util.tree_map(
                    lambda g: jnp.clip(g, -cfg.clip_value, cfg.clip_value), grads
                )
            else:
                gnorm = optax.global_norm(grads)
                scale = jnp.minimum(1.0, cfg.clip_value / (gnorm + 1e-6))
                grads = jax.tree_util.tree_map(lambda g: g * scale, grads)

        def one(g, p, v, is_bias, mask_ok):
            wd = cfg.weight_decay_bias if is_bias else cfg.weight_decay
            lr_p = lr * (cfg.bias_lr_factor if is_bias else 1.0)
            g = g + wd * p
            v_new = cfg.momentum * v + g
            upd = -lr_p * v_new
            if mask_ok is not None:
                keep = jnp.asarray(mask_ok)
                upd = jnp.where(keep, upd, 0.0)
                v_new = jnp.where(keep, v_new, v)
            return upd, v_new

        mask = trainable_mask
        if mask is None:
            mask = jax.tree_util.tree_map(lambda _: True, params_)
        flat = jax.tree_util.tree_map(one, grads, params_, state["momentum"], bias_paths, mask)
        updates = jax.tree_util.tree_map(lambda t: t[0], flat, is_leaf=lambda x: isinstance(x, tuple))
        momentum = jax.tree_util.tree_map(lambda t: t[1], flat, is_leaf=lambda x: isinstance(x, tuple))
        return updates, {"momentum": momentum, "step": step + 1}

    return optax.GradientTransformation(init_fn, update_fn)
