"""Training step: functional replacement of ``SimpleTrainer.run_step``
(reference ``engine/train_loop.py:200-234``).

One jitted SPMD step: loss-dict forward, grad, optimizer update. Under a data
mesh with a sharded batch, the grad all-reduce is implicit (DDP equivalent).
The NaN guard of ``_detect_anomaly``/``rpn.py:174-176`` becomes a returned
``loss_finite`` flag the host loop can check without blocking the step.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.rcnn import ModelConfig, rcnn_train_losses
from ..solver.build import SolverConfig, build_optimizer
from ..structures.detections import GroundTruth

Array = jnp.ndarray


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: dict
    opt_state: dict
    step: Array  # () int32
    key: jax.Array


def make_train_step(
    model_cfg: ModelConfig,
    solver_cfg: SolverConfig,
    trainable_mask=None,
) -> Tuple[Callable, Callable]:
    """Returns (init_state, train_step).

    train_step(state, batch) -> (state, metrics) where batch is a dict with
    ``image`` (N, H, W, C), ``image_size`` (N, 2), ``gt`` (GroundTruth,
    leading axis N). Both functions are jit/pjit friendly.
    """

    # The optimizer only depends on the params TREE STRUCTURE (per-param lr
    # factors are keyed on paths), so one instance serves init and step.
    tx_cache = {}

    def get_tx(params) -> optax.GradientTransformation:
        if "tx" not in tx_cache:
            tx_cache["tx"] = build_optimizer(solver_cfg, params, trainable_mask)
        return tx_cache["tx"]

    def init_state(params, key) -> TrainState:
        return TrainState(
            params=params,
            opt_state=get_tx(params).init(params),
            step=jnp.zeros((), jnp.int32),
            key=key,
        )

    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict[str, Array]]:
        step_key = jax.random.fold_in(state.key, state.step)

        def loss_fn(params):
            # Frozen params (FREEZE_AT / FREEZE_MODULES) are stop_gradient'd so
            # XLA dead-code-eliminates their whole backward cone — the
            # reference's ``requires_grad=False`` (resnet.py:488-495) means
            # torch never backprops through res2/stem internals either; the
            # optimizer mask alone computed those gradients and threw them
            # away (~res2 dgrad at 200x256x256 was among the largest bwd
            # fusions in the step trace).
            if trainable_mask is not None:
                params = jax.tree_util.tree_map(
                    lambda p, t: p if t else jax.lax.stop_gradient(p),
                    params,
                    trainable_mask,
                )
            losses = rcnn_train_losses(
                params,
                model_cfg,
                batch["image"],
                batch["image_size"],
                batch["gt"],
                step_key,
            )
            total = sum(losses.values())
            return total, losses

        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = get_tx(state.params).update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)

        # NaN guard, two layers — and ZERO extra passes over the gradients
        # (a per-leaf |g|-sum guard compiled to ~300 separate reduce kernels,
        # several ms/step of launch overhead):
        #  * global: non-finite TOTAL LOSS rolls the whole step back — the
        #    reference's ``_detect_anomaly`` scope (train_loop.py:236).
        #  * element-wise: any non-finite updated entry (e.g. a bf16 overflow
        #    in one grad leaf while the loss stayed finite) keeps its OLD
        #    param/momentum value; the isfinite fuses into the rollback
        #    ``where`` the guard needs anyway.
        finite = jnp.isfinite(total)

        def guard(new, old):
            return jnp.where(finite & jnp.isfinite(new), new, old)

        params = jax.tree_util.tree_map(guard, params, state.params)
        opt_state = dict(opt_state)
        opt_state["momentum"] = jax.tree_util.tree_map(
            guard, opt_state["momentum"], state.opt_state["momentum"]
        )
        metrics = dict(losses)
        metrics["total_loss"] = total
        metrics["loss_finite"] = finite.astype(jnp.float32)
        new_state = TrainState(
            params=params,
            opt_state=opt_state,
            step=state.step + 1,
            key=state.key,
        )
        return new_state, metrics

    return init_state, train_step
