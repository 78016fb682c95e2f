"""DefaultTrainer: config-driven training orchestration
(reference ``engine/defaults.py:201`` + ``train_loop.py:16-246``).

One SPMD train step jitted with donated state; hooks around the loop (timer,
writers, periodic checkpoint, eval); automatic data-parallel sharding over all
local devices; orbax resume; detectron2-checkpoint weight loading.
"""

from __future__ import annotations

import logging
import os
import weakref
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..checkpoint import CheckpointManager, import_detectron2_checkpoint
from ..config import (
    mapper_config_from_cfg,
    model_config_from_cfg,
    solver_config_from_cfg,
)
from ..data import DatasetCatalog, DatasetMapper, TrainLoader, build_test_loader
from ..models import init_rcnn
from ..models.resnet import freeze_mask
from ..parallel import batch_sharding, data_parallel_mesh, replicate
from ..solver.build import build_lr_schedule
from ..utils.events import CommonMetricPrinter, EventStorage, JSONWriter, TensorboardWriter
from ..utils.logger import setup_logger
from .hooks import (
    EvalHook,
    HookBase,
    IterationTimer,
    LRLogger,
    PeriodicCheckpointer,
    PeriodicWriter,
    PreciseBNHook,
)
from .predictor import Predictor
from .train import TrainState, make_train_step

logger = logging.getLogger(__name__)


class DefaultTrainer:
    def __init__(self, cfg, train_loader=None, params=None):
        setup_logger(cfg.OUTPUT_DIR)
        self.cfg = cfg
        self.model_cfg = model_config_from_cfg(cfg)
        self.solver_cfg = solver_config_from_cfg(cfg)
        self.mapper_cfg = mapper_config_from_cfg(cfg)

        seed = cfg.SEED if cfg.SEED >= 0 else 0
        key = jax.random.PRNGKey(seed)
        if params is None:
            # Init EAGERLY on the CPU backend, then transfer once. The two
            # alternatives both lose: eager init on the TPU dispatches each
            # param op through the axon tunnel's ~33 ms RTT (~3 min for
            # R101), and jit-on-TPU pays a remote compile of the huge
            # threefry init graph (measured up to ~350 s cold; ~37 s even on
            # CPU for R50). Threefry is backend-deterministic, so values are
            # identical to the jitted init. See bench.py host_init.
            with jax.default_device(jax.devices("cpu")[0]):
                params = init_rcnn(key, self.model_cfg)
            if cfg.MODEL.WEIGHTS:
                logger.info("loading weights from %s", cfg.MODEL.WEIGHTS)
                params = import_detectron2_checkpoint(
                    cfg.MODEL.WEIGHTS, params, strict=False
                )
        mask = self.build_trainable_mask(params)
        init_state, train_step = make_train_step(self.model_cfg, self.solver_cfg, mask)
        self.state: TrainState = init_state(params, jax.random.fold_in(key, 7))

        # data-parallel mesh over as many devices as divide the global batch
        devices = jax.devices()
        n_dp = max(d for d in range(1, len(devices) + 1) if cfg.SOLVER.IMS_PER_BATCH % d == 0)
        self.mesh = data_parallel_mesh(devices[:n_dp])
        rep, bsh = replicate(self.mesh), batch_sharding(self.mesh)
        self._batch_sharding = bsh
        self.state = jax.device_put(self.state, rep)
        self._train_step = jax.jit(
            train_step, in_shardings=(rep, bsh), out_shardings=(rep, rep), donate_argnums=(0,)
        )

        self.train_loader = train_loader or self.build_train_loader(cfg)
        self.checkpointer = CheckpointManager(
            os.path.join(cfg.OUTPUT_DIR, "checkpoints"),
            higher_is_better=True,
        )
        self.start_iter = 0
        self.max_iter = cfg.SOLVER.MAX_ITER
        self.iter = 0
        self.storage: Optional[EventStorage] = None
        self._hooks: List[HookBase] = []
        self.register_hooks(self.build_hooks())

    # -- construction helpers ------------------------------------------------

    def build_trainable_mask(self, params):
        mask = jax.tree_util.tree_map(lambda _: True, params)
        freeze_at = self.cfg.MODEL.BACKBONE.FREEZE_AT
        for bb in ("backbone", "backbone_2"):
            if bb in params:
                mask[bb] = freeze_mask(params[bb], freeze_at)
        for module in self.cfg.MODEL.get("FREEZE_MODULES", ()):  # KAIST-style freezes
            if module in params:
                mask[module] = jax.tree_util.tree_map(lambda _: False, params[module])
        return mask

    @classmethod
    def build_train_loader(cls, cfg):
        dicts = []
        for name in cfg.DATASETS.TRAIN:
            dicts.extend(DatasetCatalog.get(name))
        mapper = DatasetMapper(mapper_config_from_cfg(cfg), is_train=True,
                               seed=max(cfg.SEED, 0))
        return TrainLoader(
            dicts,
            mapper,
            batch_size=cfg.SOLVER.IMS_PER_BATCH,
            seed=max(cfg.SEED, 0),
            shard=jax.process_index(),
            num_shards=jax.process_count(),
            num_workers=cfg.DATALOADER.NUM_WORKERS,
        )

    def build_hooks(self) -> List[HookBase]:
        out_dir = self.cfg.OUTPUT_DIR
        writers = [
            CommonMetricPrinter(self.max_iter),
            JSONWriter(os.path.join(out_dir, "metrics.json")),
            TensorboardWriter(out_dir),
        ]
        hooks = [
            IterationTimer(),
            LRLogger(build_lr_schedule(self.solver_cfg)),
            PeriodicWriter(writers, period=20),
            PeriodicCheckpointer(self.cfg.SOLVER.CHECKPOINT_PERIOD),
        ]
        if self.cfg.TEST.PRECISE_BN.ENABLED:
            # reference hook list order: PreciseBN runs before EvalHook
            # (engine/defaults.py:300-342). stats_fn/apply_fn are None for
            # FrozenBN models -> the hook self-disables like the reference.
            hooks.append(
                PreciseBNHook(
                    # EVAL_PERIOD=0 -> hook fires only at the final iteration
                    self.cfg.TEST.EVAL_PERIOD,
                    self.train_loader,
                    getattr(self, "bn_stats_fn", None),
                    getattr(self, "bn_apply_fn", None),
                    num_iters=self.cfg.TEST.PRECISE_BN.NUM_ITER,
                )
            )
        if self.cfg.TEST.EVAL_PERIOD > 0 and self.cfg.DATASETS.TEST:
            hooks.append(EvalHook(self.cfg.TEST.EVAL_PERIOD, lambda t: t.test(t.cfg, t.params)))
        return hooks

    def register_hooks(self, hooks: List[HookBase]):
        for h in hooks:
            h.trainer = weakref.proxy(self)
        self._hooks.extend(hooks)

    # -- state access ---------------------------------------------------------

    @property
    def params(self):
        return self.state.params

    # -- checkpointing ---------------------------------------------------------

    def save_checkpoint(self):
        self.checkpointer.save(self.iter, self.state)

    def resume_or_load(self, resume: bool = True):
        if resume:
            restored = self.checkpointer.restore_latest(self.state)
            if restored is not None:
                self.state = restored
                self.start_iter = int(self.checkpointer.latest_step()) + 1
                logger.info("resumed from iter %d", self.start_iter)

    # -- the loop ---------------------------------------------------------------

    def run_step(self):
        batch = next(self.train_loader)
        device_batch = {
            "image": jax.device_put(batch["image"], self._batch_sharding),
            "image_size": jax.device_put(batch["image_size"], self._batch_sharding),
            "gt": jax.device_put(batch["gt"], self._batch_sharding),
        }
        self.state, metrics = self._train_step(self.state, device_batch)
        self._last_metrics = metrics

    def _write_metrics(self):
        # host sync happens here (once per step; cheap relative to the step)
        for k, v in self._last_metrics.items():
            self.storage.put_scalar(k, float(v))

    def train(self):
        logger.info("starting training from iter %d to %d", self.start_iter, self.max_iter)
        with EventStorage(self.start_iter) as self.storage:
            try:
                for h in self._hooks:
                    h.before_train()
                for self.iter in range(self.start_iter, self.max_iter):
                    self.storage.iter = self.iter
                    for h in self._hooks:
                        h.before_step()
                    self.run_step()
                    self._write_metrics()
                    for h in self._hooks:
                        h.after_step()
            finally:
                for h in self._hooks:
                    h.after_train()
                if hasattr(self.train_loader, "close"):
                    self.train_loader.close()
        return self.state

    # -- evaluation ---------------------------------------------------------------

    @classmethod
    def test(cls, cfg, params, evaluators: Optional[Dict] = None) -> Dict:
        from ..evaluation import build_evaluator, inference_on_dataset

        model_cfg = model_config_from_cfg(cfg)
        mapper = DatasetMapper(mapper_config_from_cfg(cfg), is_train=False)
        predictor = Predictor(params, model_cfg)
        results = {}
        for name in cfg.DATASETS.TEST:
            dicts = DatasetCatalog.get(name)
            if evaluators and name in evaluators:
                evaluator = evaluators[name]
            else:
                # dispatch on the dataset's evaluator_type (reference
                # build_evaluator pattern); defaults to the FLIR evaluator
                evaluator = build_evaluator(name, output_dir=cfg.OUTPUT_DIR)
            loader = build_test_loader(dicts, mapper, batch_size=1)
            results[name] = inference_on_dataset(predictor, loader, evaluator)
        return results if len(results) > 1 else next(iter(results.values()), {})
