#!/usr/bin/env python
"""Explicit training loop without the trainer abstraction
(reference ``tools/plain_train_net.py``): for users who want the raw loop.

Usage mirrors train_net.py."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from proben_tpu.checkpoint import CheckpointManager, import_detectron2_checkpoint
from proben_tpu.config import (
    get_cfg,
    mapper_config_from_cfg,
    model_config_from_cfg,
    solver_config_from_cfg,
)
from proben_tpu.data import DatasetCatalog, DatasetMapper, TrainLoader, register_coco_instances
from proben_tpu.engine import make_train_step
from proben_tpu.models import init_rcnn
from proben_tpu.utils.events import EventStorage, JSONWriter
from proben_tpu.utils.logger import setup_logger


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-file", default="")
    parser.add_argument("--register", action="append", default=[])
    parser.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = parser.parse_args()

    cfg = get_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    logger = setup_logger(cfg.OUTPUT_DIR)
    for spec in args.register:
        name, json_path, image_root = spec.split(",")
        register_coco_instances(name, {}, json_path, image_root)

    model_cfg = model_config_from_cfg(cfg)
    params = init_rcnn(jax.random.PRNGKey(max(cfg.SEED, 0)), model_cfg)
    if cfg.MODEL.WEIGHTS:
        params = import_detectron2_checkpoint(cfg.MODEL.WEIGHTS, params, strict=False)

    init_state, train_step = make_train_step(model_cfg, solver_config_from_cfg(cfg))
    state = init_state(params, jax.random.PRNGKey(1))
    step = jax.jit(train_step, donate_argnums=(0,))

    dicts = []
    for name in cfg.DATASETS.TRAIN:
        dicts.extend(DatasetCatalog.get(name))
    loader = TrainLoader(
        dicts, DatasetMapper(mapper_config_from_cfg(cfg), True),
        batch_size=cfg.SOLVER.IMS_PER_BATCH,
        num_workers=cfg.DATALOADER.NUM_WORKERS,
    )
    mgr = CheckpointManager(os.path.join(cfg.OUTPUT_DIR, "checkpoints"))
    writer = JSONWriter(os.path.join(cfg.OUTPUT_DIR, "metrics.json"))

    try:
        with EventStorage(0) as storage:
            for it in range(cfg.SOLVER.MAX_ITER):
                batch = next(loader)
                state, metrics = step(
                    state,
                    {"image": batch["image"], "image_size": batch["image_size"], "gt": batch["gt"]},
                )
                storage.iter = it
                for k, v in metrics.items():
                    storage.put_scalar(k, float(v))
                if (it + 1) % 20 == 0:
                    writer.write(storage)
                    logger.info("iter %d: %.4f", it, storage.median("total_loss"))
                if (it + 1) % cfg.SOLVER.CHECKPOINT_PERIOD == 0:
                    mgr.save(it, state)
    finally:
        loader.close()
        writer.close()


if __name__ == "__main__":
    main()
