#!/usr/bin/env python
"""Throughput benchmark (reference ``tools/benchmark.py``): data-loading,
training, and inference img/s for a config on the current chip.

Usage:
  python tools/benchmark.py --task train|eval|data \
      --config-file configs/FLIR-Detection/faster_rcnn_R_101_FLIR.yaml [KEY VALUE ...]

Uses synthetic data unless DATASETS.* are registered, so it runs anywhere.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-file", default="")
    parser.add_argument("--task", default="eval", choices=["train", "eval", "data"])
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--batch", type=int, default=0, help="override batch size")
    parser.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    return parser.parse_args()


def synthetic_batch(cfg, batch, rng):
    import jax.numpy as jnp

    from proben_tpu.structures import GroundTruth

    h, w = cfg.INPUT.PAD_SHAPE
    c = {"BGR": 3, "BGRT": 4, "BGRTTT": 6}[cfg.INPUT.FORMAT]
    g = cfg.INPUT.MAX_GT
    xy = rng.rand(batch, g, 2) * (min(h, w) - 100)
    wh = rng.rand(batch, g, 2) * 80 + 20
    return {
        "image": jnp.asarray(rng.rand(batch, h, w, c).astype(np.float32) * 255),
        "image_size": jnp.asarray(np.tile([[h, w - 24]], (batch, 1)).astype(np.int32)),
        "gt": GroundTruth(
            boxes=jnp.asarray(np.concatenate([xy, xy + wh], -1).astype(np.float32)),
            classes=jnp.asarray(rng.randint(0, cfg.MODEL.ROI_HEADS.NUM_CLASSES, (batch, g)).astype(np.int32)),
            valid=jnp.asarray(np.ones((batch, g), bool)),
        ),
    }


def main():
    args = parse_args()
    import jax

    from proben_tpu.config import get_cfg, model_config_from_cfg, solver_config_from_cfg
    from proben_tpu.engine import make_train_step
    from proben_tpu.models import init_rcnn, rcnn_inference

    cfg = get_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    model_cfg = model_config_from_cfg(cfg)
    rng = np.random.RandomState(0)

    def sync(tree):
        np.asarray(jax.tree_util.tree_leaves(tree)[0])

    if args.task == "eval":
        batch = args.batch or 4
        params = init_rcnn(jax.random.PRNGKey(0), model_cfg)
        data = synthetic_batch(cfg, batch, rng)
        fn = jax.jit(lambda p, im, sz: rcnn_inference(p, model_cfg, im, sz))
        sync(fn(params, data["image"], data["image_size"]))
        t0 = time.time()
        for _ in range(args.iters):
            sync(fn(params, data["image"], data["image_size"]))
        dt = time.time() - t0
        print(f"inference: {batch * args.iters / dt:.2f} img/s ({dt / args.iters * 1000:.1f} ms/batch of {batch})")
    elif args.task == "train":
        batch = args.batch or cfg.SOLVER.IMS_PER_BATCH
        params = init_rcnn(jax.random.PRNGKey(0), model_cfg)
        init_state, train_step = make_train_step(model_cfg, solver_config_from_cfg(cfg))
        state = init_state(params, jax.random.PRNGKey(1))
        step = jax.jit(train_step, donate_argnums=(0,))
        data = synthetic_batch(cfg, batch, rng)
        state, m = step(state, data)
        sync(m)
        t0 = time.time()
        for _ in range(args.iters):
            state, m = step(state, data)
        sync(m)  # steps chain through state; one fence avoids paying the
        # ~33 ms tunnel RTT per iteration (docs/PERF.md)
        dt = time.time() - t0
        print(f"train: {dt / args.iters:.3f} s/iter, {batch * args.iters / dt:.2f} img/s")
    else:  # data
        from proben_tpu.config import mapper_config_from_cfg
        from proben_tpu.data import DatasetCatalog, DatasetMapper, TrainLoader

        dicts = []
        for name in cfg.DATASETS.TRAIN:
            dicts.extend(DatasetCatalog.get(name))
        assert dicts, "register DATASETS.TRAIN to benchmark data loading"
        loader = TrainLoader(dicts, DatasetMapper(mapper_config_from_cfg(cfg), True),
                             batch_size=args.batch or cfg.SOLVER.IMS_PER_BATCH)
        next(loader)
        t0 = time.time()
        for _ in range(args.iters):
            next(loader)
        dt = time.time() - t0
        loader.close()
        print(f"data: {(args.batch or cfg.SOLVER.IMS_PER_BATCH) * args.iters / dt:.2f} img/s")


if __name__ == "__main__":
    main()
