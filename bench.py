"""Benchmark: images/sec/chip on FLIR Faster R-CNN inference (the BASELINE.json
metric). Prints ONE JSON line.

Baseline for vs_baseline: detectron2 Faster R-CNN R101-FPN inference on V100 =
19.6 img/s (reference MODEL_ZOO.md:179-182) — the strongest per-chip figure
published in-tree. The north-star floor (>10x detectron2-CPU ~1.5 img/s) is
far below it.

NOTE: on the axon backend `block_until_ready` does not actually fence
execution; a host transfer of one output field is used as the sync point.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from proben_tpu.models import build_config, init_rcnn, rcnn_inference

    depth = 101
    batch = 4
    cfg = build_config(depth=depth, input_format="BGR", num_classes=3,
                       compute_dtype="bfloat16")
    params = init_rcnn(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    sizes = jnp.asarray(np.tile([[800, 1000]], (batch, 1)).astype(np.int32))

    fn = jax.jit(lambda p, im, sz: rcnn_inference(p, cfg, im, sz))
    imgs = [
        jnp.asarray(rng.rand(batch, 800, 1024, 3).astype(np.float32) * 255)
        for _ in range(4)
    ]
    # compile + warmup (sync via host transfer — block_until_ready does not
    # fence on the axon backend)
    np.asarray(fn(params, imgs[0], sizes).scores)

    # pipelined throughput: dispatch all batches, fetch at the end (the
    # tunnel's ~33 ms RTT otherwise dominates; see docs/PERF.md)
    iters = 16
    t0 = time.time()
    outs = [fn(params, imgs[i % len(imgs)], sizes) for i in range(iters)]
    for o in outs:
        np.asarray(o.scores)
    dt = time.time() - t0
    img_s = batch * iters / dt

    baseline_v100 = 19.6  # d2 R101-FPN V100 img/s
    print(
        json.dumps(
            {
                "metric": "flir_faster_rcnn_r101_inference",
                "value": round(img_s, 2),
                "unit": "img/s/chip",
                "vs_baseline": round(img_s / baseline_v100, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
