"""Benchmark: images/sec/chip on FLIR Faster R-CNN inference (the BASELINE.json
metric). Prints ONE JSON line (plus a realism note on stderr).

Baseline for vs_baseline: detectron2 Faster R-CNN R101-FPN inference on V100 =
19.6 img/s (reference MODEL_ZOO.md:179-182) — the strongest per-chip figure
published in-tree. The north-star floor (>10x detectron2-CPU ~1.5 img/s) is
far below it.

Realism: random-init heads give near-uniform softmax scores (every candidate
passes the 0.05 threshold — unrealistic NMS/top-k occupancy). The class head
is therefore calibrated post-init (background bias up, fg logit spread up) so
a trained-like sparse tail of candidates crosses the score threshold, and the
input is synthetic-but-structured (boxes pasted on background, fixed seed).
The per-image final detection count is printed to stderr as evidence.

`--train` benchmarks the batch-8 training step instead (second metric;
the driver's default invocation stays inference).

NOTE: on the axon backend `block_until_ready` does not actually fence
execution; a host transfer of one output field is used as the sync point.
"""

import json
import sys
import time

import numpy as np


def structured_images(rng, n, batch, h, w, c):
    """Background gradient + pasted box-like objects (fixed seed)."""
    imgs = []
    for _ in range(n):
        im = np.tile(
            np.linspace(60, 120, w, dtype=np.float32)[None, None, :, None],
            (batch, h, 1, c),
        )
        im += rng.randn(batch, h, w, c).astype(np.float32) * 8
        for b in range(batch):
            for _ in range(12):
                x, y = rng.randint(0, w - 80), rng.randint(0, h - 120)
                bw, bh = rng.randint(24, 80), rng.randint(40, 120)
                im[b, y : y + bh, x : x + bw] = rng.uniform(130, 240)
        imgs.append(np.clip(im, 0, 255))
    return imgs


def calibrate_heads(params, bg_bias=3.0, w_scale=0.02):
    """Make score distributions trained-like: dominant background with a
    sparse fg tail above the 0.05 test threshold (random-init logits on the
    un-normalized fc features saturate softmax, so EVERY candidate passes
    and the detection cap fills)."""
    cls = params["roi"]["output"]["cls_score"]
    cls["w"] = cls["w"] * w_scale
    cls["b"] = cls["b"].at[-1].set(bg_bias)  # background is the last logit
    return params


def calibrate_closed_loop(base_params, fn, args, lo=0.0, hi=16.0, target=(20, 80)):
    """Binary-search the background bias until the mean final-detection
    count per image lands in ``target`` (weights-only changes — no
    recompile). Returns (params, dets_per_img)."""
    import jax

    def with_bias(b):
        p = jax.tree_util.tree_map(lambda x: x, base_params)
        p["roi"] = dict(p["roi"])
        p["roi"]["output"] = dict(p["roi"]["output"])
        p["roi"]["output"]["cls_score"] = dict(p["roi"]["output"]["cls_score"])
        return calibrate_heads(p, bg_bias=b, w_scale=0.02)

    best = None
    for _ in range(7):
        mid = 0.5 * (lo + hi)
        p = with_bias(mid)
        out = fn(p, *args)
        n = float(np.asarray(out.valid).sum(-1).mean())
        best = (p, n)
        if n > target[1]:
            lo = mid  # too many detections -> push background up
        elif n < target[0]:
            hi = mid
        else:
            break
    return best


def bench_inference():
    import jax
    import jax.numpy as jnp

    from proben_tpu.models import build_config, init_rcnn, rcnn_inference

    batch = 8  # throughput knee of the batch sweep (docs/PERF.md); batch-1
    # latency is 29 ms vs the V100's 51 ms, so batching hides no weakness
    cfg = build_config(depth=101, input_format="BGR", num_classes=3,
                       compute_dtype="bfloat16")
    params = init_rcnn(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    sizes = jnp.asarray(np.tile([[800, 1000]], (batch, 1)).astype(np.int32))

    fn = jax.jit(lambda p, im, sz: rcnn_inference(p, cfg, im, sz))
    imgs = [jnp.asarray(a) for a in structured_images(rng, 4, batch, 800, 1024, 3)]
    # compile + warmup, then calibrate the head bias so the score-threshold /
    # NMS path sees a trained-like detection count (sync via host transfer —
    # block_until_ready does not fence on the axon backend)
    np.asarray(fn(params, imgs[0], sizes).scores)
    params, n_dets = calibrate_closed_loop(params, fn, (imgs[0], sizes))
    print(f"realism: {n_dets:.1f} final dets/img above threshold", file=sys.stderr)

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


def bench_train():
    import jax
    import jax.numpy as jnp

    from proben_tpu.config import get_cfg, model_config_from_cfg, solver_config_from_cfg
    from proben_tpu.engine import make_train_step
    from proben_tpu.models import init_rcnn
    from proben_tpu.structures import GroundTruth

    cfg = get_cfg()
    cfg.merge_from_file("configs/FLIR-Detection/faster_rcnn_R_101_FLIR.yaml")
    mcfg = model_config_from_cfg(cfg)
    scfg = solver_config_from_cfg(cfg)
    batch = 8
    h, w = cfg.INPUT.PAD_SHAPE
    g = cfg.INPUT.MAX_GT
    rng = np.random.RandomState(0)
    xy = rng.rand(batch, g, 2) * (min(h, w) - 140)
    wh = rng.rand(batch, g, 2) * 100 + 24
    data = {
        "image": jnp.asarray(structured_images(rng, 1, batch, h, w, 3)[0]),
        "image_size": jnp.asarray(np.tile([[h, w - 24]], (batch, 1)).astype(np.int32)),
        "gt": GroundTruth(
            boxes=jnp.asarray(np.concatenate([xy, xy + wh], -1).astype(np.float32)),
            classes=jnp.asarray(
                rng.randint(0, cfg.MODEL.ROI_HEADS.NUM_CLASSES, (batch, g)).astype(np.int32)
            ),
            valid=jnp.asarray(np.ones((batch, g), bool)),
        ),
    }
    init_state, step = make_train_step(mcfg, scfg)
    step = jax.jit(step)
    state = init_state(
        init_rcnn(jax.random.PRNGKey(0), mcfg), jax.random.PRNGKey(7)
    )
    state, metrics = step(state, data)
    np.asarray(metrics["total_loss"])  # compile + sync
    iters = 12
    t0 = time.time()
    for _ in range(iters):
        state, metrics = step(state, data)
    np.asarray(metrics["total_loss"])
    dt = time.time() - t0
    img_s = batch * iters / dt
    # d2 R101-FPN training: 0.286 s/iter batch 16 on 8 V100 = ~7 img/s/GPU
    baseline = 7.0
    print(
        json.dumps(
            {
                "metric": "flir_faster_rcnn_r101_train_b8",
                "value": round(img_s, 2),
                "unit": "img/s/chip",
                "vs_baseline": round(img_s / baseline, 3),
            }
        )
    )


def main():
    if "--train" in sys.argv:
        bench_train()
    else:
        bench_inference()


if __name__ == "__main__":
    main()
