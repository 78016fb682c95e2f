"""DefaultTrainer smoke test: config-driven training on a synthetic dataset —
a few iterations run, metrics are written, checkpoints save and resume."""

import json
import os

import cv2
import numpy as np
import pytest

from proben_tpu.config import get_cfg
from proben_tpu.data import DatasetCatalog, register_coco_instances
from proben_tpu.engine import DefaultTrainer


@pytest.fixture()
def tiny_ds(tmp_path):
    tdir = tmp_path / "thermal_8_bit"
    tdir.mkdir()
    rng = np.random.RandomState(0)
    images, annotations = [], []
    for i in range(4):
        name = f"FLIR_{i:05d}.jpeg"
        cv2.imwrite(str(tdir / name), rng.randint(0, 255, (64, 80, 3), np.uint8))
        images.append({"id": i + 1, "file_name": name, "height": 64, "width": 80})
        annotations.append({"id": i + 1, "image_id": i + 1, "category_id": 1,
                            "bbox": [10.0, 10.0, 30.0, 25.0], "area": 750.0, "iscrowd": 0})
    js = {"images": images, "annotations": annotations,
          "categories": [{"id": 1, "name": "person"}, {"id": 2, "name": "bicycle"},
                         {"id": 3, "name": "car"}]}
    p = tmp_path / "ann.json"
    p.write_text(json.dumps(js))
    DatasetCatalog.remove("tiny_trainer_ds")
    register_coco_instances("tiny_trainer_ds", {}, str(p), str(tdir))
    return str(p)


def _tiny_cfg(tmp_path):
    cfg = get_cfg()
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.DATASETS.TRAIN = ("tiny_trainer_ds",)
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.SOLVER.MAX_ITER = 3
    cfg.SOLVER.BASE_LR = 0.001
    cfg.SOLVER.CHECKPOINT_PERIOD = 2
    cfg.SOLVER.WARMUP_ITERS = 10
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 3
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 32
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 32
    cfg.INPUT.PAD_SHAPE = (64, 96)
    cfg.INPUT.MIN_SIZE_TRAIN = (64,)
    cfg.INPUT.MAX_SIZE_TRAIN = 96
    cfg.INPUT.MAX_GT = 8
    cfg.DATALOADER.NUM_WORKERS = 1
    # bit-identical gather pooling: interpret-mode Pallas costs ~5 s/iter on
    # the CPU mesh (see test_model_e2e.tiny_cfg for where pallas IS kept)
    cfg.MODEL.ROI_ALIGN_IMPL = "gather"
    return cfg


def test_trainer_runs_and_checkpoints(tiny_ds, tmp_path):
    cfg = _tiny_cfg(tmp_path)
    trainer = DefaultTrainer(cfg)
    trainer.train()
    assert trainer.iter == 2
    # metrics written
    metrics_path = os.path.join(cfg.OUTPUT_DIR, "metrics.json")
    assert os.path.exists(metrics_path)
    # checkpoint exists and is resumable
    trainer2 = DefaultTrainer(cfg)
    trainer2.resume_or_load(resume=True)
    assert trainer2.start_iter == 3
    assert int(trainer2.state.step) == 3
    trainer2.train_loader.close()


def test_precise_bn_hook_updates_stats_and_self_disables():
    """PreciseBNHook (reference engine/hooks.py:358): with a stats_fn it
    recomputes running stats via the law of total variance; without one
    (FrozenBN models) it disables itself like reference get_bn_modules()==[]."""
    import numpy as np

    from proben_tpu.engine.hooks import PreciseBNHook

    class FakeState:
        params = {"bn": {"running_mean": np.zeros(2), "running_var": np.ones(2)}}

    class FakeTrainer:
        state = FakeState()
        iter = 9
        max_iter = 100

    batches = iter(
        [{"x": np.full((4, 2), float(i))} for i in range(100)]
    )

    def stats_fn(params, batch):
        x = batch["x"]
        return {"bn": (x.mean(0), x.var(0))}

    def apply_fn(params, stats):
        m, v = stats["bn"]
        return {"bn": {"running_mean": m, "running_var": v}}

    hook = PreciseBNHook(period=10, data_iter=batches, stats_fn=stats_fn,
                         apply_fn=apply_fn, num_iters=3)
    hook.trainer = FakeTrainer()
    hook.after_step()
    got = hook.trainer.state.params["bn"]
    # batches 0,1,2: means 0,1,2 -> mean 1; within-var 0; between-var 2/3
    np.testing.assert_allclose(np.asarray(got["running_mean"]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got["running_var"]), 2.0 / 3.0, atol=1e-6)

    disabled = PreciseBNHook(period=10, data_iter=batches, stats_fn=None,
                             apply_fn=None, num_iters=3)
    disabled.trainer = FakeTrainer()
    disabled.after_step()  # no-op, no crash
