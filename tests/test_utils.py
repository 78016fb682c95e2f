"""Utils tests: visualizer, events, analysis, logger."""

import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

from proben_tpu.utils import (
    EventStorage,
    JSONWriter,
    Visualizer,
    collect_env_info,
    flop_count,
    parameter_count,
    parameter_count_table,
    seed_all_rng,
)


def test_visualizer_draws_boxes(tmp_path):
    img = np.zeros((100, 120, 3), np.uint8)
    vis = Visualizer(img)
    out = vis.overlay_instances(
        boxes=np.array([[10, 10, 50, 60], [60, 20, 110, 90]]),
        classes=np.array([0, 2]),
        scores=np.array([0.9, 0.7]),
    ).get_image()
    assert out.sum() > 0  # something was drawn
    path = str(tmp_path / "vis.png")
    vis.save(path)
    assert os.path.exists(path)


def test_event_storage_smoothing():
    with EventStorage(0) as storage:
        for v in [1.0, 100.0, 2.0]:
            storage.put_scalar("loss", v)
        assert storage.median("loss") == 2.0  # median robust to the spike


def test_json_writer(tmp_path):
    path = str(tmp_path / "metrics.json")
    writer = JSONWriter(path)
    with EventStorage(5) as storage:
        storage.put_scalar("loss", 1.5)
        writer.write(storage)
    writer.close()
    import json

    rec = json.loads(open(path).read().strip())
    assert rec["iteration"] == 5
    assert rec["loss"] == 1.5


def test_parameter_count():
    params = {"a": jnp.zeros((10, 20)), "b": [jnp.zeros(5), jnp.zeros((2, 3))]}
    assert parameter_count(params) == 200 + 5 + 6
    table = parameter_count_table(params)
    assert "TOTAL" in table


def test_flop_count_matmul():
    a = jnp.zeros((128, 256))
    b = jnp.zeros((256, 64))
    flops = flop_count(lambda x, y: x @ y, a, b)
    assert flops == 2 * 128 * 256 * 64


def test_seed_and_env():
    s = seed_all_rng(123)
    assert s == 123
    info = collect_env_info()
    assert "jax" in info
