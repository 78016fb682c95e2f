"""Tests for SyncBN, repeat-factor sampler, export, model zoo, memory/serialize
utils."""

import itertools
import os

import jax
import jax.numpy as jnp
import numpy as np

from proben_tpu.data.samplers import (
    repeat_factor_index_stream,
    repeat_factors_from_category_frequency,
)
from proben_tpu.export import export_model, load_exported
from proben_tpu.models.batch_norm import (
    init_batch_norm,
    precise_bn_stats,
    sync_batch_norm,
)
from proben_tpu.utils.memory import retry_if_oom
from proben_tpu.utils.serialize import PicklableWrapper


def test_batch_norm_normalizes():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 8, 8, 16).astype(np.float32) * 3 + 5)
    p = init_batch_norm(16)
    out, new_p = sync_batch_norm(x, p, training=True)
    out = np.asarray(out)
    np.testing.assert_allclose(out.mean(axis=(0, 1, 2)), 0, atol=1e-4)
    np.testing.assert_allclose(out.std(axis=(0, 1, 2)), 1, atol=1e-2)
    # running stats moved toward the batch stats
    assert np.abs(np.asarray(new_p["running_mean"]) - 5).max() < 5.0
    # eval mode uses running stats
    out_eval, _ = sync_batch_norm(x, new_p, training=False)
    assert np.isfinite(np.asarray(out_eval)).all()


def test_sync_batch_norm_cross_device():
    # under vmap-with-axis-name, pmean makes stats global
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 4, 8, 8, 4).astype(np.float32))
    p = init_batch_norm(4)

    def per_device(xd):
        out, _ = sync_batch_norm(xd, p, training=True, axis_name="data")
        return out

    out = jax.vmap(per_device, axis_name="data")(x)
    out = np.asarray(out)
    # global normalization: mean over ALL devices ~ 0
    np.testing.assert_allclose(out.mean(axis=(0, 1, 2, 3)), 0, atol=1e-4)


def test_precise_bn():
    stats = [(jnp.asarray([1.0]), jnp.asarray([0.5])),
             (jnp.asarray([3.0]), jnp.asarray([0.5]))]
    mean, var = precise_bn_stats(stats)
    np.testing.assert_allclose(np.asarray(mean), [2.0])
    # total variance = E[var] + Var[mean] = 0.5 + 1.0
    np.testing.assert_allclose(np.asarray(var), [1.5])


def test_repeat_factors():
    dicts = (
        [{"annotations": [{"category_id": 0}]}] * 90
        + [{"annotations": [{"category_id": 1}]}] * 10
    )
    rf = repeat_factors_from_category_frequency(dicts, repeat_thresh=0.5)
    np.testing.assert_allclose(rf[:90], 1.0)  # frequent class: no repeat
    np.testing.assert_allclose(rf[90:], np.sqrt(0.5 / 0.1))
    stream = repeat_factor_index_stream(rf, seed=0)
    epoch = list(itertools.islice(stream, 160))
    rare = sum(1 for i in epoch if i >= 90)
    assert rare > 12  # rare class oversampled vs its 10/100 base rate


def test_export_roundtrip(tmp_path):
    def fn(x, w):
        return jnp.tanh(x @ w)

    x = jnp.ones((4, 8))
    w = jnp.full((8, 2), 0.1)
    path = export_model(fn, (x, w), str(tmp_path / "artifact"))
    assert os.path.exists(path)
    loaded = load_exported(str(tmp_path / "artifact"))
    np.testing.assert_allclose(np.asarray(loaded(x, w)), np.asarray(fn(x, w)), atol=1e-6)


def test_model_zoo_config():
    from proben_tpu import model_zoo

    cfg = model_zoo.get_config("FLIR-Detection/faster_rcnn_R_101_FLIR.yaml")
    assert cfg.MODEL.RESNETS.DEPTH == 101
    assert model_zoo.get_checkpoint_path("FLIR-Detection/faster_rcnn_R_101_FLIR.yaml") is None


def test_retry_if_oom_passthrough():
    calls = []

    @retry_if_oom
    def works(x):
        calls.append(1)
        return x + 1

    assert works(1) == 2
    assert len(calls) == 1

    @retry_if_oom
    def explodes():
        raise ValueError("not oom")

    try:
        explodes()
        assert False
    except ValueError:
        pass


def test_picklable_wrapper():
    import pickle

    w = PicklableWrapper(len)
    assert w([1, 2, 3]) == 3
    w2 = pickle.loads(pickle.dumps(w))
    assert w2([1]) == 1


def test_stem_space_to_depth_exact():
    """conv2d_stem_s2d is an exact rewrite of the 7x7/s2/p3 stem conv
    (reference resnet.py BasicStem) — same sums, regrouped for the MXU."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from proben_tpu.models.layers import conv2d, conv2d_stem_s2d, init_conv

    key = jax.random.PRNGKey(3)
    for h, w, c in [(64, 96, 3), (32, 32, 4)]:
        p = init_conv(jax.random.fold_in(key, h), 7, 7, c, 16)
        x = jax.random.normal(jax.random.fold_in(key, w), (2, h, w, c))
        ref = conv2d(x, p, stride=2, padding=3)
        for impl in ("pack24", "wpair", "direct"):
            got = conv2d_stem_s2d(x, p, impl=impl)
            assert got.shape == ref.shape == (2, h // 2, w // 2, 16)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5,
                err_msg=impl,
            )
    # odd H (31) with W % 4 == 0 takes the width-pair branch; odd W (31)
    # takes the generic direct-conv fallback — both must match the 7x7/s2
    p = init_conv(key, 7, 7, 3, 8)
    for shape in [(1, 31, 32, 3), (1, 32, 31, 3)]:
        x_odd = jax.random.normal(key, shape)
        np.testing.assert_allclose(
            np.asarray(conv2d_stem_s2d(x_odd, p)),
            np.asarray(conv2d(x_odd, p, stride=2, padding=3)),
            rtol=1e-5, atol=1e-5, err_msg=str(shape),
        )
