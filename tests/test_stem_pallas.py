"""Fused Pallas stem (ops/stem_pallas.py) vs the XLA wpair composition.

Reference semantics: BasicStem = conv1 7x7/s2 -> FrozenBN -> relu ->
max_pool 3x3/s2 pad 1 (``detectron2/modeling/backbone/resnet.py:356-383``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from proben_tpu.models.layers import affine, conv2d_stem_s2d, max_pool
from proben_tpu.models.resnet import apply_resnet, init_resnet
from proben_tpu.ops.stem_pallas import stem_pool_pallas, stem_supported


def _xla_stem(x, w, scale, bias):
    h = conv2d_stem_s2d(x, {"w": w}, dtype=jnp.bfloat16, impl="wpair")
    h = jnp.maximum(affine(h, {"scale": scale, "bias": bias}), 0)
    return max_pool(h, 3, 2, padding=1)


@pytest.mark.parametrize(
    "n,h,w,c",
    [(2, 32, 256, 3), (1, 48, 256, 4), (1, 32, 256, 6)],
)
def test_stem_pallas_matches_xla(n, h, w, c):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32))
    wt = jnp.asarray((rng.randn(7, 7, c, 64) * 0.1).astype(np.float32))
    scale = jnp.asarray((1 + 0.3 * rng.randn(64)).astype(np.float32))
    bias = jnp.asarray((0.3 * rng.randn(64)).astype(np.float32))

    ref = np.asarray(_xla_stem(x, wt, scale, bias), np.float32)
    got = np.asarray(
        stem_pool_pallas(x, wt, scale, bias, interpret=True), np.float32
    )
    assert got.shape == ref.shape
    # same math, different f32-accumulation order -> bf16 ulp-level diffs
    np.testing.assert_allclose(got, ref, atol=0.07, rtol=0.03)


def test_stem_supported_gate():
    bf16 = jnp.bfloat16
    assert stem_supported(800, 1024, 3, 64, bf16)
    assert not stem_supported(800, 1000, 3, 64, bf16)  # W % 256
    assert not stem_supported(24, 256, 3, 64, bf16)  # H too small
    assert not stem_supported(810, 1024, 3, 64, bf16)  # H % 16
    assert not stem_supported(800, 1024, 3, 64, jnp.float32)  # dtype


def test_apply_resnet_pallas_stem_matches_wpair():
    params = init_resnet(jax.random.PRNGKey(0), depth=50)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 32, 256, 3).astype(np.float32))
    kw = dict(out_features=("res2",), freeze_at=2, dtype=jnp.bfloat16)
    ref = apply_resnet(params, x, stem_impl="wpair", **kw)["res2"]
    got = apply_resnet(params, x, stem_impl="pallas", **kw)["res2"]
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=0.1, rtol=0.1,
    )


def test_apply_resnet_pallas_stem_falls_back():
    """Unsupported shapes (odd W) and unfrozen stems route to the XLA path."""
    params = init_resnet(jax.random.PRNGKey(0), depth=50)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 32, 250, 3).astype(np.float32))
    ref = apply_resnet(params, x, out_features=("res2",), freeze_at=2,
                       dtype=jnp.bfloat16, stem_impl="wpair")["res2"]
    got = apply_resnet(params, x, out_features=("res2",), freeze_at=2,
                       dtype=jnp.bfloat16, stem_impl="pallas")["res2"]
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32)
    )
    # unfrozen stem (freeze_at=0): pallas impl must remain differentiable
    # end to end by falling back to the XLA composition
    xs = jnp.asarray(rng.randn(1, 32, 256, 3).astype(np.float32))

    def loss(p):
        return apply_resnet(p, xs, out_features=("res2",), freeze_at=0,
                            dtype=jnp.bfloat16, stem_impl="pallas")["res2"].astype(jnp.float32).sum()

    g = jax.grad(loss)(params)
    gw = np.asarray(g["stem"]["conv1"]["w"], np.float32)
    assert np.isfinite(gw).all() and np.abs(gw).max() > 0
