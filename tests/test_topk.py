"""Radix-select top-k (ops/topk.py) vs ``lax.top_k`` — exact parity.

The op replaces lax.top_k in the RPN pre-NMS selection and the balanced
anchor sampler, where tie-break order is load-bearing (reference parity of
proposal order, `detectron2/modeling/proposal_generator/rpn_outputs.py:52`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from proben_tpu.ops.topk import topk


def _check(x, k):
    x = jnp.asarray(x, jnp.float32)
    ref_v, ref_i = jax.lax.top_k(x, k)
    got_v, got_i = jax.jit(topk, static_argnums=1)(x, k)
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(ref_v))
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(ref_i))


@pytest.mark.parametrize("n,k", [(8192, 16), (12345, 256), (204624, 256),
                                 (153600, 2000)])
def test_random(n, k):
    rng = np.random.RandomState(0)
    _check(rng.randn(n).astype(np.float32), k)


def test_heavy_ties():
    # few distinct values -> long tie runs spanning many blocks
    rng = np.random.RandomState(1)
    x = rng.randint(0, 5, size=20000).astype(np.float32)
    _check(x, 300)


def test_masked_fill_pattern():
    # the sampler's pattern: a handful of eligible entries, everything else
    # masked to -1.0 -> the threshold lands INSIDE the -1.0 tie run
    rng = np.random.RandomState(2)
    x = np.full(204624, -1.0, np.float32)
    pos = rng.choice(204624, size=37, replace=False)
    x[pos] = rng.rand(37).astype(np.float32)
    _check(x, 256)


def test_all_equal():
    _check(np.full(8192, 3.5, np.float32), 64)


def test_negatives_zeros_infs():
    rng = np.random.RandomState(3)
    x = rng.randn(16384).astype(np.float32)
    x[:100] = 0.0
    x[100:200] = -0.0
    x[200:210] = np.inf
    x[210:220] = -np.inf
    _check(x, 512)


def test_batched_matches_vmap():
    rng = np.random.RandomState(4)
    x = rng.randn(8, 51200).astype(np.float32)
    ref_v, ref_i = jax.lax.top_k(jnp.asarray(x), 500)
    got_v, got_i = jax.jit(topk, static_argnums=1)(jnp.asarray(x), 500)
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(ref_v))
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(ref_i))


def test_fallback_small_n():
    # below the fast-path cutoff -> delegates to lax.top_k
    rng = np.random.RandomState(5)
    _check(rng.randn(512).astype(np.float32), 17)


def test_grad_stops_at_selection():
    # selection indices are integer outputs; values gather is differentiable
    # like lax.top_k's. Only smoke-check it traces under grad.
    x = jnp.asarray(np.random.RandomState(6).randn(8192), jnp.float32)

    def f(x):
        v, _ = topk(x, 8)
        return jnp.sum(v)

    g = jax.grad(f)(x)
    assert int(jnp.sum(g != 0)) == 8
