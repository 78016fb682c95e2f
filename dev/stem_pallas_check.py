"""Interpret-mode correctness check of the fused Pallas stem vs the XLA
composition (wpair conv + affine + relu + maxpool)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from proben_tpu.models.layers import affine, conv2d_stem_s2d, max_pool
from proben_tpu.ops.stem_pallas import stem_pool_pallas

rng = np.random.RandomState(0)
for (n, h, wd, c) in [(2, 32, 256, 3), (1, 48, 512, 4), (1, 32, 256, 6)]:
    x = jnp.asarray(rng.randn(n, h, wd, c).astype(np.float32))
    w = jnp.asarray((rng.randn(7, 7, c, 64) * 0.1).astype(np.float32))
    scale = jnp.asarray((1 + 0.3 * rng.randn(64)).astype(np.float32))
    bias = jnp.asarray((0.3 * rng.randn(64)).astype(np.float32))

    ref = conv2d_stem_s2d(x, {"w": w}, dtype=jnp.bfloat16, impl="wpair")
    ref = jnp.maximum(affine(ref, {"scale": scale, "bias": bias}), 0)
    ref = max_pool(ref, 3, 2, padding=1)

    got = stem_pool_pallas(x, w, scale, bias, interpret=True)
    assert got.shape == ref.shape, (got.shape, ref.shape)
    d = np.abs(np.asarray(got, np.float32) - np.asarray(ref, np.float32))
    scale_ref = np.abs(np.asarray(ref, np.float32)).mean() + 1e-6
    print(f"({n},{h},{wd},{c}): shape {got.shape} max abs diff {d.max():.5f} "
          f"(ref mean |x| {scale_ref:.3f})", flush=True)
    assert d.max() <= 0.06 * scale_ref + 0.06, d.max()
print("OK")
