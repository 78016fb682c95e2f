"""Micro-benchmark: the res4 stage's 22 interior bottleneck blocks alone in
XLA at inference shapes — the baseline a Pallas res4 megakernel must beat.
Usage: python dev/micro_res4.py [batch=8]
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

_cache = os.path.expanduser("~/.cache/proben_tpu_xla_tpu")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from proben_tpu.models.resnet import init_resnet, _bottleneck
import bench as _bench

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
H, W = 50, 64  # p4 scale at 800x1024
rng = np.random.RandomState(0)

params = _bench.host_init(lambda k: init_resnet(k, 101, in_channels=3),
                          jax.random.PRNGKey(0))
blocks = [b for b in params["res4"] if "shortcut" not in b]
print(f"res4 interior blocks: {len(blocks)}", file=sys.stderr)

x = jnp.asarray(rng.rand(B, H, W, 1024).astype(np.float32), jnp.bfloat16)


def run(x, blocks):
    for blk in blocks:
        x = _bottleneck(blk, x, 1, jnp.bfloat16)
    return x


fn = jax.jit(run)
out = fn(x, blocks)
np.asarray(out[0, 0, 0, 0])
iters = 32
t0 = time.time()
outs = [fn(x, blocks) for _ in range(iters)]
np.asarray(outs[-1][0, 0, 0, 0])
dt = (time.time() - t0) / iters * 1000
print(f"XLA res4 interior chain (B={B}, {len(blocks)} blocks): {dt:.2f} ms")
