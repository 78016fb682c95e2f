"""The driver's literal multi-chip dryrun invocation must succeed.

Round 1 failed this check: ``__graft_entry__.dryrun_multichip`` probed
``jax.devices()`` before forcing the CPU platform, which initialized the
axon 1-chip TPU backend and bricked the virtual-device fallback
(MULTICHIP_r01.json rc=1). This test runs the driver's exact command in a
subprocess — with XLA_FLAGS/JAX_PLATFORMS stripped so the environment
matches the driver's (sitecustomize and all) — and asserts rc=0.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_driver_invocation():
    env = {k: v for k, v in os.environ.items() if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    proc = subprocess.run(
        [sys.executable, "-c", "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    assert "dryrun_multichip(8) OK" in proc.stdout, proc.stdout
