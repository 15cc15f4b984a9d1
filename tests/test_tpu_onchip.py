"""On-chip Mosaic lowering gate as a pytest surface.

The default suite pins the CPU backend (conftest.py) and runs Pallas
kernels in interpret mode, which structurally cannot catch Mosaic TPU
lowering gaps (round-2 atan2 regression, VERDICT.md). This test shells
out to scripts/tpu_smoke.py in a FRESH process (so the site config's
axon TPU backend applies) and fails if any kernel or the production
frontend entry fails to lower+compile on the real chip.

Deselected by default (pytest.ini keeps the suite hermetic/CPU); run as
``pytest -m tpu`` on a machine with the TPU tunnel up.
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.tpu
def test_all_pallas_kernels_lower_on_tpu():
    env = dict(os.environ)
    # undo any CPU pinning inherited from the test environment
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f
    )
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "tpu_smoke.py")],
        capture_output=True, text=True, timeout=1200, env=env, cwd=REPO,
    )
    if proc.returncode == 2:
        pytest.skip("no TPU backend available: " + proc.stdout.strip())
    assert proc.returncode == 0, (
        f"on-chip lowering gate failed:\n{proc.stdout}\n{proc.stderr[-2000:]}"
    )
