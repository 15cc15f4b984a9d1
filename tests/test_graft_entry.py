"""Guards in the driver entry points (__graft_entry__.py).

The device-count guard must fail LOUD: if the backend initialized with
fewer devices than the requested mesh, make_mesh would silently truncate
and every sharded leg would run degenerate single-device shapes — the
dryrun would "pass" without testing multi-device sharding at all.
"""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_dryrun_device_count_guard_raises():
    # A fresh process with a plain 1-device CPU backend (no
    # xla_force_host_platform_device_count) must refuse dryrun_multichip(8).
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import __graft_entry__ as g\n"
        "try:\n"
        "    g.dryrun_multichip(8)\n"
        "except RuntimeError as e:\n"
        "    assert 'needs 8 devices' in str(e), str(e)\n"
        "    print('GUARD_OK')\n"
        "else:\n"
        "    raise SystemExit('guard did not fire')\n"
    )
    env = {"PYTHONPATH": str(REPO), "PATH": "/usr/bin:/bin:/usr/local/bin",
           "HOME": "/root", "JAX_PLATFORMS": "cpu"}
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        cwd=str(REPO), env=env, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "GUARD_OK" in proc.stdout
