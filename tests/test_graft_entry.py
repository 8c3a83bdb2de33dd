"""Driver-gate regression tests for __graft_entry__.

Round-1 verdict: ``MULTICHIP_r01.json ok:false`` because ``dryrun_multichip``
demanded the *caller* provision the forced-CPU mesh.  It is now
self-provisioning (in-process when jax is still unimported, subprocess
re-exec otherwise).  These tests invoke it exactly the way the driver does:
a fresh interpreter with the DEFAULT environment (no JAX_PLATFORMS /
XLA_FLAGS hints from our conftest).
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_env():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    return env


def test_dryrun_multichip_like_the_driver():
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)",
        ],
        cwd=REPO,
        env=_driver_env(),
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "dryrun_multichip ok" in proc.stdout, proc.stdout


def test_dryrun_multichip_with_jax_preinitialized():
    # Subprocess-fallback path: jax already initialised with too few devices.
    code = (
        "import os; os.environ['JAX_PLATFORMS']='cpu'\n"
        "import jax; jax.config.update('jax_platforms','cpu')\n"
        "assert len(jax.devices()) == 1\n"
        "from __graft_entry__ import dryrun_multichip\n"
        "dryrun_multichip(8)\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        env=_driver_env(),
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "dryrun_multichip ok" in proc.stdout, proc.stdout
