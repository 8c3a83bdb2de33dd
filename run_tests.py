#!/usr/bin/env python
"""Test runner with JSON reporting.

Rebuild of the reference's run_tests.py:30-137: discovers and runs the test
suite, writes a machine-readable report to logs/test_report_<ts>.json, and
performs a dependency smoke check. Uses pytest (the suite's native runner)
instead of unittest discovery."""

from __future__ import annotations

import importlib
import json
import os
import subprocess
import sys
import time
from datetime import datetime

REQUIRED_MODULES = ["jax", "numpy", "pqa2_tpu"]
OPTIONAL_MODULES = ["cv2", "matplotlib", "PyQt5"]


def validate_app_installation() -> dict:
    """Dependency smoke check (reference run_tests.py:115-137)."""
    out = {"required": {}, "optional": {}}
    for mod in REQUIRED_MODULES:
        try:
            importlib.import_module(mod)
            out["required"][mod] = "ok"
        except ImportError as e:
            out["required"][mod] = f"MISSING: {e}"
    for mod in OPTIONAL_MODULES:
        try:
            importlib.import_module(mod)
            out["optional"][mod] = "ok"
        except ImportError:
            out["optional"][mod] = "absent"
    return out


def run_tests(extra_args=None) -> int:
    os.makedirs("logs", exist_ok=True)
    ts = datetime.now().strftime("%Y%m%d_%H%M%S")
    report_path = os.path.join("logs", f"test_report_{ts}.json")
    json_tmp = os.path.join("logs", f"pytest_{ts}.json")

    deps = validate_app_installation()
    missing = [m for m, s in deps["required"].items() if s != "ok"]
    if missing:
        print(f"missing required dependencies: {missing}", file=sys.stderr)

    extra_args = list(extra_args or [])
    quick = "--quick" in extra_args
    if quick:
        # Fast tier: the `smoke` cross-section (anchors, integer
        # bit-exactness, one E2E analyzer run, controllers, model loader)
        # — suite health on 1-CPU hosts without the full ~5-20 min run.
        extra_args = [a for a in extra_args if a != "--quick"]
        extra_args += ["-m", "smoke"]

    # The child also raises this via conftest, but raising here first means
    # the child starts with the raised soft limit (main-thread stack growth
    # cap is what the XLA:CPU compiler overflows on the exact-int programs).
    from pqa2_tpu.utils.stacklimit import raise_stack_limit

    raise_stack_limit()

    t0 = time.time()
    cmd = [sys.executable, "-m", "pytest", "tests/", "-q",
           f"--junitxml={json_tmp}.xml"]
    if extra_args:
        cmd += extra_args
    proc = subprocess.run(cmd)
    elapsed = time.time() - t0

    report = {
        "timestamp": ts,
        "elapsed_seconds": round(elapsed, 2),
        "exit_code": proc.returncode,
        "passed": proc.returncode == 0,
        "tier": "smoke" if quick else "full",
        "dependencies": deps,
        "junit_xml": f"{json_tmp}.xml",
    }
    with open(report_path, "w") as f:
        json.dump(report, f, indent=2)
    print(f"report: {report_path}")
    return proc.returncode


if __name__ == "__main__":
    sys.exit(run_tests(sys.argv[1:]))
