"""Capture-child hygiene: pid-registry sweep + graceful-stop ladder.

The reference kills every process named ffmpeg before a capture
(app/capture.py:412-454) and stops its child via q/SIGINT/terminate/kill
(:189-256). The framework's equivalents are pid+cmdline-verified
(app/capture.py registry helpers) — these tests drive them with real fake
child processes."""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

from pqa2_tpu.app.capture import (
    graceful_stop,
    register_capture_pid,
    sweep_lingering_captures,
    unregister_capture_pid,
)

PY = sys.executable


def _spawn_sleeper(*extra):
    """A child that sleeps; optionally ignoring SIGINT/SIGTERM."""
    code = "import signal, time, sys\n"
    if "ignore" in extra:
        code += ("signal.signal(signal.SIGINT, signal.SIG_IGN)\n"
                 "signal.signal(signal.SIGTERM, signal.SIG_IGN)\n")
    code += "sys.stdout.write('ready\\n'); sys.stdout.flush()\n"
    code += "time.sleep(60)\n"
    proc = subprocess.Popen(
        [PY, "-c", code], stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        text=True,
    )
    assert proc.stdout.readline().strip() == "ready"
    return proc


def test_sweep_kills_registered_child(tmp_path):
    reg = str(tmp_path / "pids.json")
    proc = _spawn_sleeper()
    cmd = [PY, "-c", proc.args[2]]
    register_capture_pid(proc.pid, cmd, reg)
    assert proc.poll() is None
    stopped = sweep_lingering_captures(reg, kill_wait=2.0)
    assert stopped == 1
    proc.wait(timeout=5)
    assert proc.poll() is not None
    # Registry is drained.
    assert json.load(open(reg)) == []


def test_sweep_skips_recycled_pid(tmp_path):
    """An entry whose live cmdline differs from the recorded one (pid
    recycled by the OS) must NOT be killed."""
    reg = str(tmp_path / "pids.json")
    # Register the *test runner's own* pid with a bogus cmdline: the
    # mismatch guard is the only thing standing between us and suicide.
    register_capture_pid(os.getpid(), ["ffmpeg", "-f", "decklink"], reg)
    stopped = sweep_lingering_captures(reg, kill_wait=0.1)
    assert stopped == 0
    assert os.getpid() > 0  # still alive


def test_sweep_drops_stale_entries(tmp_path):
    reg = str(tmp_path / "pids.json")
    proc = _spawn_sleeper()
    cmd = [PY, "-c", proc.args[2]]
    pid = proc.pid
    proc.kill()
    proc.wait()
    register_capture_pid(pid, cmd, reg)
    assert sweep_lingering_captures(reg) == 0
    assert json.load(open(reg)) == []


def test_register_unregister_roundtrip(tmp_path):
    reg = str(tmp_path / "pids.json")
    register_capture_pid(111, ["a"], reg)
    register_capture_pid(222, ["b"], reg)
    unregister_capture_pid(111, reg)
    assert [e["pid"] for e in json.load(open(reg))] == [222]


def test_graceful_stop_via_sigint():
    """A cooperative child exits on the SIGINT rung (no kill needed)."""
    proc = _spawn_sleeper()
    t0 = time.time()
    rc = graceful_stop(proc, quit_wait=0.3, int_wait=5.0, term_wait=5.0)
    assert proc.poll() is not None
    # SIGINT (default handler = KeyboardInterrupt) stops it promptly.
    assert time.time() - t0 < 5.0
    assert rc is not None


def test_graceful_stop_escalates_to_kill():
    """A child ignoring SIGINT+SIGTERM is killed by the last rung."""
    proc = _spawn_sleeper("ignore")
    rc = graceful_stop(proc, quit_wait=0.2, int_wait=0.4, term_wait=0.4)
    assert proc.poll() is not None
    assert rc == -signal.SIGKILL


def test_graceful_stop_already_exited():
    proc = _spawn_sleeper()
    proc.kill()
    proc.wait()
    assert graceful_stop(proc) == proc.returncode
