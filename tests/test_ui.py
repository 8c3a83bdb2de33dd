"""UI layer checks without PyQt5: import gating + syntax validity."""

import os
import py_compile

import pytest

UI_DIR = os.path.join(os.path.dirname(__file__), "..", "pqa2_tpu", "ui")

try:
    import PyQt5  # noqa: F401

    HAVE_QT = True
except ImportError:
    HAVE_QT = False


def _ui_sources():
    out = []
    for root, _, files in os.walk(UI_DIR):
        for f in files:
            if f.endswith(".py"):
                out.append(os.path.join(root, f))
    return out


@pytest.mark.parametrize("path", _ui_sources())
def test_ui_modules_compile(path):
    """Every UI module must at least be valid Python (PyQt5 may be absent)."""
    py_compile.compile(path, doraise=True)


@pytest.mark.skipif(HAVE_QT, reason="PyQt5 present; gating path not taken")
def test_ui_import_without_qt_raises_cleanly():
    import pqa2_tpu.ui as ui

    assert ui.HAVE_QT is False
    with pytest.raises(ImportError, match="CLI"):
        ui.MainWindow()


def test_main_entry_without_qt(capsys):
    if HAVE_QT:
        pytest.skip("PyQt5 present")
    import subprocess
    import sys

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "pqa2_tpu.main"],
        capture_output=True, text=True, timeout=120,
        cwd=os.path.join(os.path.dirname(__file__), ".."), env=env,
    )
    assert r.returncode == 2
    assert "CLI" in r.stderr
