"""Application entry point.

Rebuild of the reference's main.py:30-82 — logging setup, manager
construction, MainWindow — launching the Qt GUI when PyQt5 is available and
pointing at the CLI otherwise. Run as ``python -m pqa2_tpu.main``.
"""

from __future__ import annotations

import sys


def main() -> int:
    import os

    if os.environ.get("JAX_PLATFORMS"):
        # Honor the env var at config level (same workaround as cli.py and
        # tests/conftest.py): interpreter startup hooks on some hosts
        # register a hardware plugin and pin the platform programmatically,
        # silently overriding the env var — the state validation below
        # queries jax.devices(), which would then initialise the pinned
        # hardware backend (and can block on an unreachable remote runtime)
        # instead of the platform the user asked for.
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from pqa2_tpu.utils.logs import setup_logging

    logger = setup_logging()

    from pqa2_tpu.app.capture import CaptureManager
    from pqa2_tpu.app.options_manager import OptionsManager
    from pqa2_tpu.app.utils import FileManager, validate_application_state

    options_manager = OptionsManager()
    # Point the model registry at the configured user models directory
    # (reference: "VMAF models directory" path setting + models/ dir scan,
    # app/ui/tabs/analysis_tab.py:1005-1077).
    from pqa2_tpu.models.registry import set_user_models_dir

    set_user_models_dir(options_manager.get_setting("paths", "models_dir"))
    file_manager = FileManager()
    capture_manager = CaptureManager(options_manager=options_manager)

    checks = validate_application_state(options_manager, file_manager)
    if not checks["all_ok"]:
        logger.warning("application state checks: %s", checks)

    try:
        from PyQt5.QtWidgets import QApplication
    except ImportError:
        print(
            "PyQt5 is not installed — GUI unavailable.\n"
            "Use the CLI instead: python -m pqa2_tpu.cli --help",
            file=sys.stderr,
        )
        return 2

    from pqa2_tpu.ui.main_window import MainWindow
    from pqa2_tpu.ui.theme_manager import ThemeManager

    app = QApplication(sys.argv)
    theme = ThemeManager(app, options_manager)
    theme.apply_current_theme()
    window = MainWindow(capture_manager, file_manager, options_manager)
    # Attached so settings saves re-apply the theme live
    # (MainWindow._on_settings_updated).
    window.theme_manager = theme
    window.show()
    return app.exec_()


if __name__ == "__main__":
    sys.exit(main())
