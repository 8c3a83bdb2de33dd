"""Subprocess driver: construct the real UI under the PyQt5 stub.

Run by tests/test_qt_glue.py in a fresh interpreter so the stubbed PyQt5
modules never leak into other tests. Fails (non-zero exit) if any
signal-connect target is missing (AttributeError at construction), any
tab fails to build, or the wizard/handoff flows raise.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "support"))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import qt_stub

qt_stub.install()

import tempfile

from PyQt5.QtWidgets import QApplication, QMessageBox


def main():
    tmp = tempfile.mkdtemp(prefix="qt_glue_")
    os.environ["PQA2_CONFIG_DIR"] = tmp

    app = QApplication([])

    from pqa2_tpu.app.capture import CaptureManager
    from pqa2_tpu.app.options_manager import OptionsManager
    from pqa2_tpu.app.utils import FileManager
    from pqa2_tpu.ui.main_window import MainWindow

    options = OptionsManager(settings_file=os.path.join(tmp, "settings.json"))
    files = FileManager()
    capture = CaptureManager(options_manager=options)

    win = MainWindow(capture_manager=capture, file_manager=files,
                     options_manager=options)

    # --- structural checks -------------------------------------------
    assert win.tabs.count() == 6, f"expected 6 tabs, got {win.tabs.count()}"
    names = [win.tabs.tabText(i) for i in range(6)]
    assert names == ["Setup", "Capture", "Analysis", "Results", "Options",
                     "Help"], names

    # --- wizard navigation: click the real Back/Next buttons ---------
    from PyQt5.QtWidgets import QPushButton

    def nav_buttons(tab):
        found = {}

        def walk(layout):
            items = getattr(layout, "items", None)
            if not isinstance(items, list):
                return
            for it in items:
                if isinstance(it, QPushButton):
                    if "Next" in it.text():
                        found["next"] = it
                    elif "Back" in it.text():
                        found["back"] = it
                else:
                    walk(it)

        walk(tab.layout())
        return found

    assert win.tabs.currentIndex() == 0
    order = [win.setup_tab, win.capture_tab, win.analysis_tab,
             win.results_tab]
    for i, tab in enumerate(order[:-1]):
        nav = nav_buttons(tab)
        assert "next" in nav, f"tab {i} missing Next button"
        nav["next"].clicked.emit()
        assert win.tabs.currentIndex() == i + 1, (i, win.tabs.currentIndex())
    for i in (3, 2, 1):
        nav = nav_buttons(order[i])
        assert "back" in nav, f"tab {i} missing Back button"
        nav["back"].clicked.emit()
        assert win.tabs.currentIndex() == i - 1

    # --- settings propagation (live theme + device indicator) --------
    options.update_setting("branding", "app_name", "Glue Test App")
    options.flush()

    # --- options Browse... picker (dir kind) ---------------------------
    from PyQt5.QtWidgets import QFileDialog

    otab = win.options_tab
    QFileDialog._next_paths.append("/picked/output")
    otab._path_browse_buttons[("paths", "default_output_dir")].clicked.emit()
    _, out_get, _ = otab._editors[("paths", "default_output_dir")]
    assert out_get() == "/picked/output", out_get()
    otab.save_settings()
    assert options.get_setting("paths", "default_output_dir") == \
        "/picked/output"

    # --- options Refresh devices flow ---------------------------------
    otab._device_refresh_btn.clicked.emit()
    dev_field, dev_get, _dev_set = otab._editors[("capture",
                                                  "default_device")]
    assert dev_get(), "device combo should hold a device after refresh"

    # --- capture-finished handoff ------------------------------------
    import numpy as np

    from pqa2_tpu.io.y4m import write_y4m

    clip = os.path.join(tmp, "cap.y4m")
    y = np.full((48, 64), 128, np.uint8)
    c = np.full((24, 32), 128, np.uint8)
    write_y4m(clip, [{"y": y, "u": c, "v": c}] * 3)
    win.handle_capture_finished(True, clip)
    assert win.tabs.currentIndex() == 2, "handoff should land on Analysis"

    # --- menu actions exist and fire ----------------------------------
    menus = win.menuBar().actions
    assert len(menus) >= 2, "File/Help menus missing"

    # --- ResultsTab: display -> exports -> history view/delete --------
    # (reference results_tab.py:2394-2438, 2683-3065, 3081-3696)
    import json

    rtab = win.results_tab
    store_dir = os.path.join(rtab.store.base_dir, "GlueTest_20260819_000000")
    os.makedirs(store_dir, exist_ok=True)
    frames = [
        {"frameNum": i,
         "metrics": {"vmaf": 90.0 + i, "psnr_y": 40.0 + i, "ssim": 0.99}}
        for i in range(4)
    ]
    results = {
        "test_name": "GlueTest",
        "vmaf_score": 91.5, "psnr_score": 41.5, "ssim_score": 0.99,
        "model": "vmaf_v0.6.1",
        "json_path": os.path.join(store_dir, "GlueTest_vmaf.json"),
        "reference_video": "ref.y4m", "distorted_video": "cap.y4m",
        "width": 64, "height": 48, "frame_count": 4,
        "raw_results": {"frames": frames},
    }
    with open(results["json_path"], "w") as f:
        json.dump({"frames": frames}, f)
    rtab.display_results(results)
    assert "91.50" in rtab.vmaf_label.text(), rtab.vmaf_label.text()
    assert rtab.pdf_btn.isEnabled() and rtab.csv_btn.isEnabled()
    assert os.path.exists(os.path.join(store_dir, "metadata.json"))
    assert rtab.history_list.count() >= 1, "history should list the test"

    # CSV export through the real dialog flow
    csv_path = os.path.join(tmp, "frames.csv")
    QFileDialog._next_paths.append(csv_path)
    rtab.csv_btn.clicked.emit()
    assert os.path.exists(csv_path), "per-frame CSV not written"
    assert "vmaf" in open(csv_path).read()

    # PDF export runs on the real ReportGeneratorThread
    pdf_path = os.path.join(tmp, "report.pdf")
    QFileDialog._next_paths.append(pdf_path)
    rtab.pdf_btn.clicked.emit()
    if rtab._report_thread is not None:
        rtab._report_thread.join(timeout=120)
    assert os.path.exists(pdf_path), "PDF report not written"

    # history: view re-displays, combined CSV, delete empties
    rtab.vmaf_label.setText("VMAF: -")
    rtab.history_list.setCurrentRow(0)
    rtab.view_selected()
    assert "91.50" in rtab.vmaf_label.text(), "view did not re-display"
    combined = os.path.join(tmp, "combined.csv")
    QFileDialog._next_paths.append(combined)
    rtab.export_combined_csv()
    assert "GlueTest" in open(combined).read()
    rtab.history_list.setCurrentRow(0)
    rtab.delete_selected()
    assert not os.path.isdir(store_dir), "delete left the result dir"
    assert rtab.history_list.count() == 0

    # --- theme switch: ThemeManager over live settings_updated --------
    from pqa2_tpu.ui.theme_manager import ThemeManager

    win.theme_manager = ThemeManager(app, options)
    for theme in ("Dark", "Light", "Custom", "System"):
        options.update_setting("branding", "selected_theme", theme)
        win.theme_manager.apply_current_theme()
    options.flush()

    # --- start_new_test resets back to Setup -------------------------
    win.start_new_test()
    assert win.tabs.currentIndex() == 0
    assert win.analysis_tab.capture_path is None

    # --- close-time cleanup path -------------------------------------
    win.close()
    print("qt glue OK: 6 tabs, wizard nav, handoff, results tab "
          "(display/exports/history), themes, reset, close")


if __name__ == "__main__":
    main()
