"""CaptureTab — device selection + bookend capture control.

Rebuild of app/ui/tabs/capture_tab.py: device dropdown + status (:609-689),
start/stop bookend capture (:690-770), progress display (:772-869), scrolling
capture log."""

from __future__ import annotations

from PyQt5.QtWidgets import (
    QComboBox, QGroupBox, QHBoxLayout, QLabel, QProgressBar, QPushButton,
    QTextEdit, QVBoxLayout, QWidget,
)

from pqa2_tpu.app.capture import CaptureState
from pqa2_tpu.ui.qt_bridge import bridge


class CaptureTab(QWidget):
    def __init__(self, parent):
        super().__init__()
        self.parent = parent
        self._bridges = []
        self._setup_ui()
        cm = self.parent.capture_manager
        if cm is not None:
            self._bridges = [
                bridge(cm.status_update, self.log, parent=self),
                bridge(cm.progress_update, self.progress.setValue, parent=self),
                bridge(cm.state_changed, self._on_state, parent=self),
                bridge(cm.capture_finished, self._on_finished, parent=self),
            ]

    def _setup_ui(self):
        layout = QVBoxLayout(self)
        dev_box = QGroupBox("Capture device")
        dev_layout = QHBoxLayout(dev_box)
        self.device_combo = QComboBox()
        self.populate_devices_and_check_status()
        refresh_btn = QPushButton("Refresh")
        refresh_btn.clicked.connect(self.populate_devices_and_check_status)
        dev_layout.addWidget(self.device_combo, 1)
        dev_layout.addWidget(refresh_btn)
        layout.addWidget(dev_box)

        ctl = QHBoxLayout()
        self.start_btn = QPushButton("Start bookend capture")
        self.start_btn.clicked.connect(self.start_capture)
        self.stop_btn = QPushButton("Stop")
        self.stop_btn.setEnabled(False)
        self.stop_btn.clicked.connect(self.stop_capture)
        ctl.addWidget(self.start_btn)
        ctl.addWidget(self.stop_btn)
        layout.addLayout(ctl)

        self.progress = QProgressBar()
        self.state_label = QLabel("Idle")
        layout.addWidget(self.progress)
        layout.addWidget(self.state_label)

        self.log_pane = QTextEdit()
        self.log_pane.setReadOnly(True)
        layout.addWidget(self.log_pane, 1)

    def populate_devices_and_check_status(self):
        self.device_combo.clear()
        om = self.parent.options_manager
        default = "Intensity Shuttle"
        if om is not None:
            default = om.get_setting("capture", "default_device") or default
        # DeckLink probing requires ffmpeg+hardware; always offer the
        # file-playback simulator so the workflow runs anywhere.
        self.device_combo.addItems([default, "File playback (simulated)"])

    def log(self, msg: str):
        self.log_pane.append(msg)

    def start_capture(self):
        cm = self.parent.capture_manager
        if cm is None:
            self.log("No capture manager available")
            return
        if getattr(self.parent, "reference_info", None) is None:
            self.log("Select and analyze a reference video first (Setup tab)")
            return
        cm.set_test_name(self.parent.current_test_name())
        if cm.start_bookend_capture(self.device_combo.currentText()):
            self.start_btn.setEnabled(False)
            self.stop_btn.setEnabled(True)

    def stop_capture(self):
        cm = self.parent.capture_manager
        if cm is not None:
            cm.stop_capture()
        self.start_btn.setEnabled(True)
        self.stop_btn.setEnabled(False)

    def _on_state(self, state):
        self.state_label.setText(str(getattr(state, "name", state)))

    def _on_finished(self, args):
        ok, path = args
        self.start_btn.setEnabled(True)
        self.stop_btn.setEnabled(False)
        if ok:
            self.log(f"Capture complete: {path}")
            self.parent.handle_capture_finished(True, path)
        else:
            self.log(f"Capture failed: {path}")
            self.parent.handle_capture_finished(False, path)

    def is_capturing(self) -> bool:
        cm = self.parent.capture_manager
        return cm is not None and cm.state == CaptureState.CAPTURING
