"""OptionsTab — settings UI over OptionsManager.

Rebuild of app/ui/tabs/options_tab.py: General (dirs/encoder, :79-193),
Capture (:194-344), Analysis (VMAF knobs, :345-469), Advanced (bookend
knobs incl. white-threshold slider 160-250 and frame offset -10..10,
:471-623), plus the new TPU category. save/load against OptionsManager
(:971-1623)."""

from __future__ import annotations

from PyQt5.QtWidgets import (
    QCheckBox, QComboBox, QDoubleSpinBox, QFormLayout, QHBoxLayout, QLabel,
    QLineEdit, QPushButton, QSlider, QSpinBox, QTabWidget, QVBoxLayout,
    QWidget,
)
from PyQt5.QtCore import Qt


class OptionsTab(QWidget):
    def __init__(self, parent):
        super().__init__()
        self.parent = parent
        self.om = parent.options_manager
        self._setup_ui()
        self.load_settings()

    def _setup_ui(self):
        layout = QVBoxLayout(self)
        self.sub_tabs = QTabWidget()
        self.sub_tabs.addTab(self._setup_general_tab(), "General")
        self.sub_tabs.addTab(self._setup_capture_tab(), "Capture")
        self.sub_tabs.addTab(self._setup_analysis_tab(), "Analysis")
        self.sub_tabs.addTab(self._setup_advanced_tab(), "Advanced")
        self.sub_tabs.addTab(self._setup_tpu_tab(), "TPU")
        layout.addWidget(self.sub_tabs)
        btns = QHBoxLayout()
        save_btn = QPushButton("Save settings")
        save_btn.clicked.connect(self.save_settings)
        reset_btn = QPushButton("Reset to defaults")
        reset_btn.clicked.connect(self.reset_defaults)
        btns.addWidget(save_btn)
        btns.addWidget(reset_btn)
        layout.addLayout(btns)

    def _setup_general_tab(self):
        w = QWidget()
        form = QFormLayout(w)
        self.output_dir_edit = QLineEdit()
        self.encoder_combo = QComboBox()
        self.encoder_combo.addItems(["libx264", "libx265", "rawvideo"])
        self.crf_spin = QSpinBox()
        self.crf_spin.setRange(0, 51)
        form.addRow("Output directory:", self.output_dir_edit)
        form.addRow("Default encoder:", self.encoder_combo)
        form.addRow("Default CRF:", self.crf_spin)
        return w

    def _setup_capture_tab(self):
        w = QWidget()
        form = QFormLayout(w)
        self.device_edit = QLineEdit()
        self.resolution_combo = QComboBox()
        self.resolution_combo.addItems(
            ["1920x1080", "1280x720", "720x576", "720x486"])
        self.rate_combo = QComboBox()
        self.rate_combo.addItems(
            ["23.98", "24", "25", "29.97", "30", "50", "59.94", "60"])
        form.addRow("Default device:", self.device_edit)
        form.addRow("Resolution:", self.resolution_combo)
        form.addRow("Frame rate:", self.rate_combo)
        return w

    def _setup_analysis_tab(self):
        w = QWidget()
        form = QFormLayout(w)
        self.model_combo = QComboBox()
        from pqa2_tpu.models.registry import available_models

        self.model_combo.addItems(available_models() or ["vmaf_v0.6.1"])
        self.pool_combo = QComboBox()
        self.pool_combo.addItems(["mean", "min", "max", "harmonic_mean"])
        self.subsample_spin = QSpinBox()
        self.subsample_spin.setRange(1, 10)
        self.psnr_check = QCheckBox("Compute PSNR")
        self.ssim_check = QCheckBox("Compute SSIM")
        form.addRow("Default model:", self.model_combo)
        form.addRow("Pool method:", self.pool_combo)
        form.addRow("Feature subsample:", self.subsample_spin)
        form.addRow(self.psnr_check)
        form.addRow(self.ssim_check)
        return w

    def _setup_advanced_tab(self):
        w = QWidget()
        form = QFormLayout(w)
        self.min_loops_spin = QSpinBox()
        self.min_loops_spin.setRange(1, 20)
        self.max_loops_spin = QSpinBox()
        self.max_loops_spin.setRange(1, 50)
        self.bookend_dur_spin = QDoubleSpinBox()
        self.bookend_dur_spin.setRange(0.1, 2.0)
        self.bookend_dur_spin.setSingleStep(0.1)
        self.white_slider = QSlider(Qt.Horizontal)
        self.white_slider.setRange(160, 250)
        self.white_label = QLabel("200")
        self.white_slider.valueChanged.connect(
            lambda v: self.white_label.setText(str(v)))
        self.offset_spin = QSpinBox()
        self.offset_spin.setRange(-10, 10)
        self.adaptive_check = QCheckBox("Adaptive brightness")
        self.motion_check = QCheckBox("Motion compensation")
        self.fallback_check = QCheckBox("Fallback to full video")
        form.addRow("Min loops:", self.min_loops_spin)
        form.addRow("Max loops:", self.max_loops_spin)
        form.addRow("Bookend duration (s):", self.bookend_dur_spin)
        row = QHBoxLayout()
        row.addWidget(self.white_slider)
        row.addWidget(self.white_label)
        form.addRow("White threshold:", row)
        form.addRow("Frame offset:", self.offset_spin)
        form.addRow(self.adaptive_check)
        form.addRow(self.motion_check)
        form.addRow(self.fallback_check)
        return w

    def _setup_tpu_tab(self):
        w = QWidget()
        form = QFormLayout(w)
        self.chunk_spin = QSpinBox()
        self.chunk_spin.setRange(1, 256)
        self.mesh_data_spin = QSpinBox()
        self.mesh_data_spin.setRange(0, 4096)
        self.mesh_space_spin = QSpinBox()
        self.mesh_space_spin.setRange(1, 64)
        self.profile_dir_edit = QLineEdit()
        form.addRow("Chunk size (frames):", self.chunk_spin)
        form.addRow("Mesh data axis (0=auto):", self.mesh_data_spin)
        form.addRow("Mesh space axis:", self.mesh_space_spin)
        form.addRow("Profiler trace dir:", self.profile_dir_edit)
        return w

    # -- load/save -----------------------------------------------------------

    def load_settings(self):
        om = self.om
        if om is None:
            return
        self.output_dir_edit.setText(om.get_setting("paths", "default_output_dir") or "")
        self.encoder_combo.setCurrentText(om.get_setting("encoder", "default_encoder"))
        self.crf_spin.setValue(int(om.get_setting("encoder", "default_crf")))
        self.device_edit.setText(om.get_setting("capture", "default_device"))
        self.resolution_combo.setCurrentText(om.get_setting("capture", "resolution"))
        self.rate_combo.setCurrentText(str(om.get_setting("capture", "frame_rate")))
        self.model_combo.setCurrentText(om.get_setting("vmaf", "default_model"))
        self.pool_combo.setCurrentText(om.get_setting("vmaf", "pool_method"))
        self.subsample_spin.setValue(int(om.get_setting("vmaf", "feature_subsample")))
        self.psnr_check.setChecked(bool(om.get_setting("vmaf", "psnr_enabled")))
        self.ssim_check.setChecked(bool(om.get_setting("vmaf", "ssim_enabled")))
        self.min_loops_spin.setValue(int(om.get_setting("bookend", "min_loops")))
        self.max_loops_spin.setValue(int(om.get_setting("bookend", "max_loops")))
        self.bookend_dur_spin.setValue(float(om.get_setting("bookend", "bookend_duration")))
        self.white_slider.setValue(int(om.get_setting("bookend", "white_threshold")))
        self.offset_spin.setValue(int(om.get_setting("bookend", "frame_offset")))
        self.adaptive_check.setChecked(bool(om.get_setting("bookend", "adaptive_brightness")))
        self.motion_check.setChecked(bool(om.get_setting("bookend", "motion_compensation")))
        self.fallback_check.setChecked(bool(om.get_setting("bookend", "fallback_to_full_video")))
        self.chunk_spin.setValue(int(om.get_setting("tpu", "chunk_size")))
        self.mesh_data_spin.setValue(int(om.get_setting("tpu", "mesh_data")))
        self.mesh_space_spin.setValue(int(om.get_setting("tpu", "mesh_space")))
        self.profile_dir_edit.setText(om.get_setting("tpu", "profile_dir") or "")

    def save_settings(self):
        om = self.om
        if om is None:
            return
        om.update_category("paths", {"default_output_dir": self.output_dir_edit.text()})
        om.update_category("encoder", {
            "default_encoder": self.encoder_combo.currentText(),
            "default_crf": self.crf_spin.value(),
        })
        om.update_category("capture", {
            "default_device": self.device_edit.text(),
            "resolution": self.resolution_combo.currentText(),
            "frame_rate": float(self.rate_combo.currentText()),
        })
        om.update_category("vmaf", {
            "default_model": self.model_combo.currentText(),
            "pool_method": self.pool_combo.currentText(),
            "feature_subsample": self.subsample_spin.value(),
            "psnr_enabled": self.psnr_check.isChecked(),
            "ssim_enabled": self.ssim_check.isChecked(),
        })
        om.update_category("bookend", {
            "min_loops": self.min_loops_spin.value(),
            "max_loops": self.max_loops_spin.value(),
            "bookend_duration": self.bookend_dur_spin.value(),
            "white_threshold": self.white_slider.value(),
            "frame_offset": self.offset_spin.value(),
            "adaptive_brightness": self.adaptive_check.isChecked(),
            "motion_compensation": self.motion_check.isChecked(),
            "fallback_to_full_video": self.fallback_check.isChecked(),
        })
        om.update_category("tpu", {
            "chunk_size": self.chunk_spin.value(),
            "mesh_data": self.mesh_data_spin.value(),
            "mesh_space": self.mesh_space_spin.value(),
            "profile_dir": self.profile_dir_edit.text(),
        })
        self.parent.statusBar().showMessage("Settings saved")

    def reset_defaults(self):
        if self.om is not None:
            self.om.reset_to_defaults()
            self.load_settings()
