"""Behavioral tests for the Qt-free UI controllers (ui/controllers/).

These cover the logic the reference buries inside Qt widgets: history
browse/view/delete/bulk-export (results_tab.py:3081-3696), device status
(capture_tab.py:609-689), the capture log pane (:870-915), and preview
frame handling (:449-530)."""

import csv
import json
import os

import numpy as np
import pytest

from pqa2_tpu.app.results_store import ResultsStore
from pqa2_tpu.ui.controllers import (
    CaptureLogModel,
    HistoryController,
    PreviewModel,
    check_device_status,
    device_rows,
)
from pqa2_tpu.ui.controllers.capturelog import classify
from pqa2_tpu.ui.controllers.devicestatus import FALLBACK_DEVICES
from pqa2_tpu.ui.controllers.preview import to_rgb


pytestmark = pytest.mark.smoke  # fast tier (run_tests.py --quick)


def _results(vmaf=97.5, frames=12):
    return {
        "vmaf_score": vmaf, "psnr_score": 38.0, "ssim_score": 0.98,
        "model": "vmaf_v0.6.1", "width": 1920, "height": 1080,
        "frame_count": frames,
        "reference_video": "ref.y4m", "distorted_video": "dist.y4m",
        "raw_results": {"frames": [
            {"frameNum": i, "metrics": {"vmaf": vmaf}} for i in range(frames)
        ]},
    }


# -- history ------------------------------------------------------------------


def test_history_refresh_and_labels(tmp_path):
    store = ResultsStore(str(tmp_path))
    store.save(_results(88.25), "testA", timestamp="20260101_010101")
    store.save(_results(55.0), "testB", timestamp="20260202_020202")
    hc = HistoryController(store)
    rows = hc.refresh()
    assert len(rows) == 2
    # Newest first; labels carry score + geometry + model.
    assert rows[0]["test_name"].startswith("testB")
    assert "VMAF 55.00" in rows[0]["label"]
    assert "1920x1080" in rows[0]["label"]
    assert "vmaf_v0.6.1" in rows[0]["label"]


def test_history_view_prefers_metadata(tmp_path):
    store = ResultsStore(str(tmp_path))
    d = store.save(_results(91.0), "t", timestamp="20260101_000000")
    hc = HistoryController(store)
    res, msg = hc.view(d)
    assert res["vmaf_score"] == 91.0
    assert msg == "loaded metadata"


def test_history_view_rebuilds_from_vmaf_json(tmp_path):
    d = tmp_path / "bare_20260101_000000"
    d.mkdir()
    with open(d / "x_vmaf.json", "w") as f:
        json.dump({"pooled_metrics": {"vmaf": {"mean": 77.7}},
                   "frames": []}, f)
    hc = HistoryController(ResultsStore(str(tmp_path)))
    res, msg = hc.view(str(d))
    assert res["vmaf_score"] == 77.7
    assert res["json_path"].endswith("x_vmaf.json")
    assert msg == "rebuilt from vmaf json"


def test_history_view_missing(tmp_path):
    hc = HistoryController(ResultsStore(str(tmp_path)))
    empty = tmp_path / "empty"
    empty.mkdir()
    res, msg = hc.view(str(empty))
    assert res is None and "no VMAF results" in msg


def test_history_delete_and_containment(tmp_path):
    store = ResultsStore(str(tmp_path / "base"))
    d1 = store.save(_results(), "a", timestamp="20260101_000001")
    d2 = store.save(_results(), "b", timestamp="20260101_000002")
    outside = tmp_path / "outside"
    outside.mkdir()
    hc = HistoryController(store)
    n, failures = hc.delete([d1, str(outside)])
    assert n == 1
    assert len(failures) == 1 and "outside" in failures[0]
    assert os.path.isdir(outside)  # never touched
    assert not os.path.isdir(d1)
    assert [r["test_dir"] for r in hc.rows] == [d2]


def test_history_combined_export(tmp_path):
    store = ResultsStore(str(tmp_path))
    store.save(_results(80.0), "x", timestamp="20260101_000001")
    store.save(_results(60.0), "y", timestamp="20260101_000002")
    hc = HistoryController(store)
    out = hc.export_combined(str(tmp_path / "hist.csv"))
    with open(out) as f:
        rows = list(csv.reader(f))
    assert rows[0][0] == "test_name"
    assert len(rows) == 3


# -- device status ------------------------------------------------------------


class _FakeOM:
    def __init__(self, devices=None, default=None, result=(True, "ok"),
                 raise_on_check=False):
        self._devices = devices
        self._default = default
        self._result = result
        self._raise = raise_on_check

    def get_decklink_devices(self):
        return self._devices

    def get_setting(self, cat, key=None):
        return self._default if key == "default_device" else None

    def test_device_connection(self, name):
        if self._raise:
            raise RuntimeError("probe exploded")
        return self._result


def test_device_rows_probe_and_default():
    om = _FakeOM(devices=["DeckLink 4K", "UltraStudio"],
                 default="UltraStudio")
    devices, current = device_rows(om)
    assert devices == ["DeckLink 4K", "UltraStudio"]
    assert current == "UltraStudio"


def test_device_rows_fallback_list():
    devices, current = device_rows(_FakeOM(devices=[]))
    assert devices == FALLBACK_DEVICES
    assert current is None


def test_device_status_levels():
    ok = check_device_status("DeckLink", _FakeOM(result=(True, "signal ok")))
    assert (ok.level, ok.color) == ("connected", "#00AA00")
    assert "connected" in ok.tooltip

    bad = check_device_status("DeckLink", _FakeOM(result=(False, "no card")))
    assert (bad.level, bad.color) == ("unavailable", "#AA0000")
    assert "not connected" in bad.tooltip

    none_sel = check_device_status("", _FakeOM())
    assert none_sel.level == "unknown"

    no_om = check_device_status("DeckLink", None)
    assert no_om.level == "unknown"

    err = check_device_status("DeckLink", _FakeOM(raise_on_check=True))
    assert err.level == "unknown" and "probe exploded" in err.message


# -- capture log ---------------------------------------------------------------


def test_log_classification():
    assert classify("Capture failed: timeout") == "error"
    assert classify("WARNING: dropped frame") == "warning"
    assert classify("Capture complete") == "success"
    assert classify("Starting device...") == "info"


def test_log_entries_and_html():
    log = CaptureLogModel(max_entries=3, clock=lambda: "12:00:00")
    seen = []
    log.on_entry(seen.append)
    via_signal = []
    log.entry_added.connect(via_signal.append)  # the Qt-bridgeable channel
    log.add("Starting")
    e = log.add("Capture failed: no signal")
    assert e.severity == "error"
    assert e.text == "[12:00:00] Capture failed: no signal"
    assert "#D32F2F" in e.html and "bold" in e.html
    assert log.has_errors
    assert len(seen) == 2
    assert len(via_signal) == 2 and via_signal[-1].severity == "error"
    # Ring buffer: oldest entries drop.
    log.add("a")
    log.add("b")
    assert len(log.entries) == 3
    assert log.tail(2)[-1].message == "b"


def test_log_attach_to_capture_manager(tmp_path):
    from pqa2_tpu.app.capture import CaptureManager, FilePlaybackBackend
    from pqa2_tpu.io.y4m import write_y4m

    n, h, w = 3, 32, 48
    frames = [{"y": np.full((h, w), 64, np.uint8),
               "u": np.full((h // 2, w // 2), 128, np.uint8),
               "v": np.full((h // 2, w // 2), 128, np.uint8)}
              for _ in range(n)]
    ref = str(tmp_path / "ref.y4m")
    write_y4m(ref, frames)
    cm = CaptureManager(backend=FilePlaybackBackend())
    cm.set_output_directory(str(tmp_path))
    cm.set_reference_video({"path": ref, "duration": n / 30.0,
                            "frame_rate": 30.0})
    log = CaptureLogModel(clock=lambda: "00:00:00")
    log.attach(cm)
    counts = []
    cm.frame_count_updated.connect(lambda n, t: counts.append((n, t)))
    assert cm.start_bookend_capture("Fake Device")
    assert cm.wait(timeout=60)
    msgs = [e.message for e in log.entries]
    assert any("Capturing" in m for m in msgs)
    assert any(m.startswith("Capture finished successfully") for m in msgs)
    # The CaptureMonitor counter channel fired with a sane total estimate.
    assert counts and counts[-1][0] > 0
    assert counts[-1][1] >= counts[-1][0] - 10


# -- options schema -------------------------------------------------------------


def test_schema_keys_exist_in_defaults():
    """Every schema field must name a real (category, key) in the defaults
    tree — catches schema drift when settings are renamed."""
    from pqa2_tpu.app.options_manager import default_settings
    from pqa2_tpu.ui.controllers.options_schema import FIELDS

    tree = default_settings()
    for f in FIELDS:
        assert f.category in tree, f.category
        assert f.key in tree[f.category], (f.category, f.key)


def test_schema_load_save_roundtrip(tmp_path):
    from pqa2_tpu.app.options_manager import OptionsManager
    from pqa2_tpu.ui.controllers.options_schema import (
        coerce, fields_for_tab, load_values, save_values,
    )

    om = OptionsManager(settings_file=str(tmp_path / "s.json"),
                        save_debounce_s=0)
    values = load_values(om)
    # Defaults load for every field.
    assert values[("bookend", "white_threshold")] == 200
    assert values[("vmaf", "feature_precision")] == "auto"
    assert values[("capture", "pixel_format")] == "uyvy422"
    # Mutate a few through the schema and save.
    values[("bookend", "white_threshold")] = 222
    values[("vmaf", "feature_precision")] = "float"
    values[("capture", "frame_rate")] = "25"  # widget gives text
    fr_field = next(f for f in fields_for_tab("Capture")
                    if f.key == "frame_rate")
    values[("capture", "frame_rate")] = coerce(
        fr_field, values[("capture", "frame_rate")])
    save_values(om, values)
    assert om.get_setting("bookend", "white_threshold") == 222
    assert om.get_setting("vmaf", "feature_precision") == "float"
    assert om.get_setting("capture", "frame_rate") == 25.0
    # Untouched settings keep their defaults.
    assert om.get_setting("bookend", "min_loops") == 3


def test_schema_coerce_kinds():
    from pqa2_tpu.ui.controllers.options_schema import FIELDS, coerce

    by = {(f.category, f.key): f for f in FIELDS}
    assert coerce(by[("bookend", "white_threshold")], 200.0) == 200
    assert isinstance(coerce(by[("bookend", "bookend_duration")], "0.3"),
                      float)
    assert coerce(by[("capture", "disable_audio")], 1) is True
    assert coerce(by[("encoder", "default_preset")], "fast") == "fast"


def test_schema_tabs_cover_all_fields():
    from pqa2_tpu.ui.controllers.options_schema import (
        FIELDS, TABS, fields_for_tab,
    )

    covered = [f for t in TABS for f in fields_for_tab(t)]
    assert len(covered) == len(FIELDS)
    # No duplicate (category, key) bindings.
    keys = [(f.category, f.key) for f in FIELDS]
    assert len(keys) == len(set(keys))


# -- setup ----------------------------------------------------------------------


def test_parse_duration():
    from pqa2_tpu.ui.controllers import parse_duration

    assert parse_duration("Full duration") is None
    assert parse_duration("5s") == 5.0
    assert parse_duration("60s") == 60.0
    assert parse_duration("") is None
    assert parse_duration("garbage") is None


def test_reference_summary():
    from pqa2_tpu.ui.controllers import reference_summary

    info = {"width": 1920, "height": 1080, "frame_rate": 29.97,
            "duration": 10.0, "frame_count": 300, "pix_fmt": "yuv420p",
            "codec": "rawvideo", "has_bookends": True}
    lines = reference_summary(info)
    assert lines[0] == "Resolution: 1920x1080"
    assert "29.970 fps" in lines[1]
    assert lines[-1].endswith("yes")
    info["bit_depth"] = 10
    assert any("10-bit" in l for l in reference_summary(info))


def test_load_preview_rgb(tmp_path, rng):
    from pqa2_tpu.io.y4m import write_y4m
    from pqa2_tpu.ui.controllers import load_preview_rgb

    h, w = 32, 48
    frames = [{"y": np.full((h, w), 40 * (i + 1), np.uint8),
               "u": np.full((h // 2, w // 2), 128, np.uint8),
               "v": np.full((h // 2, w // 2), 128, np.uint8)}
              for i in range(3)]
    p = str(tmp_path / "clip.y4m")
    write_y4m(p, frames)
    rgb, status = load_preview_rgb(p)
    assert status == "ok" and rgb.shape == (h, w, 3)
    assert (rgb[..., 0] == 40).all()
    rgb2, _ = load_preview_rgb(p, frame_index=1)
    assert (rgb2[..., 0] == 80).all()
    none_rgb, msg = load_preview_rgb(str(tmp_path / "missing.y4m"))
    assert none_rgb is None and "Preview unavailable" in msg


# -- preview --------------------------------------------------------------------


def test_to_rgb_variants():
    gray = np.full((4, 6), 100, np.uint8)
    rgb, status = to_rgb(gray)
    assert status == "ok" and rgb.shape == (4, 6, 3)
    assert (rgb[..., 0] == 100).all()

    bgr = np.zeros((4, 6, 3), np.uint8)
    bgr[..., 0] = 255  # blue channel
    rgb, _ = to_rgb(bgr)
    assert (rgb[..., 2] == 255).all() and (rgb[..., 0] == 0).all()

    rgb, _ = to_rgb({"y": gray})
    assert rgb.shape == (4, 6, 3)

    # 10-bit code values must scale by the real depth, not a blind >> 8
    # (which would render 0..1023 as black).
    hi = np.full((2, 2), 1000, np.uint16)
    rgb, _ = to_rgb(hi, bit_depth=10)
    assert rgb.dtype == np.uint8 and (rgb == 250).all()
    rgb_inferred, _ = to_rgb(hi)  # depth inferred from the data range
    assert (rgb_inferred == 250).all()

    assert to_rgb(None) == (None, "No video feed received")
    r, msg = to_rgb(np.zeros((0,), np.uint8))
    assert r is None and "Empty" in msg
    r, msg = to_rgb("nonsense")
    assert r is None and "Invalid" in msg
    r, msg = to_rgb(np.zeros((2, 2, 4), np.uint8))
    assert r is None and "Unsupported" in msg


def test_preview_throttle_and_counters():
    t = [0.0]
    pm = PreviewModel(max_render_fps=10.0, clock=lambda: t[0])
    frame = np.full((4, 4), 50, np.uint8)
    assert pm.submit(frame) is not None  # first frame renders
    assert pm.submit(frame) is None      # same instant: throttled
    t[0] += 0.05
    assert pm.submit(frame) is None      # still inside 100ms window
    t[0] += 0.06
    assert pm.submit(frame) is not None  # window elapsed
    assert pm.frames_received == 4
    assert pm.frames_rendered == 2
    assert pm.counter_text == "Frame: 4"


def test_preview_invalid_frame_status():
    pm = PreviewModel(max_render_fps=0)  # no throttle
    assert pm.submit(None) is None
    assert pm.last_status == "No video feed received"
    assert pm.submit(np.zeros((2, 2), np.uint8)) is not None
    assert pm.last_status == "ok"


def test_format_detection_flow(tmp_path):
    """Per-device format detection (reference options_tab.py:625-970):
    hardware-free environments get the fallback table; applying a format
    writes the capture settings the command builder reads."""
    from pqa2_tpu.app.options_manager import OptionsManager
    from pqa2_tpu.ui.controllers import formats as fc

    rows, source = fc.detect_formats(None)
    assert rows and source == "fallback"
    assert any(r["id"] == "Hp29" for r in rows)
    disp = fc.format_display(rows[0])
    assert rows[0]["id"] in disp and "fps" in disp

    om = OptionsManager(settings_file=str(tmp_path / "s.json"))
    hp29 = next(r for r in rows if r["id"] == "Hp29")
    updates = fc.apply_format(om, hp29)
    om.flush()
    assert updates["format_code"] == "Hp29"
    assert om.get_setting("capture", "format_code") == "Hp29"
    assert om.get_setting("capture", "resolution") == "1920x1080"
    assert float(om.get_setting("capture", "frame_rate")) == 29.97

    # Unknown device: probe fails without ffmpeg -> fallback, never raises.
    rows2, _ = fc.detect_formats("DeckLink Mini Recorder")
    assert rows2


def test_branding_logo_resolution(tmp_path):
    """Window-icon source (reference main_window.py:196-228, hardcoded
    there; settings-driven here): a configured readable path wins, a
    missing one falls back to the bundled asset, which must ship."""
    from pqa2_tpu.app.options_manager import OptionsManager
    from pqa2_tpu.ui import branding

    assert os.path.isfile(branding.DEFAULT_LOGO)
    assert branding.resolve_logo_path(None) == branding.DEFAULT_LOGO

    om = OptionsManager(settings_file=str(tmp_path / "s.json"))
    assert branding.resolve_logo_path(om) == branding.DEFAULT_LOGO

    custom = tmp_path / "corp.png"
    custom.write_bytes(b"\x89PNG\r\n\x1a\n")
    om.update_setting("branding", "logo_path", str(custom))
    assert branding.resolve_logo_path(om) == str(custom)

    om.update_setting("branding", "logo_path", str(tmp_path / "gone.png"))
    assert branding.resolve_logo_path(om) == branding.DEFAULT_LOGO
