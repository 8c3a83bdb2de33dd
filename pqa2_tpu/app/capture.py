"""CaptureManager — bookend capture orchestration with pluggable backends.

Rebuild of the reference CaptureManager/CaptureMonitor (app/capture.py):
same state machine (CaptureState), signal channels (status_update/
progress_update/state_changed/capture_started/capture_finished/
frame_available), duration policy (loops x (ref + 2 x bookend) x 1.2 margin,
ceil — capture.py:855-888) and output-path policy. Hardware I/O stays a
host-side concern (SURVEY.md section 2.3 N12): the DeckLink backend shells
out to ``ffmpeg -f decklink`` exactly like the reference when an ffmpeg
binary exists, and a file-playback backend simulates the full capture chain
(white bookends + looped content) so every downstream stage is testable
without a card — the test double the reference's fallback tables imply
(SURVEY.md section 4, item 5).
"""

from __future__ import annotations

import enum
import logging
import math
import os
import shutil
import subprocess
import threading
import time
from datetime import datetime
from typing import Dict, List, Optional

import numpy as np

from pqa2_tpu.utils.signals import Signal

logger = logging.getLogger(__name__)

MAX_REPAIR_ATTEMPTS = 3


class CaptureState(enum.Enum):
    IDLE = 0
    INITIALIZING = 1
    CAPTURING = 2
    PROCESSING = 3
    COMPLETED = 4
    ERROR = 5


# -- backends ---------------------------------------------------------------


class CaptureBackend:
    """One capture attempt: produce a video file at output_path."""

    def capture(self, device_name: str, duration: float, output_path: str,
                options: Dict, progress_cb) -> bool:
        raise NotImplementedError


class DeckLinkBackend(CaptureBackend):
    """ffmpeg -f decklink capture (the reference's hardware path,
    app/capture.py:917-998). Requires an ffmpeg binary + a card."""

    def __init__(self, ffmpeg_path: Optional[str] = None):
        self.ffmpeg_path = ffmpeg_path or shutil.which("ffmpeg")

    def build_command(self, device_name: str, duration: float,
                      output_path: str, options: Dict) -> List[str]:
        fmt = options.get("format_code", "Hp29")
        pix = options.get("pixel_format", "uyvy422")
        encoder = options.get("encoder", "libx264")
        crf = options.get("crf", 18)
        preset = options.get("preset", "fast")
        cmd = [
            self.ffmpeg_path or "ffmpeg", "-y", "-hide_banner",
            "-f", "decklink",
            "-format_code", str(fmt),
            "-video_input", str(options.get("video_input", "hdmi")),
            "-i", device_name,
            "-t", f"{duration:.3f}",
            "-c:v", encoder, "-crf", str(crf), "-preset", preset,
            "-pix_fmt", "yuv420p" if pix == "uyvy422" else pix,
        ]
        if options.get("disable_audio"):
            cmd.append("-an")
        cmd.append(output_path)
        return cmd

    def capture(self, device_name, duration, output_path, options, progress_cb):
        if not self.ffmpeg_path:
            raise RuntimeError("ffmpeg binary not found; DeckLink capture unavailable")
        cmd = self.build_command(device_name, duration, output_path, options)
        logger.info("capture command: %s", " ".join(cmd))
        proc = subprocess.Popen(
            cmd, stdout=subprocess.DEVNULL, stderr=subprocess.PIPE, text=True
        )
        start = time.time()
        watchdog = duration * 2 + 10  # terminate runaways (capture.py:80-85)
        while proc.poll() is None:
            elapsed = time.time() - start
            progress_cb(min(int(100 * elapsed / max(duration, 0.01)), 99))
            if elapsed > watchdog:
                proc.terminate()
                raise TimeoutError("capture exceeded 2x expected duration")
            time.sleep(0.25)
        if proc.returncode != 0:
            stderr = proc.stderr.read() if proc.stderr else ""
            raise RuntimeError(f"ffmpeg capture failed: {stderr[-400:]}")
        return True


class FilePlaybackBackend(CaptureBackend):
    """Fake capture: synthesises what the DUT chain would produce — white
    bookends around looped reference content, written as .y4m. Drives the
    whole pipeline without hardware."""

    def __init__(self, reference_path: Optional[str] = None,
                 noise_sigma: float = 2.0, realtime: bool = False):
        self.reference_path = reference_path
        self.noise_sigma = noise_sigma
        self.realtime = realtime

    def capture(self, device_name, duration, output_path, options, progress_cb):
        from pqa2_tpu.io.video import VideoReader
        from pqa2_tpu.io.y4m import write_y4m

        src = self.reference_path or options.get("reference_path")
        if not src or not os.path.exists(src):
            raise FileNotFoundError(f"playback source not found: {src!r}")
        with VideoReader(src) as r:
            frames = list(r)
            fps = r.info.frame_rate or 30.0
        if not frames:
            raise ValueError("playback source has no frames")

        bookend_s = float(options.get("bookend_duration", 0.2))
        n_bookend = max(int(round(bookend_s * fps)), 3)
        h, w = frames[0]["y"].shape
        ch, cw = frames[0]["u"].shape
        white = {
            "y": np.full((h, w), 235, np.uint8),
            "u": np.full((ch, cw), 128, np.uint8),
            "v": np.full((ch, cw), 128, np.uint8),
        }
        rng = np.random.default_rng(0)

        def degrade(fr):
            if self.noise_sigma <= 0:
                return fr
            out = {}
            for p, v in fr.items():
                noise = rng.normal(0, self.noise_sigma, v.shape)
                out[p] = np.clip(v.astype(np.float32) + noise, 0, 255).astype(np.uint8)
            return out

        total = int(round(duration * fps))
        captured = []
        loop = [white] * n_bookend + [degrade(f) for f in frames]
        i = 0
        while len(captured) < total:
            captured.append(loop[i % len(loop)])
            i += 1
            if i % 10 == 0:
                progress_cb(min(int(100 * len(captured) / total), 99))
            if self.realtime:
                time.sleep(1.0 / fps)
        captured += [white] * n_bookend  # closing bookend
        write_y4m(output_path, captured, fps=(int(round(fps * 1000)), 1000))
        return True


# -- manager ----------------------------------------------------------------


class CaptureManager:
    """Bookend capture orchestration (app/capture.py:263-1063)."""

    def __init__(self, options_manager=None, backend: Optional[CaptureBackend] = None):
        self.status_update = Signal(str, name="status_update")
        self.progress_update = Signal(int, name="progress_update")
        self.state_changed = Signal(object, name="state_changed")
        self.capture_started = Signal(name="capture_started")
        self.capture_finished = Signal(bool, str, name="capture_finished")
        self.frame_available = Signal(object, name="frame_available")

        self.options_manager = options_manager
        self.backend = backend or FilePlaybackBackend()
        self.state = CaptureState.IDLE
        self.reference_info: Optional[Dict] = None
        self.output_directory: Optional[str] = None
        self.test_name: Optional[str] = None
        self.current_output_path: Optional[str] = None
        self._thread: Optional[threading.Thread] = None
        self._stop = threading.Event()

    # -- configuration ------------------------------------------------------

    def set_output_directory(self, output_dir: str) -> None:
        self.output_directory = output_dir

    def set_test_name(self, test_name: str) -> None:
        self.test_name = test_name

    def set_reference_video(self, reference_info: Dict) -> None:
        self.reference_info = reference_info
        if isinstance(self.backend, FilePlaybackBackend):
            self.backend.reference_path = reference_info.get("path")

    def is_capturing(self) -> bool:
        return self.state == CaptureState.CAPTURING

    def _set_state(self, state: CaptureState) -> None:
        self.state = state
        self.state_changed.emit(state)

    # -- policies -----------------------------------------------------------

    def _calculate_capture_duration(self) -> float:
        """loops x (ref + 2 x bookend), x1.2 margin, ceil to whole seconds
        (app/capture.py:855-888)."""
        ref_duration = float((self.reference_info or {}).get("duration", 0.0))
        opts = {}
        if self.options_manager is not None:
            opts = self.options_manager.get_setting("bookend") or {}
        min_loops = int(opts.get("min_loops", 3))
        max_loops = int(opts.get("max_loops", 10))
        bookend_s = float(opts.get("bookend_duration", 0.2))
        min_time = float(opts.get("min_capture_time", 5))
        max_time = float(opts.get("max_capture_time", 30))

        loop_s = ref_duration + 2.0 * bookend_s
        loops = min_loops
        while loops < max_loops and loops * loop_s < min_time:
            loops += 1
        duration = loops * loop_s * 1.2
        duration = min(max(duration, min_time), max_time)
        return float(math.ceil(duration))

    def _prepare_output_path(self) -> str:
        """Per-test output path policy (app/capture.py:359-410)."""
        out_dir = self.output_directory or os.getcwd()
        name = self.test_name or "capture"
        ts = datetime.now().strftime("%Y%m%d_%H%M%S")
        os.makedirs(out_dir, exist_ok=True)
        return os.path.join(out_dir, f"{name}_{ts}.y4m")

    # -- capture lifecycle --------------------------------------------------

    def start_bookend_capture(self, device_name: str) -> bool:
        """Asynchronous capture (app/capture.py:830-1013)."""
        if self.is_capturing():
            self.status_update.emit("Capture already in progress")
            return False
        self._set_state(CaptureState.INITIALIZING)
        self._stop.clear()
        duration = self._calculate_capture_duration()
        if duration <= 0:
            self._set_state(CaptureState.ERROR)
            self.capture_finished.emit(False, "no reference video set")
            return False
        self.current_output_path = self._prepare_output_path()
        options: Dict = {}
        if self.options_manager is not None:
            options.update(self.options_manager.get_setting("capture") or {})
            options.update(self.options_manager.get_setting("bookend") or {})
        if self.reference_info:
            options["reference_path"] = self.reference_info.get("path")

        def worker():
            self._set_state(CaptureState.CAPTURING)
            self.capture_started.emit()
            self.status_update.emit(
                f"Capturing {duration:.0f}s from {device_name}..."
            )
            try:
                ok = self.backend.capture(
                    device_name, duration, self.current_output_path, options,
                    self.progress_update.emit,
                )
                if self._stop.is_set():
                    raise InterruptedError("capture stopped by user")
                self._set_state(CaptureState.PROCESSING)
                self.progress_update.emit(100)
                self._set_state(CaptureState.COMPLETED)
                self.status_update.emit("Capture complete")
                self.capture_finished.emit(bool(ok), self.current_output_path)
            except Exception as e:
                logger.exception("capture failed")
                self._set_state(CaptureState.ERROR)
                self.status_update.emit(f"Capture failed: {e}")
                self.capture_finished.emit(False, str(e))

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()
        return True

    def stop_capture(self, cleanup_temp: bool = False) -> None:
        """Graceful stop (app/capture.py:770-828)."""
        self._stop.set()
        if self._thread is not None and self._thread.is_alive():
            self._thread.join(timeout=5.0)
        if cleanup_temp and self.current_output_path:
            try:
                os.remove(self.current_output_path)
            except OSError:
                pass
        if self.state == CaptureState.CAPTURING:
            self._set_state(CaptureState.IDLE)

    def wait(self, timeout: Optional[float] = None) -> bool:
        """Join the capture worker (test/headless convenience)."""
        if self._thread is None:
            return True
        self._thread.join(timeout)
        return not self._thread.is_alive()

    # -- preview (synthetic status frames, app/capture.py:489-605) ----------

    def start_preview(self, fps: float = 5.0) -> None:
        """Emit frame_available with synthetic status frames — the
        reference draws these with OpenCV when no live signal is shown."""
        if getattr(self, "_preview_stop", None) is not None:
            return
        self._preview_stop = threading.Event()

        def loop():
            h, w = 180, 320
            i = 0
            while not self._preview_stop.is_set():
                frame = np.full((h, w), 32, np.uint8)
                frame[10:20, 10 + 4 * (i % 60):14 + 4 * (i % 60)] = 220
                msg = self.state.name
                # coarse "text": brightness bars encode the state enum value
                frame[40:48, 10:10 + 12 * (self.state.value + 1)] = 180
                self.frame_available.emit(frame)
                i += 1
                time.sleep(1.0 / fps)

        self._preview_thread = threading.Thread(target=loop, daemon=True)
        self._preview_thread.start()

    def stop_preview(self) -> None:
        stop = getattr(self, "_preview_stop", None)
        if stop is not None:
            stop.set()
            self._preview_thread.join(timeout=2.0)
            self._preview_stop = None
