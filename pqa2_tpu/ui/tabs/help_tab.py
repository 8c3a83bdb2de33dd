"""HelpTab — static documentation.

Rebuild of app/ui/tabs/help_tab.py: quick start (:91), user guide (:168),
VMAF primer (:422), troubleshooting (:617) as HTML sections."""

from __future__ import annotations

from PyQt5.QtWidgets import QTabWidget, QTextBrowser, QVBoxLayout, QWidget


def _browser(html: str) -> QTextBrowser:
    b = QTextBrowser()
    b.setHtml(html)
    return b


class HelpTab(QWidget):
    def __init__(self, parent=None):
        super().__init__()
        layout = QVBoxLayout(self)
        tabs = QTabWidget()
        tabs.addTab(_browser(self._get_quick_start_content()), "Quick start")
        tabs.addTab(_browser(self._get_user_guide_content()), "User guide")
        tabs.addTab(_browser(self._get_vmaf_primer_content()), "About VMAF")
        tabs.addTab(_browser(self._get_troubleshooting_content()), "Troubleshooting")
        layout.addWidget(tabs)

    def _get_quick_start_content(self) -> str:
        return """
        <h2>Quick start</h2>
        <ol>
          <li><b>Setup tab</b>: choose a reference video; it is analyzed
              automatically (resolution, frame rate, bookends).</li>
          <li><b>Capture tab</b>: pick a device and press <i>Start bookend
              capture</i>. The reference should be playing in a loop with
              white bookend frames through the device under test. Without
              hardware, choose <i>File playback (simulated)</i>.</li>
          <li><b>Analysis tab</b>: pick a VMAF model and run the combined
              analysis — the capture is temporally aligned via its white
              bookends and scored (VMAF + PSNR + SSIM) on the accelerator.</li>
          <li><b>Results tab</b>: scores with quality interpretation,
              PDF/HTML/CSV export, and the history of past tests.</li>
        </ol>"""

    def _get_user_guide_content(self) -> str:
        return """
        <h2>User guide</h2>
        <h3>Bookend workflow</h3>
        <p>The reference clip is played in a loop with pure white frames
        ("bookends") between repetitions. The aligner locates the white
        sections in the capture with a batched luma-statistics pass, picks
        the loop whose length best matches the reference, refines the offset
        by cross-correlation, and scores the aligned pair.</p>
        <h3>Models</h3>
        <p>All standard Netflix models ship preparsed: vmaf_v0.6.1 (HD),
        vmaf_v0.6.1neg (no enhancement gain), vmaf_4k_v0.6.1, and the
        vmaf_b_v0.6.3 bootstrap ensemble with confidence intervals.</p>
        <h3>Outputs</h3>
        <p>Each test produces a <code>&lt;name&gt;_&lt;timestamp&gt;</code>
        directory holding the libvmaf-schema <code>*_vmaf.json</code>,
        ffmpeg-format <code>*_psnr.txt</code>/<code>*_ssim.txt</code>, and
        <code>metadata.json</code>.</p>"""

    def _get_vmaf_primer_content(self) -> str:
        return """
        <h2>About VMAF</h2>
        <p>VMAF (Video Multi-method Assessment Fusion) predicts perceptual
        video quality by fusing elementary features — VIF at four scales,
        ADM detail-loss, and temporal motion — with a support-vector
        regressor trained on subjective scores. Scores range 0–100:</p>
        <ul><li>&ge;90 excellent</li><li>80–90 good</li><li>70–80 fair</li>
        <li>60–70 poor</li><li>&lt;60 bad</li></ul>
        <p>PSNR (&ge;40 dB excellent) and SSIM (&ge;0.95 excellent) are
        computed alongside with ffmpeg-compatible semantics.</p>"""

    def _get_troubleshooting_content(self) -> str:
        return """
        <h2>Troubleshooting</h2>
        <ul>
          <li><b>No bookends detected</b> — raise loop count, check the
              playback chain actually shows white frames, or lower the white
              threshold (Options &rarr; Advanced). With
              <i>fallback to full video</i> on, the whole capture is used.</li>
          <li><b>Low scores on a good chain</b> — check temporal alignment
              confidence in the analysis log; enable motion compensation for
              chains with spatial misregistration.</li>
          <li><b>No capture hardware</b> — the simulated file-playback device
              exercises the full workflow.</li>
          <li><b>Slow first run</b> — the scoring program compiles once per
              resolution; subsequent runs are fast.</li>
        </ul>"""
