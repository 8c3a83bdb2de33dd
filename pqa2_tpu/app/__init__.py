"""API-compatible engine layer.

The reference's L4 manager classes (SURVEY.md section 1) rebuilt on the JAX
pipeline: same public methods, signal names, results-dict keys and on-disk
layout, no subprocesses in the scoring path. All classes are headless
(Qt-free); a GUI can bridge the Signal channels 1:1.
"""

from pqa2_tpu.app.options_manager import OptionsManager
from pqa2_tpu.app.utils import FileManager
from pqa2_tpu.app.vmaf_analyzer import VMAFAnalyzer, VMAFAnalysisThread
from pqa2_tpu.app.bookend_aligner import BookendAligner, BookendAlignmentThread
from pqa2_tpu.app.reference_analyzer import (
    ReferenceAnalyzer,
    ReferenceAnalysisThread,
)
from pqa2_tpu.app.capture import CaptureManager, CaptureState
from pqa2_tpu.app.report_generator import ReportGenerator, ReportGeneratorThread
from pqa2_tpu.app.workflow import CombinedWorkflowThread, run_combined_workflow
from pqa2_tpu.app.results_store import ResultsStore
