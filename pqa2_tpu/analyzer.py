"""Convenience alias: ``from pqa2_tpu.analyzer import VMAFAnalyzer``.

The engine layer lives in pqa2_tpu.app; this module re-exports the most
commonly used classes at a short path.
"""

from pqa2_tpu.app.vmaf_analyzer import VMAFAnalysisThread, VMAFAnalyzer
from pqa2_tpu.app.bookend_aligner import BookendAligner, BookendAlignmentThread
from pqa2_tpu.app.reference_analyzer import ReferenceAnalyzer
