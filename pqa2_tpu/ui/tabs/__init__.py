from pqa2_tpu.ui.tabs.setup_tab import SetupTab
from pqa2_tpu.ui.tabs.capture_tab import CaptureTab
from pqa2_tpu.ui.tabs.analysis_tab import AnalysisTab
from pqa2_tpu.ui.tabs.results_tab import ResultsTab
from pqa2_tpu.ui.tabs.options_tab import OptionsTab
from pqa2_tpu.ui.tabs.help_tab import HelpTab
