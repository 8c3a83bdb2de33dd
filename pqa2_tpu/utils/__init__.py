"""Shared utilities: Qt-free signals, logging setup."""

from pqa2_tpu.utils.signals import Signal
from pqa2_tpu.utils.logs import setup_logging
