"""Utilities: meters, logging, tables (SURVEY.md SS2.9 'Utils')."""

from .logging import MetricsWriter, format_table, setup_logging
from .meters import AverageMeter, Timer
from .profiling import debug_mode, profile_trace, timed

__all__ = ["MetricsWriter", "format_table", "setup_logging",
           "AverageMeter", "Timer", "debug_mode", "profile_trace", "timed"]
