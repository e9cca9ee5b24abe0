"""Utility types (≈ reference meta/: UncertainValue, HistoryBuffer,
MemoryMonitor)."""

from .uncertain import UncertainValue
from .history import HistoryBuffer
from .memory import MemoryMonitor
