"""Observability: logging tree, request IDs, RTF/xRT counters, profiler hooks."""

from .logging_setup import new_request_id, setup_logging
from .perf import StageTimer, performance_logger, rtf

__all__ = [
    "StageTimer",
    "new_request_id",
    "performance_logger",
    "rtf",
    "setup_logging",
]
