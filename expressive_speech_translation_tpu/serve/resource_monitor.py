"""Resource monitoring (parity: services/resource_monitor.py, 95 LoC).

``MEMORY_THRESHOLD=0.9``, pre-flight ``check_resources``, usage logging.
GPU checks become device-memory checks via jax; host checks via psutil.
"""

from __future__ import annotations

import gc
import logging
from typing import Any, Dict

import psutil

from ..core.errors import ResourceError

log = logging.getLogger(__name__)

MEMORY_THRESHOLD = 0.9  # resource_monitor.py:11


def check_memory(threshold: float = MEMORY_THRESHOLD) -> bool:
    usage = psutil.virtual_memory().percent / 100.0
    if usage > threshold:
        log.warning("host memory usage %.1f%% above threshold", usage * 100)
        gc.collect()
        usage = psutil.virtual_memory().percent / 100.0
    return usage <= threshold


def device_memory_stats() -> Dict[str, Any]:
    """Per-device HBM stats when the backend exposes them."""
    try:
        import jax

        stats = {}
        for d in jax.devices():
            s = d.memory_stats() or {}
            stats[str(d)] = {
                "bytes_in_use": s.get("bytes_in_use"),
                "bytes_limit": s.get("bytes_limit"),
            }
        return stats
    except Exception:  # noqa: BLE001 — stats are best-effort
        return {}


def check_resources(threshold: float = MEMORY_THRESHOLD) -> None:
    """Pre-flight gate (resource_monitor.py check_resources): raise 503 when
    the host is out of headroom."""
    if not check_memory(threshold):
        raise ResourceError("Insufficient memory to process request")


def log_resource_usage(tag: str = "") -> Dict[str, Any]:
    vm = psutil.virtual_memory()
    proc = psutil.Process()
    info = {
        "host_memory_pct": vm.percent,
        "process_rss_mb": proc.memory_info().rss / 1e6,
        "cpu_pct": psutil.cpu_percent(interval=None),
        "devices": device_memory_stats(),
    }
    log.info("resources%s: %s", f" [{tag}]" if tag else "", info)
    return info
