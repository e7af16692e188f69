"""In-memory rate limiter (Flask-Limiter-equivalent semantics).

Parity with the reference's limits: default ``500/day; 100/hour`` and per-route
``20/min`` translate, ``10/min`` video + audio-url, ``5/min`` podcast
(Backend/app.py:211, :254, :336, :401, :444). Sliding-window; callers key
hits per (client IP, route) — Flask-Limiter scopes its counters per route,
so hits on one endpoint must not consume another's budget.
"""

from __future__ import annotations

import re
import threading
import time
from collections import defaultdict, deque
from typing import Dict, Iterable, List, Tuple

_UNITS = {
    "second": 1.0, "minute": 60.0, "hour": 3600.0, "day": 86400.0,
}

_RULE_RE = re.compile(r"(\d+)\s*(?:per|/)\s*(second|minute|hour|day)s?")


def parse_limit(rule: str) -> Tuple[int, float]:
    m = _RULE_RE.search(rule.strip())
    if not m:
        raise ValueError(f"bad rate limit rule {rule!r}")
    return int(m.group(1)), _UNITS[m.group(2)]


class RateLimiter:
    def __init__(self, default_limits: Iterable[str] = ()):
        self.default_limits: List[Tuple[int, float]] = [parse_limit(r) for r in default_limits]
        self._hits: Dict[str, deque] = defaultdict(deque)
        self._lock = threading.Lock()

    def check(self, key: str, limits: Iterable[str] = ()) -> Tuple[bool, str]:
        """Record a hit for ``key``; False + description if any window exceeds."""
        now = time.monotonic()
        rules = [parse_limit(r) for r in limits] + self.default_limits
        if not rules:
            return True, ""
        max_window = max(w for _, w in rules)
        with self._lock:
            q = self._hits[key]
            while q and now - q[0] > max_window:
                q.popleft()
            for count, window in rules:
                recent = sum(1 for t in q if now - t <= window)
                if recent >= count:
                    return False, f"{count} per {int(window)}s"
            q.append(now)
        return True, ""

    def reset(self) -> None:
        with self._lock:
            self._hits.clear()
