"""Central logging tree and request-ID generation.

Reproduces the reference's 4-handler logging layout (Backend/app.py:59-125):
console INFO, ``app_debug.log`` (DEBUG, midnight rotation ×3), ``app_main.log``
(INFO, midnight ×7), ``app_error.log`` (ERROR, 5 MB rotating ×3), plus
per-library level overrides — and its short request-id scheme
(``time_ns``-derived ids, cascaded_backend.py:398; 8-char uuid ids in the
FastAPI services, cosyvoice_api.py:104).
"""

from __future__ import annotations

import logging
import logging.handlers
import time
import uuid
from pathlib import Path

_FORMAT = "%(asctime)s - %(name)s - %(levelname)s - %(message)s"

_NOISY_LIBRARIES = {
    "werkzeug": logging.WARNING,
    "urllib3": logging.WARNING,
    "jax._src": logging.WARNING,
    "jax._src.xla_bridge": logging.ERROR,
    "orbax": logging.WARNING,
    "filelock": logging.WARNING,
}

_configured = False


def setup_logging(log_dir: str | Path = "logs", *, console_level: int = logging.INFO) -> logging.Logger:
    """Idempotently configure the root logging tree. Returns the root logger."""
    global _configured
    root = logging.getLogger()
    if _configured:
        return root
    _configured = True

    log_path = Path(log_dir)
    log_path.mkdir(parents=True, exist_ok=True)
    formatter = logging.Formatter(_FORMAT)
    root.setLevel(logging.DEBUG)

    console = logging.StreamHandler()
    console.setLevel(console_level)
    console.setFormatter(formatter)
    root.addHandler(console)

    debug_file = logging.handlers.TimedRotatingFileHandler(
        log_path / "app_debug.log", when="midnight", backupCount=3
    )
    debug_file.setLevel(logging.DEBUG)
    debug_file.setFormatter(formatter)
    root.addHandler(debug_file)

    main_file = logging.handlers.TimedRotatingFileHandler(
        log_path / "app_main.log", when="midnight", backupCount=7
    )
    main_file.setLevel(logging.INFO)
    main_file.setFormatter(formatter)
    root.addHandler(main_file)

    error_file = logging.handlers.RotatingFileHandler(
        log_path / "app_error.log", maxBytes=5 * 1024 * 1024, backupCount=3
    )
    error_file.setLevel(logging.ERROR)
    error_file.setFormatter(formatter)
    root.addHandler(error_file)

    for name, level in _NOISY_LIBRARIES.items():
        logging.getLogger(name).setLevel(level)
    return root


def new_request_id(short: bool = True) -> str:
    """8-char request id, unique-enough and sortable-ish (time-seeded uuid5)."""
    if short:
        return uuid.uuid5(uuid.NAMESPACE_OID, f"{time.time_ns()}-{uuid.uuid4()}").hex[:8]
    return uuid.uuid4().hex
