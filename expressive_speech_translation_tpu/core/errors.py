"""Error taxonomy and stable error IDs.

The reference's ``services/error_handler.py`` hashes the error string to an 8-char
md5 id and maps exception classes to HTTP statuses (error_handler.py:13-73). We keep
the same observable behaviour (stable short ids, user-safe messages) with a typed
hierarchy the rest of the framework can raise.
"""

from __future__ import annotations

import hashlib


def error_id(message: str) -> str:
    """Stable 8-char id for an error message (parity: error_handler.py:18)."""
    return hashlib.md5(message.encode("utf-8")).hexdigest()[:8]


class ESTError(Exception):
    """Base class. ``http_status`` drives the serve layer's response code."""

    http_status = 500
    user_message = "An internal error occurred"

    def __init__(self, message: str = "", *, user_message: str | None = None):
        super().__init__(message or self.user_message)
        if user_message is not None:
            self.user_message = user_message
        self.error_id = error_id(str(self))

    def to_payload(self) -> dict:
        return {"error": self.user_message, "error_id": self.error_id}


class ValidationError(ESTError):
    """Bad client input → 400 (parity: error_handler.py ValidationError path)."""

    http_status = 400
    user_message = "Invalid request"

    def to_payload(self) -> dict:
        # Validation messages are already user-safe; surface them directly.
        return {"error": str(self), "error_id": self.error_id}


class ResourceError(ESTError):
    """Host/device resource exhaustion → 503 (parity: resource_monitor.py)."""

    http_status = 503
    user_message = "Service temporarily unavailable due to resource constraints"


class BackendUnavailableError(ESTError):
    """A pipeline stage is not initialized / unhealthy → 503."""

    http_status = 503
    user_message = "Translation backend unavailable"


class MediaError(ESTError):
    """Decode/encode failure in the media layer → 400 (bad media) by default."""

    http_status = 400
    user_message = "Could not process the provided media file"
