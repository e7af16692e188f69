"""HTTP facade (Werkzeug WSGI) preserving the reference's Flask contract."""

from .app import App, create_app
from .limiter import RateLimiter
from .video import VideoProcessor, generate_progress_event

__all__ = ["App", "RateLimiter", "VideoProcessor", "create_app", "generate_progress_event"]
