"""Audio-URL ingestion: platform policy + download hook.

Parity with services/audio_link_routes.py (277 LoC): allow-list
(YouTube/TikTok/SoundCloud/...) vs deny-list of DRM platforms
(Spotify/Netflix/...) (:16-34), 120 s duration cap (:138-139), conversion to
16 kHz mono. The fetcher is injectable (``fetcher(url) -> (audio, sr)``);
concrete fetchers live in ``serve/media_fetcher.py`` (yt-dlp shell-out when
the binary is installed + direct streaming download via the native libav
shim — the reference's yt-dlp role, audio_link_routes.py:83-180). With no
fetcher resolvable a clear error is raised.
"""

from __future__ import annotations

import logging
from typing import Callable, Optional, Tuple
from urllib.parse import urlparse

import numpy as np

from ..core.errors import MediaError, ValidationError

log = logging.getLogger(__name__)

ALLOWED_DOMAINS = (
    "youtube.com", "youtu.be", "tiktok.com", "soundcloud.com", "vimeo.com",
    "dailymotion.com", "twitch.tv",
)
DENIED_DOMAINS = (
    "spotify.com", "netflix.com", "hulu.com", "disneyplus.com", "hbomax.com",
    "primevideo.com", "apple.com", "pandora.com", "tidal.com", "deezer.com",
)
MAX_URL_MEDIA_SECONDS = 120.0  # audio_link_routes.py:138-139

Fetcher = Callable[[str], Tuple[np.ndarray, int]]


def validate_url(url: str) -> str:
    """Normalise + policy-check a media URL. Returns the hostname."""
    try:
        parsed = urlparse(url)
    except ValueError as e:
        raise ValidationError("Invalid URL") from e
    if parsed.scheme not in ("http", "https") or not parsed.netloc:
        raise ValidationError("Invalid URL (must be http(s))")
    # urlparse.hostname strips userinfo/port and lowercases — splitting
    # netloc on ":" misread "user:pass@youtube.com" as host "user"
    host = (parsed.hostname or "").rstrip(".")
    bare = host[4:] if host.startswith("www.") else host
    if any(bare == d or bare.endswith("." + d) for d in DENIED_DOMAINS):
        raise ValidationError(
            "This platform is not supported due to content protection (DRM)"
        )
    if not any(bare == d or bare.endswith("." + d) for d in ALLOWED_DOMAINS):
        raise ValidationError("This platform is not in the supported list")
    return bare


def _no_fetcher(url: str) -> Tuple[np.ndarray, int]:
    msg = "No media fetcher configured (yt-dlp equivalent required for URL ingestion)"
    raise MediaError(msg, user_message=msg)


def process_audio_url(
    url: str,
    backend,
    target_lang: str,
    source_lang: str = "eng",
    *,
    fetcher: Optional[Fetcher] = None,
) -> dict:
    """Download → cap at 120 s → 16 kHz mono → translate."""
    validate_url(url)
    audio, sr = (fetcher or _no_fetcher)(url)
    audio = np.asarray(audio)
    # channel-aware duration: a [C, T] stereo fetcher result must not count
    # C×T samples (a valid 90 s clip would read as 180 s and be rejected)
    frames = audio.shape[-1] if audio.ndim > 1 else audio.shape[0]
    duration = frames / max(sr, 1)
    if duration > MAX_URL_MEDIA_SECONDS:
        raise ValidationError(
            f"Media too long ({duration:.0f}s). Maximum for URL imports is "
            f"{MAX_URL_MEDIA_SECONDS:.0f}s"
        )
    from ..pipeline.audio_processor import AudioProcessor

    audio16 = AudioProcessor().process_audio(audio, orig_sr=sr)
    return backend.translate_speech(audio16, source_lang, target_lang)
