"""ctypes bindings for the C++ libav media shim (media/csrc/est_media.cpp).

Replaces the reference's ffmpeg subprocess calls (SURVEY.md §2 native-deps
table) with in-process decode/encode/mux. Build once with
``media/csrc/build_native.sh``; the .so is loaded lazily. When absent,
callers get a clear :class:`MediaError` (WAV I/O never needs it —
media/wavio.py is pure python).
"""

from __future__ import annotations

import ctypes
import logging
import tempfile
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

from ..core.errors import MediaError

log = logging.getLogger(__name__)

_LIB: Optional[ctypes.CDLL] = None
_SO_PATH = Path(__file__).parent / "csrc" / "libest_media.so"


def available() -> bool:
    try:
        return _load() is not None
    except MediaError:
        return False


def _load() -> ctypes.CDLL:
    global _LIB
    if _LIB is not None:
        return _LIB
    if not _SO_PATH.exists():
        # auto-build on first use (g++ + libav dev headers are build deps)
        script = _SO_PATH.parent / "build_native.sh"
        if script.exists():
            import subprocess

            try:
                subprocess.run(["bash", str(script)], check=True,
                               capture_output=True, timeout=300)
                log.info("built native media shim at %s", _SO_PATH)
            except Exception as e:  # noqa: BLE001 — fall through to the clear error
                log.warning("native shim auto-build failed: %s", e)
    if not _SO_PATH.exists():
        raise MediaError(
            "native media shim not built (run media/csrc/build_native.sh); "
            "only WAV input is supported without it",
            user_message="Only WAV input is supported in this deployment",
        )
    lib = ctypes.CDLL(str(_SO_PATH))
    lib.est_last_error.restype = ctypes.c_char_p
    lib.est_decode_audio.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.est_decode_video.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_double),
    ]
    lib.est_encode_audio.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_int,
    ]
    lib.est_mux_audio_video.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_long,
        ctypes.c_int, ctypes.c_char_p,
    ]
    lib.est_encode_video.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
        ctypes.c_int, ctypes.c_int, ctypes.c_double,
        ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_int,
    ]
    lib.est_free.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def _err(lib) -> str:
    return lib.est_last_error().decode(errors="replace")


def decode_audio(
    path: str | Path, *, target_rate: int = 0, target_channels: int = 0
) -> Tuple[np.ndarray, int]:
    """Any container/codec → (float32 [T] mono or [C, T], sample_rate)."""
    lib = _load()
    out = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_long()
    ch = ctypes.c_int()
    sr = ctypes.c_int()
    rc = lib.est_decode_audio(
        str(path).encode(), target_rate, target_channels,
        ctypes.byref(out), ctypes.byref(n), ctypes.byref(ch), ctypes.byref(sr),
    )
    if rc != 0:
        raise MediaError(f"decode_audio({path}): {_err(lib)}")
    total = n.value * ch.value
    audio = np.ctypeslib.as_array(out, shape=(total,)).copy()
    lib.est_free(out)
    if ch.value > 1:
        audio = audio.reshape(n.value, ch.value).T
    return np.ascontiguousarray(audio), sr.value


def decode_audio_bytes(raw: bytes, suffix: str) -> Tuple[np.ndarray, int]:
    """Decode compressed audio bytes (mp3/ogg/flac/...) via a temp file."""
    with tempfile.NamedTemporaryFile(suffix=suffix) as f:
        Path(f.name).write_bytes(raw)
        return decode_audio(f.name)


def decode_video(
    path: str | Path, *, max_frames: int = 0, frame_step: int = 1
) -> Tuple[np.ndarray, float]:
    """video → (uint8 RGB frames [N, H, W, 3], fps)."""
    lib = _load()
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = ctypes.c_long()
    w = ctypes.c_int()
    h = ctypes.c_int()
    fps = ctypes.c_double()
    rc = lib.est_decode_video(
        str(path).encode(), max_frames, frame_step,
        ctypes.byref(out), ctypes.byref(n), ctypes.byref(w), ctypes.byref(h),
        ctypes.byref(fps),
    )
    if rc != 0:
        raise MediaError(f"decode_video({path}): {_err(lib)}")
    total = n.value * h.value * w.value * 3
    frames = np.ctypeslib.as_array(out, shape=(total,)).copy()
    lib.est_free(out)
    return frames.reshape(n.value, h.value, w.value, 3), fps.value


def encode_audio(path: str | Path, audio: np.ndarray, sr: int) -> None:
    """mono float32 → container by extension (.wav/.mp4/.m4a/...)."""
    lib = _load()
    x = np.ascontiguousarray(np.asarray(audio, np.float32).reshape(-1))
    rc = lib.est_encode_audio(
        str(path).encode(), x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(x), sr,
    )
    if rc != 0:
        raise MediaError(f"encode_audio({path}): {_err(lib)}")


def mux_audio_video(video_path: str | Path, audio: np.ndarray, sr: int, out_path: str | Path) -> None:
    """Replace the video's audio track (video stream-copied)."""
    lib = _load()
    x = np.ascontiguousarray(np.asarray(audio, np.float32).reshape(-1))
    rc = lib.est_mux_audio_video(
        str(video_path).encode(), x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(x), sr, str(out_path).encode(),
    )
    if rc != 0:
        raise MediaError(f"mux({video_path}): {_err(lib)}")


def encode_video(
    path: str | Path, frames: np.ndarray, fps: float,
    audio: Optional[np.ndarray] = None, audio_rate: int = 16_000,
) -> None:
    """uint8 RGB frames [N, H, W, 3] (+ optional mono audio) → container."""
    lib = _load()
    f = np.ascontiguousarray(np.asarray(frames, np.uint8))
    n, h, w, c = f.shape
    if c != 3:
        raise MediaError("frames must be RGB24 [N, H, W, 3]")
    if audio is not None:
        a = np.ascontiguousarray(np.asarray(audio, np.float32).reshape(-1))
        a_ptr, a_n = a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(a)
    else:
        a, a_ptr, a_n = None, ctypes.POINTER(ctypes.c_float)(), 0
    rc = lib.est_encode_video(
        str(path).encode(), f.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, w, h, fps, a_ptr, a_n, audio_rate,
    )
    if rc != 0:
        raise MediaError(f"encode_video({path}): {_err(lib)}")


class NativeVideoIO:
    """serve/video.VideoIO implementation backed by the shim (no lip-sync model
    wired here — the pipeline layer supplies one; mux is the fallback)."""

    def __init__(self, lipsync_fn=None):
        self._lipsync_fn = lipsync_fn

    def extract_audio(self, video_path: str) -> Tuple[np.ndarray, int]:
        return decode_audio(video_path, target_channels=1)

    def frames(self, video_path: str, *, frame_step: int = 3,
               max_frames: int = 1200) -> Tuple[np.ndarray, float]:
        """Subsampled RGB frames for visual speech mapping → (frames,
        EFFECTIVE fps = source_fps / frame_step).

        Returns an EMPTY array when the cap truncates the clip: the visual
        mapper derives the clip duration from len(frames)/fps, so a
        truncated set would squeeze the dubbed audio into the first part of
        the video — strictly worse than the natural-flow fallback.
        """
        fr, fps = decode_video(video_path, max_frames=max_frames,
                               frame_step=frame_step)
        if len(fr) >= max_frames:
            log.info("frames(%s): clip longer than the %d-frame mapping cap; "
                     "visual mapping skipped", video_path, max_frames)
            return fr[:0], fps / frame_step
        return fr, fps / frame_step

    def mux(self, video_path: str, audio: np.ndarray, sr: int, out_path: str) -> None:
        mux_audio_video(video_path, audio, sr, out_path)

    def lipsync(self, video_path: str, audio: np.ndarray, sr: int, out_path: str) -> None:
        if self._lipsync_fn is None:
            raise MediaError("no lip-sync model configured")
        frames, fps = decode_video(video_path)
        rendered = self._lipsync_fn(frames, fps, audio, sr)
        encode_video(out_path, rendered, fps, audio=audio, audio_rate=sr)
