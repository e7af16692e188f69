"""C++ libav shim bindings (built by media/csrc; see build_native.sh).

Until the shim is built, compressed-format decode raises a clear MediaError;
WAV I/O never needs it (media/wavio.py is pure python).
"""

from __future__ import annotations

from ..core.errors import MediaError

_LIB = None


def _load():
    global _LIB
    if _LIB is None:
        raise MediaError(
            "native media shim not built (run media/csrc/build_native.sh); "
            "only WAV input is supported without it"
        )
    return _LIB


def decode_audio_bytes(raw: bytes, suffix: str):
    _load()
    raise MediaError(f"decode for {suffix} not yet wired")
