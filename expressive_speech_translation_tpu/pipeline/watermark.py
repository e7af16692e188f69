"""Provenance watermarking.

Parity with Backend/audiowmark.py (104 LoC): a JSON payload
``{app, v, req_id, ts_utc, pipeline}`` embedded as container ``comment``
metadata, plus a verifier (Backend/verify_watermark.py:12-50). The reference
shells out to ffmpeg for the metadata write; here the media layer handles
containers, and for WAV we read/write the payload natively via a LIST-INFO
ICMT chunk (no external binary needed).
"""

from __future__ import annotations

import json
import logging
import struct
import time
from pathlib import Path
from typing import Any, Dict, Optional

log = logging.getLogger(__name__)

APP_NAME = "expressive-speech-translation-tpu"
VERSION = 1


def make_payload(request_id: str, pipeline: str = "cascaded") -> Dict[str, Any]:
    return {
        "app": APP_NAME,
        "v": VERSION,
        "req_id": request_id,
        "ts_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "pipeline": pipeline,
    }


class WaterMark:
    """add_watermark / extract_watermark over WAV files (audiowmark.py parity)."""

    @staticmethod
    def add_watermark(path: str | Path, payload: Dict[str, Any]) -> None:
        """Append a LIST-INFO chunk carrying the JSON payload as ICMT."""
        path = Path(path)
        data = path.read_bytes()
        if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
            raise ValueError(f"{path} is not a RIFF/WAVE file")
        comment = json.dumps(payload, separators=(",", ":")).encode()
        if len(comment) % 2:
            comment += b"\x00"
        icmt = b"ICMT" + struct.pack("<I", len(comment)) + comment
        chunk = b"LIST" + struct.pack("<I", 4 + len(icmt)) + b"INFO" + icmt
        out = data + chunk
        # fix the RIFF size field
        out = out[:4] + struct.pack("<I", len(out) - 8) + out[8:]
        path.write_bytes(out)
        log.info("watermarked %s (req_id=%s)", path, payload.get("req_id"))

    @staticmethod
    def extract_watermark(path: str | Path) -> Optional[Dict[str, Any]]:
        """Scan RIFF chunks for LIST-INFO/ICMT; return the decoded payload."""
        data = Path(path).read_bytes()
        if data[:4] != b"RIFF":
            return None
        pos = 12
        while pos + 8 <= len(data):
            cid = data[pos:pos + 4]
            size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
            body = data[pos + 8:pos + 8 + size]
            if cid == b"LIST" and body[:4] == b"INFO":
                ipos = 4
                while ipos + 8 <= len(body):
                    sub = body[ipos:ipos + 4]
                    ssize = struct.unpack("<I", body[ipos + 4:ipos + 8])[0]
                    if sub == b"ICMT":
                        raw = body[ipos + 8:ipos + 8 + ssize].rstrip(b"\x00")
                        try:
                            return json.loads(raw.decode())
                        except (ValueError, UnicodeDecodeError):
                            return None
                    ipos += 8 + ssize + (ssize % 2)
            pos += 8 + size + (size % 2)
        return None

    @staticmethod
    def verify(path: str | Path) -> bool:
        """Parity with Backend/verify_watermark.py: payload present + ours."""
        payload = WaterMark.extract_watermark(path)
        return bool(payload) and payload.get("app") == APP_NAME
