"""Podcast upload persistence (podcast_routes.py:17-95 parity).

The reference saves each upload with a ``{uuid}_{secure_filename}`` name
under an upload folder, derives an mm:ss duration, counts episodes by
listing the folder, and returns metadata JSON. Rebuilt here with the same
shape plus retrieval (list / metadata / raw audio) and restart survival via
JSON sidecars — the part the round-2 build validated but never persisted.
"""

from __future__ import annotations

import datetime as _dt
import json
import re
import threading
import uuid
from pathlib import Path
from typing import Dict, List, Optional, Tuple

from ..core.errors import ValidationError


def secure_filename(name: str) -> str:
    """werkzeug.utils.secure_filename-style sanitisation (path bits and
    non [A-Za-z0-9._-] chars dropped)."""
    name = Path(name).name
    name = re.sub(r"[^A-Za-z0-9._-]", "_", name).strip("._")
    return name or "upload"


class PodcastStore:
    def __init__(self, root: str | Path):
        self.root = Path(root).absolute()
        self.root.mkdir(parents=True, exist_ok=True)
        self._lock = threading.Lock()

    def save(self, raw: bytes, filename: str, *, title: Optional[str] = None,
             duration_seconds: float = 0.0, sample_rate: int = 0) -> Dict:
        unique_id = uuid.uuid4().hex
        fname = secure_filename(filename)
        path = self.root / f"{unique_id}_{fname}"
        minutes, seconds = int(duration_seconds // 60), int(duration_seconds % 60)
        with self._lock:
            path.write_bytes(raw)
            # sidecar name is {id}.meta.json — derived from the id only, so
            # an upload whose sanitized NAME ends in .json can never collide
            # with it (audio files always carry the joining underscore;
            # sidecars never do)
            meta = {
                "id": unique_id,
                "podcast_id": unique_id,            # round-2 response alias
                "title": title or Path(fname).stem,
                "filename": fname,
                # episode number = folder count, podcast_routes.py:79 —
                # counted over the same enumeration list() surfaces, so
                # legacy-sidecar podcasts don't collide with new numbers
                "episode": str(sum(1 for _ in self._sidecars()) + 1),
                "duration": f"{minutes:02d}:{seconds:02d}",
                "duration_seconds": round(duration_seconds, 2),
                "sample_rate": sample_rate,
                "date": _dt.datetime.now().isoformat(),
                "filepath": str(path),
            }
            (self.root / f"{unique_id}.meta.json").write_text(
                json.dumps(meta), encoding="utf-8")
        return meta

    _LEGACY_SIDECAR = re.compile(r"[0-9a-f]{32}_.+\.json$")

    def _sidecars(self):
        """Current-scheme sidecars plus legacy ``{id}_{fname}.json`` ones
        (pre-rename uploads must stay visible after an upgrade — the store's
        restart-survival contract). A legacy sidecar must carry the 32-hex
        id prefix AND sit next to its audio file ``{id}_{fname}`` — that
        second check keeps current-scheme AUDIO uploads whose sanitized
        name happens to end in ``.json`` from being read as metadata."""
        for sidecar in sorted(self.root.glob("*.meta.json")):
            yield sidecar
        for sidecar in sorted(self.root.glob("*_*.json")):
            if sidecar.name.endswith(".meta.json"):
                continue
            if not self._LEGACY_SIDECAR.fullmatch(sidecar.name):
                continue
            if not Path(str(sidecar)[: -len(".json")]).exists():
                continue
            yield sidecar

    def list(self) -> List[Dict]:
        out = []
        for sidecar in self._sidecars():
            try:
                out.append(json.loads(sidecar.read_text(encoding="utf-8")))
            except (OSError, ValueError):
                continue
        return out

    def get(self, podcast_id: str) -> Tuple[Dict, Path]:
        if not re.fullmatch(r"[0-9a-f]{32}", podcast_id or ""):
            raise ValidationError("invalid podcast id")
        sidecar = self.root / f"{podcast_id}.meta.json"
        if not sidecar.exists():
            # legacy scheme: {id}_{fname}.json next to {id}_{fname}
            legacy = [p for p in self.root.glob(f"{podcast_id}_*.json")
                      if not p.name.endswith(".meta.json")]
            for cand in legacy:
                try:
                    meta = json.loads(cand.read_text(encoding="utf-8"))
                except (OSError, ValueError):
                    continue
                audio_path = Path(str(cand)[: -len(".json")])
                if audio_path.exists():
                    return meta, audio_path
            raise ValidationError(f"unknown podcast id {podcast_id}")
        meta = json.loads(sidecar.read_text(encoding="utf-8"))
        audio_path = self.root / f"{podcast_id}_{meta['filename']}"
        if not audio_path.exists():
            raise ValidationError(f"podcast {podcast_id} audio missing")
        return meta, audio_path
