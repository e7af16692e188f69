"""Tokenizer interfaces for the model engines.

The reference gets tokenizers implicitly from whisper/transformers downloads.
This environment has no egress, so tokenization is a protocol with two
implementations:

- :class:`HFTokenizer` — wraps a transformers tokenizer loaded from a LOCAL
  directory (deployments with weights on disk use this; no network).
- :class:`ByteTokenizer` — hermetic byte-level fallback (ids = bytes + offset)
  so engines, tests and benches run without any assets.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import List, Optional, Protocol, Sequence

log = logging.getLogger(__name__)


class Tokenizer(Protocol):
    def encode(self, text: str) -> List[int]: ...
    def decode(self, ids: Sequence[int]) -> str: ...
    vocab_size: int


class ByteTokenizer:
    """UTF-8 bytes + offset; ids < offset are reserved for specials."""

    def __init__(self, offset: int = 4, vocab_size: int = 260):
        self.offset = offset
        self.vocab_size = vocab_size

    def encode(self, text: str) -> List[int]:
        return [b + self.offset for b in text.encode("utf-8")]

    def decode(self, ids: Sequence[int]) -> str:
        data = bytes(i - self.offset for i in ids if self.offset <= i < 256 + self.offset)
        return data.decode("utf-8", errors="replace")


class HFTokenizer:
    """transformers tokenizer from a local path (offline)."""

    def __init__(self, path: str | Path):
        from transformers import AutoTokenizer

        self._tok = AutoTokenizer.from_pretrained(str(path), local_files_only=True)
        self.vocab_size = len(self._tok)

    def encode(self, text: str) -> List[int]:
        return self._tok.encode(text, add_special_tokens=False)

    def decode(self, ids: Sequence[int]) -> str:
        return self._tok.decode(list(ids), skip_special_tokens=True)

    @property
    def raw(self):
        return self._tok


def load_tokenizer(path: Optional[str | Path]) -> Tokenizer:
    """Local HF tokenizer when a path is given and loadable; byte fallback
    otherwise (logged — quality depends on the real tokenizer)."""
    if path:
        try:
            return HFTokenizer(path)
        except Exception:  # noqa: BLE001 — fall back with a clear signal
            log.exception("failed to load tokenizer from %s; using byte fallback", path)
    return ByteTokenizer()
