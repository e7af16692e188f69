"""Tokenizer interfaces for the model engines.

The reference gets tokenizers implicitly from whisper/transformers downloads
(SentencePiece for NLLB, BPE for Whisper/Qwen2). This environment has no
egress, so tokenization is a protocol with three implementations:

- :class:`SubwordTokenizer` — a REAL subword tokenizer (HF ``tokenizers`` BPE
  backend), loadable from a ``tokenizer.json`` or trained locally via
  :func:`train_bpe_tokenizer`. This is the production path: deployments point
  it at the real NLLB/Whisper/Qwen2 tokenizer.json files; tests train tiny
  ones so token-id handling (lang codes, specials, OOV) is exercised for real.
- :class:`HFTokenizer` — wraps a transformers tokenizer loaded from a LOCAL
  directory (deployments with weights on disk use this; no network).
- :class:`ByteTokenizer` — hermetic byte-level fallback (ids = bytes + offset)
  so engines, tests and benches run without any assets.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict, Iterable, List, Optional, Protocol, Sequence

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


class SubwordTokenizer:
    """Real subword tokenizer over the HF ``tokenizers`` Rust backend.

    Accepts a ``tokenizers.Tokenizer`` object or a path to a ``tokenizer.json``
    (the serialization format every modern HF checkpoint ships — NLLB, Whisper
    and Qwen2 included, replacing the reference's implicit downloads at
    services/cascaded_backend.py:434 / Docker/cosyvoice_api.py).
    """

    def __init__(self, tok_or_path):
        from tokenizers import Tokenizer as RustTokenizer

        if isinstance(tok_or_path, (str, Path)):
            self._tok = RustTokenizer.from_file(str(tok_or_path))
        else:
            self._tok = tok_or_path
        self.vocab_size = self._tok.get_vocab_size()

    def encode(self, text: str) -> List[int]:
        return self._tok.encode(text, add_special_tokens=False).ids

    def decode(self, ids: Sequence[int]) -> str:
        return self._tok.decode(list(ids), skip_special_tokens=True)

    def token_to_id(self, token: str) -> Optional[int]:
        return self._tok.token_to_id(token)

    def save(self, path: str | Path) -> None:
        self._tok.save(str(path))

    @property
    def raw(self):
        return self._tok


def train_bpe_tokenizer(
    corpus: Iterable[str],
    vocab_size: int = 1024,
    *,
    lang_codes: Sequence[str] = (),
    extra_specials: Sequence[str] = (),
) -> SubwordTokenizer:
    """Train a small NLLB-layout BPE tokenizer from raw text, offline.

    Layout mirrors the real NLLB/SentencePiece convention the reference relies
    on (cascaded_backend.py:139-141 resolves FLORES codes through the
    tokenizer): specials ``<s>/<pad>/</s>/<unk>`` at ids 0-3, content BPE next,
    and language-code tokens appended at the TOP of the vocab (real NLLB puts
    ``eng_Latn``… at 256001+). Used by tests and by deployments that fine-tune
    their own subword model.
    """
    from tokenizers import Tokenizer as RustTokenizer
    from tokenizers import decoders, models, pre_tokenizers, trainers

    tok = RustTokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Metaspace()
    tok.decoder = decoders.Metaspace()
    trainer = trainers.BpeTrainer(
        vocab_size=max(vocab_size - len(lang_codes) - len(extra_specials), 8),
        special_tokens=["<s>", "<pad>", "</s>", "<unk>"],
        show_progress=False,
    )
    tok.train_from_iterator(list(corpus), trainer=trainer)
    tail = list(extra_specials) + list(lang_codes)
    if tail:
        from tokenizers import AddedToken

        tok.add_special_tokens([AddedToken(t, special=True) for t in tail])
    return SubwordTokenizer(tok)


def nllb_lang_ids(tokenizer, codes: Optional[Dict[str, str]] = None) -> Dict[str, int]:
    """App-code → language-token id, resolved through a real tokenizer.

    ``codes`` defaults to the pipeline's app→FLORES map. Apps codes whose
    FLORES token is absent from the tokenizer are dropped (callers fall back
    to raising / placeholder mode per engine policy).
    """
    from .languages import NLLB_LANGUAGES

    codes = codes or NLLB_LANGUAGES
    out: Dict[str, int] = {}
    for app, flores in codes.items():
        tid = tokenizer.token_to_id(flores) if hasattr(tokenizer, "token_to_id") else None
        if tid is not None:
            out[app] = int(tid)
            out[flores] = int(tid)
    return out


def load_tokenizer(path: Optional[str | Path]) -> Tokenizer:
    """Local tokenizer when a path is given and loadable; byte fallback
    otherwise (logged — quality depends on the real tokenizer). A
    ``tokenizer.json`` loads through the Rust backend; a directory loads
    through transformers."""
    if path:
        try:
            p = Path(path)
            if p.is_file() and p.suffix == ".json":
                return SubwordTokenizer(p)
            return HFTokenizer(path)
        except Exception:  # noqa: BLE001 — fall back with a clear signal
            log.exception("failed to load tokenizer from %s; using byte fallback", path)
    return ByteTokenizer()
