"""Checkpoint-backed semantic scorers: sonar_score + bert_score_f1.

The reference's linguistic evaluation uses SONAR sentence similarity and
BERTScore (Evaluation/analyze_outputs.py:92-109). Both need model weights —
and SONAR's text encoder is itself an NLLB-derived transformer, so the same
baked NLLB checkpoint that serves translation (``EST_MODELS_DIR/nmt``, the
``bake_models`` output) can back both scores locally:

- ``sonar_score(a, b)`` — cosine similarity of mask-mean-pooled NLLB encoder
  sentence embeddings (the SONAR recipe: pooled encoder states).
- ``bert_score_f1(cand, ref)`` — BERTScore F1 over the contextual token
  embeddings: greedy max-cosine matching candidate→reference (precision) and
  reference→candidate (recall), F1 of the two (Zhang et al. 2020, computed
  with a local encoder instead of HF roberta).

No checkpoint mounted → ``available() is False`` and the analysis emits NaN
(never crashes — the reference template crashed on these imports).
"""

from __future__ import annotations

import logging
import os
from pathlib import Path
from typing import List, Optional

import numpy as np

log = logging.getLogger(__name__)


class SemanticScorer:
    """NLLB-encoder-backed sentence/token embedding scorer.

    ``params/cfg/tokenizer`` may be supplied directly (tests); by default the
    baked checkpoint at ``$EST_MODELS_DIR/nmt`` is loaded lazily, matching
    the serving path's weight discovery."""

    def __init__(self, params=None, cfg=None, tokenizer=None,
                 models_dir: Optional[str] = None):
        self._params, self._cfg = params, cfg
        self._tok = tokenizer
        self._models_dir = models_dir
        self._tried = params is not None
        self._fns = {}

    def _try_load(self) -> None:
        if self._tried:
            return
        self._tried = True
        root = self._models_dir or os.environ.get("EST_MODELS_DIR")
        if not root:
            return
        try:
            from ..models import nllb as nj
            from ..models.loaders import WeightsNotFoundError, load_converted

            self._params, self._cfg = load_converted(
                Path(root) / "nmt", nj.NLLBConfig)
            log.info("semantic scorer: NLLB encoder from %s/nmt", root)
        except Exception as e:  # noqa: BLE001 — scorer stays unavailable
            log.info("semantic scorer unavailable: %s", e)

    def available(self) -> bool:
        self._try_load()
        return self._params is not None

    @property
    def tokenizer(self):
        if self._tok is None:
            from ..pipeline.tokenizer import load_tokenizer

            # EST_TOKENIZER (SentencePiece/HF dir) when mounted, bytes otherwise
            self._tok = load_tokenizer(os.environ.get("EST_TOKENIZER"))
        return self._tok

    def _token_states(self, texts: List[str]):
        """texts → (states [N, T, D] float32, mask [N, T])."""
        import jax
        import jax.numpy as jnp

        from ..models import nllb as nj

        if "encode" not in self._fns:
            @jax.jit
            def _enc(params, tokens):
                return nj.encode(params, self._cfg, tokens)

            self._fns["encode"] = _enc
        ids = [self.tokenizer.encode(t)[:128] or [self._cfg.eos_token]
               for t in texts]
        width = max(8, max(len(i) for i in ids))
        toks = np.full((len(ids), width), self._cfg.pad_token, np.int32)
        for r, seq in enumerate(ids):
            toks[r, : len(seq)] = np.asarray(seq) % self._cfg.vocab_size
        states = np.asarray(self._fns["encode"](self._params,
                                                jnp.asarray(toks)), np.float32)
        mask = toks != self._cfg.pad_token
        return states, mask

    def embed_sentences(self, texts: List[str]) -> np.ndarray:
        """Mask-mean-pooled, L2-normalised sentence embeddings [N, D]."""
        states, mask = self._token_states(texts)
        pooled = (states * mask[..., None]).sum(1) / np.maximum(
            mask.sum(1, keepdims=True), 1)
        return pooled / np.maximum(
            np.linalg.norm(pooled, axis=-1, keepdims=True), 1e-9)

    def sonar_score(self, a: str, b: str) -> float:
        if not self.available():
            return float("nan")
        e = self.embed_sentences([a, b])
        return float(np.dot(e[0], e[1]))

    def bert_score_f1(self, candidate: str, reference: str) -> float:
        if not self.available():
            return float("nan")
        states, mask = self._token_states([candidate, reference])
        c = states[0][mask[0]]
        r = states[1][mask[1]]
        if not len(c) or not len(r):
            return float("nan")
        c = c / np.maximum(np.linalg.norm(c, axis=-1, keepdims=True), 1e-9)
        r = r / np.maximum(np.linalg.norm(r, axis=-1, keepdims=True), 1e-9)
        sim = c @ r.T                                    # [Tc, Tr]
        precision = float(sim.max(axis=1).mean())
        recall = float(sim.max(axis=0).mean())
        if precision + recall <= 0:
            return 0.0
        return 2 * precision * recall / (precision + recall)


_default_scorer: Optional[SemanticScorer] = None


def default_scorer() -> SemanticScorer:
    global _default_scorer
    if _default_scorer is None:
        _default_scorer = SemanticScorer()
    return _default_scorer
