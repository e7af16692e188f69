"""JaxEngines: the production stage engines backed by models/* on TPU.

Replaces the reference's in-process whisper + transformers calls and HTTP hops
to the CosyVoice container (SURVEY.md §3.1 hot path) with resident jit-compiled
graphs. Each engine:

- compiles ONE program per shape bucket (audio length and decode budget are
  bucketed so arbitrary-length inputs hit a handful of compiled graphs);
- accepts weights via the models' ``from_hf_state_dict`` converters (local
  checkpoints) or random init (structure/perf mode when no weights exist —
  the reference repo ships none, SURVEY.md repo-health notes).
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import os
from typing import Any, Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..models import cosyvoice as cvm
from ..models import nllb as njm
from ..models import whisper as wjm
from ..models.common import cast_floats, host_init
from ..ops.pallas_mel import whisper_log_mel_pallas
from .tokenizer import ByteTokenizer, Tokenizer

log = logging.getLogger(__name__)

AUDIO_BUCKETS_S = (5, 10, 30)           # ASR chunk buckets (whisper max 30 s)
TEXT_BUCKETS = (16, 32, 64, 128, 256)


def _bucket_capped(n: int, buckets) -> int:
    """Smallest bucket ≥ n, CLAMPED to the top bucket — only for budgets with
    an intentional ceiling (TTS decode length from the clipped duration
    estimate; text ids pre-capped to TEXT_BUCKETS[-1] by _text_ids). Anything
    that must never silently truncate uses core.buckets.bucket_size, which
    keeps doubling above the top bucket instead."""
    from ..core.buckets import bucket_size

    return min(bucket_size(n, buckets), buckets[-1])


def _fit_vocab(ids, vocab_size: int, weightless: bool, label: str) -> np.ndarray:
    """THE wrap-or-raise tokenizer-id policy, shared by every engine:
    weightless mode may wrap ids into the toy vocab; a real config must never
    silently corrupt tokenizer output (VERDICT round-1 weak #3)."""
    arr = np.asarray(ids, np.int32)
    if weightless:
        return arr % vocab_size
    if arr.size and int(arr.max()) >= vocab_size:
        raise ValueError(
            f"{label} token id {int(arr.max())} out of range for vocab "
            f"{vocab_size} — tokenizer/config mismatch"
        )
    return arr


def _dp_shard(mesh, *arrays):
    """Commit host batch arrays with dim 0 sharded over the mesh's dp axis.

    Data-parallel serving: under a (dp, tp) mesh the micro-batched dispatch
    splits its batch rows across dp groups while each group runs the
    TP-sharded program — batch-8 on a dp=4×tp=2 pod slice puts 2 rows on
    each 2-chip TP group, so throughput scales with the slice instead of
    one chip owning the whole batch (SURVEY.md §2.19; the reference pins
    one request per GPU process, Docker/cosyvoice_api.py:96). Rows not
    divisible by dp fall back to the default (replicated) placement —
    correctness never depends on the fast path.
    """
    if mesh is None:
        return arrays if len(arrays) > 1 else arrays[0]
    from ..parallel.mesh import DP_AXIS, data_sharding

    dp = mesh.shape.get(DP_AXIS, 1)
    out = []
    for a in arrays:
        if dp > 1 and a.ndim >= 1 and a.shape[0] % dp == 0:
            out.append(jax.device_put(a, data_sharding(mesh, a.ndim)))
        else:
            out.append(a)
    return tuple(out) if len(out) > 1 else out[0]


class JaxWhisperAsr:
    """ASR engine: fused Pallas mel → Whisper greedy decode, bucketed context
    chunking, cross-attention DTW word timestamps (whisper find_alignment
    parity — models/whisper.greedy_decode_with_alignment + dtw_token_times)."""

    def __init__(
        self,
        cfg: wjm.WhisperConfig = None,
        params=None,
        tokenizer: Optional[Tokenizer] = None,
        *,
        dtype=jnp.bfloat16,
        max_new_tokens: int = 224,
        quantize: bool = False,
        context_buckets: tuple = (30,),
        mesh=None,
        temperatures: Optional[tuple] = None,
        compression_ratio_threshold: float = 2.4,
        logprob_threshold: float = -1.0,
        no_speech_threshold: float = 0.6,
        suppress_tokens: tuple = (),
        suppress_blank: bool = True,
        condition_on_previous_text: bool = True,
    ):
        """``context_buckets``: encoder context windows in seconds (even
        values, ascending, max 30). Whisper always encodes a 30 s window;
        for a 10 s utterance that wastes 3× encoder FLOPs and 3× cross-K/V
        HBM reads per decode step. Buckets restrict the window to the
        utterance's length bucket — (10, 20, 30) cuts short-utterance ASR
        latency ~2-3× at a small accuracy cost on real weights (the
        faster-whisper-style context trick); the default (30,) is exact
        whisper semantics. Host-side padding to the bucket also guarantees
        only len(context_buckets) compiled programs regardless of utterance
        length (previously every new length recompiled)."""
        self.cfg = cfg or wjm.WhisperConfig.base()
        self.weightless = params is None
        if params is None:
            log.warning("JaxWhisperAsr: random weights (no checkpoint supplied)")
            params = host_init(wjm.init_whisper, 0, self.cfg)
        self.params = cast_floats(params, dtype)
        self.quantized = quantize
        if quantize:
            self.params = wjm.quantize_whisper_decoder(self.params)
        self.mesh = mesh
        if mesh is not None:
            # tensor-parallel serving: params placed by the Megatron-style
            # rules; inference programs inherit layouts from the committed
            # arrays and XLA inserts one all-reduce per block
            from ..parallel.mesh import TP_AXIS
            from ..parallel.partition import logical_to_sharding

            self.params = logical_to_sharding(
                self.params, mesh, wjm.whisper_partition_rules(TP_AXIS))
        self.tokenizer = tokenizer or ByteTokenizer()
        self.max_new_tokens = max_new_tokens
        self.dtype = dtype
        buckets = tuple(sorted(int(b) for b in context_buckets))
        if not buckets or buckets[-1] > 30 or any(b % 2 or b <= 0 for b in buckets):
            raise ValueError(
                f"context_buckets must be even seconds in (0, 30], got {context_buckets}")
        self.context_buckets = buckets
        # whisper.transcribe fallback gates (openai-whisper defaults);
        # temperatures=(0.0,) disables fallback. Random weights always fail
        # the logprob gate (avg ~ -log vocab), which would run every rung on
        # every request — weightless mode therefore defaults to greedy-only
        if temperatures is None:
            temperatures = (0.0,) if self.weightless else (0.0, 0.2, 0.4, 0.6, 0.8, 1.0)
        self.temperatures = tuple(temperatures) or (0.0,)
        self.compression_ratio_threshold = compression_ratio_threshold
        self.logprob_threshold = logprob_threshold
        self.no_speech_threshold = no_speech_threshold
        # whisper SuppressBlank: space + EOT suppressed on the first
        # generated token (prevents empty-leading transcripts); SuppressTokens
        # takes the deployment's non-speech id list
        suppress_first: tuple = ()
        if suppress_blank:
            # self.tokenizer, not the constructor arg: the default
            # ByteTokenizer must also contribute its space id(s), or the
            # decoder can emit the leading blank whisper suppresses
            space_ids = tuple(self.tokenizer.encode(" "))
            suppress_first = tuple(space_ids) + (self.cfg.eos_token,)
        self._suppress = (tuple(suppress_tokens), suppress_first)
        # whisper condition_on_previous_text: each chunk's prompt carries
        # [<|startofprev|>] + previous tokens. Static shapes via TRUNCATE-to-
        # bucket (no padding): context lengths in PREV_CTX_BUCKETS, so at most
        # len(buckets) x len(ctx_buckets) compiled programs
        self.condition_on_previous_text = condition_on_previous_text
        # mutable per-instance state created HERE, not lazily at use sites:
        # lazy hasattr/getattr init widens the read-modify-write race window
        # under the threaded serving batcher
        self._seed = 0
        self._prompt_cache: Dict[str, Any] = {}
        self.PREV_CTX_BUCKETS = (8, 16, 32)

        @jax.jit
        def _transcribe(params, audio, prompt, temperature, seed, sot_index):
            # chunk window = the (static) padded length of this bucket;
            # temperature is TRACED so every fallback rung reuses this
            # program; sot_index (traced) marks where <|startoftranscript|>
            # sits in conditioned prompts so the no-speech gate reads the
            # right step (openai-whisper sot_index semantics)
            mel = whisper_log_mel_pallas(
                audio, chunk_samples=audio.shape[-1]).astype(dtype)
            return wjm.decode_with_alignment(
                params, self.cfg, mel[None], prompt,
                max_new_tokens=max_new_tokens, temperature=temperature,
                key=jax.random.fold_in(jax.random.PRNGKey(7), seed),
                suppress_tokens=self._suppress[0],
                suppress_first_tokens=self._suppress[1],
                sot_index=sot_index,
            )

        self._fn = _transcribe

        @jax.jit
        def _transcribe_b(params, audio, prompt):
            """Batched context chunks [N, samples] (zero-padded) in one
            dispatch, with the SAME decode safeguards as the single path
            (token suppression, sot-indexed no-speech prob, per-row logprobs
            for host-side gating). Batch prompts are always the bare 4-token
            row, so SOT sits at index 0. Uses the XLA mel (batch-native); the
            fused Pallas mel is per-row and its win (~7 ms/30 s) is noise
            next to batched decode."""
            from ..ops import whisper_log_mel

            mel = whisper_log_mel(audio, chunk_samples=audio.shape[-1]).astype(dtype)
            return wjm.decode_with_alignment(
                params, self.cfg, mel, prompt,
                max_new_tokens=max_new_tokens,
                suppress_tokens=self._suppress[0],
                suppress_first_tokens=self._suppress[1],
                sot_index=0,
            )

        self._fn_b = _transcribe_b

        @jax.jit
        def _detect(params, audio):
            mel = whisper_log_mel_pallas(
                audio, chunk_samples=audio.shape[-1]).astype(dtype)
            ids, probs = wjm.detect_language(params, self.cfg, mel[None])
            return ids[0], probs[0]

        self._detect_fn = _detect

        @jax.jit
        def _detect_b(params, audio):
            """Batched language id: [N, samples] → one dispatch (the batched
            path must not pay N serial detect round-trips)."""
            from ..ops import whisper_log_mel

            mel = whisper_log_mel(audio, chunk_samples=audio.shape[-1]).astype(dtype)
            return wjm.detect_language(params, self.cfg, mel)

        self._detect_b_fn = _detect_b

    def _prompt_row(self, language: Optional[str]) -> List[int]:
        from .languages import whisper_lang_index

        try:
            idx = whisper_lang_index(language or "eng")
        except (KeyError, ValueError):
            idx = whisper_lang_index("eng")
        lang_tok = self.cfg.lang_token_start + idx
        return [self.cfg.bos_token, lang_tok, self.cfg.task_transcribe, self.cfg.no_timestamps]

    @property
    def _special_floor(self) -> int:
        """Content-token ceiling: whisper places every special token at the
        top of the vocab (<|endoftext|> 50257 and up); ids at/above the lowest
        special are dropped from transcripts (skip_special_tokens parity)."""
        return min(self.cfg.eos_token, self.cfg.bos_token, self.cfg.lang_token_start)

    def _decode_chunk_host(
        self, tokens: np.ndarray, aligns: np.ndarray, p_len: int,
        chunk_offset: float, chunk_seconds: float,
        window_seconds: Optional[float] = None,
    ) -> tuple:
        """Host post-pass for one decoded chunk: DTW token times over the
        cross-attention alignment (whisper find_alignment parity) + word
        splitting. ``window_seconds`` is the encoder-context span the
        alignment's frame axis covers (= the bucket size; the audio may fill
        only ``chunk_seconds`` of it). Returns (text, words, kept_token_ids)
        — the kept ids feed previous-text conditioning in ``transcribe``."""
        gen = tokens[p_len:]
        keep = [(i, int(t)) for i, t in enumerate(gen)
                if t != self.cfg.eos_token and t < self._special_floor]
        if not keep:
            return "", [], []
        token_aligns = aligns[p_len:][[i for i, _ in keep]]
        token_times = wjm.dtw_token_times(
            token_aligns, len(keep), window_seconds or chunk_seconds)
        token_times = np.minimum(token_times, chunk_seconds)
        chunk_text = self.tokenizer.decode([t for _, t in keep]).strip()
        words: List[Dict[str, Any]] = []
        current: List[int] = []
        word_start = float(token_times[0]) if len(token_times) else 0.0
        for (i, tok), t_sec in zip(keep, token_times):
            piece = self.tokenizer.decode([tok])
            # word boundary = whitespace piece OR a piece that BEGINS with
            # whitespace (byte-level BPE emits " hello"-style tokens; whisper
            # split_tokens_on_spaces semantics) — byte tokenizers hit the
            # pure-whitespace branch, subword tokenizers the prefix one
            boundary = piece == "" or piece.isspace() or piece[:1].isspace()
            if boundary and current:
                words.append({
                    "word": self.tokenizer.decode(current).strip(),
                    "start": round(chunk_offset + word_start, 3),
                    "end": round(chunk_offset + float(t_sec), 3),
                })
                current = []
                word_start = float(t_sec)
            if piece != "" and not piece.isspace():
                if not current:
                    word_start = float(t_sec)
                current.append(tok)
        if current:
            words.append({
                "word": self.tokenizer.decode(current).strip(),
                "start": round(chunk_offset + word_start, 3),
                "end": round(chunk_offset + chunk_seconds, 3),
            })
        return chunk_text, [w for w in words if w["word"]], [t for _, t in keep]

    def detect_language(self, audio_16k: np.ndarray) -> str:
        """Identify the spoken language from the first 30 s (whisper
        detect_language parity; the reference reads the detected language out
        of the ASR result, cascaded_backend.py:188)."""
        from .languages import whisper_token_to_app

        x = np.asarray(audio_16k, np.float32).reshape(-1)[: 16_000 * 30]
        padded, _ = self._pad_to_bucket(x)
        tok, _ = self._detect_fn(self.params, jnp.asarray(padded))
        # normalize to the standard 50259-based block before table lookup so
        # non-standard vocab layouts (tiny parity models) resolve correctly
        return whisper_token_to_app(int(tok) - self.cfg.lang_token_start + 50_259)

    def _pad_to_bucket(self, seg: np.ndarray) -> tuple:
        """Host-pad a chunk to its context bucket → (padded, bucket_seconds).
        Static per-bucket shapes: the jitted path compiles once per bucket."""
        bucket_s = next(
            (b for b in self.context_buckets if len(seg) <= 16_000 * b),
            self.context_buckets[-1])
        padded = np.zeros(16_000 * bucket_s, np.float32)
        padded[: len(seg)] = seg[: 16_000 * bucket_s]
        return padded, bucket_s

    def _gated_chunk(self, tokens, aligns, p_len, offset_s, chunk_s, bucket_s,
                     *, avg_logprob, no_speech_prob, seg, prompt_row):
        """Apply the single-path decode gates to one batch-decoded chunk:
        no-speech suppression, then compression/logprob gating with the
        failing row re-run through the temperature ladder (the greedy rung
        already ran in the batch dispatch, so the ladder starts above it)."""
        import zlib

        text, words, _ = self._decode_chunk_host(
            tokens, aligns, p_len, offset_s, chunk_s, window_seconds=bucket_s)
        if (no_speech_prob > self.no_speech_threshold
                and avg_logprob < self.logprob_threshold):
            log.info("no-speech gate (batch): chunk at %.1fs suppressed "
                     "(p=%.2f, avg_logprob=%.2f)", offset_s, no_speech_prob,
                     avg_logprob)
            return "", []
        raw = text.encode("utf-8")
        compression_ratio = (len(raw) / len(zlib.compress(raw))) if raw else 0.0
        if (compression_ratio <= self.compression_ratio_threshold
                and avg_logprob >= self.logprob_threshold):
            return text, words
        if len(self.temperatures) <= 1:
            return text, words   # no higher rung to try
        log.info("temperature fallback (batch): chunk at %.1fs rejected "
                 "(compression %.2f, avg_logprob %.2f)", offset_s,
                 compression_ratio, avg_logprob)
        padded, pb = self._pad_to_bucket(np.asarray(seg, np.float32))
        prompt = jnp.asarray([prompt_row], jnp.int32)
        t, w, _, _ = self._decode_chunk_fallback(
            padded, prompt, len(prompt_row), offset_s, chunk_s, pb,
            temperatures=self.temperatures[1:])
        return t, w

    def _decode_chunk_fallback(self, padded, prompt, p_len,
                               offset_s, chunk_s, bucket_s,
                               prompt_bare=None, p_len_bare=None,
                               temperatures=None):
        """whisper.transcribe's temperature-fallback ladder (the decoding
        behavior the reference gets from openai-whisper,
        cascaded_backend.py:158): decode at each temperature in
        ``self.temperatures`` until the compression-ratio and avg-logprob
        gates pass; the last rung is accepted unconditionally.
        ``temperatures`` overrides the ladder (the batch path starts above
        the greedy rung its dispatch already ran)."""
        import zlib

        temperatures = (self.temperatures if temperatures is None
                        else temperatures)
        for i, temp in enumerate(temperatures):
            # whisper drops previous-text conditioning for rungs above 0.5
            # (transcribe: prompt reset when temperature > 0.5)
            use_prompt, use_plen = (
                (prompt_bare, p_len_bare)
                if temp > 0.5 and prompt_bare is not None else (prompt, p_len))
            self._seed += 1
            # the prompt row always ends [sot, lang, task, no_timestamps]
            # (_prompt_row), so SOT sits 4 back from the prompt end
            tokens_a, aligns, slp, ngen, nsp = self._fn(
                self.params, jnp.asarray(padded), use_prompt,
                jnp.float32(temp), jnp.uint32(self._seed),
                jnp.int32(use_plen - 4))
            tokens_h, aligns_h, slp_h, ngen_h, nsp_h = jax.device_get(
                (tokens_a, aligns, slp, ngen, nsp))
            text, words, kept_ids = self._decode_chunk_host(
                tokens_h[0], aligns_h[0], use_plen, offset_s, chunk_s,
                window_seconds=bucket_s)
            # whisper divides by len(tokens)+1 where tokens EXCLUDES the EOT
            # step; ngen already counts the EOT-emitting step, so it is the
            # correct divisor on its own (ADVICE r2)
            avg_logprob = float(slp_h[0]) / max(int(ngen_h[0]), 1)
            # whisper no-speech gate: silent chunks yield no text instead of
            # hallucinations (transcribe no_speech_threshold=0.6 semantics:
            # suppress when P(<|nospeech|>) is high AND confidence is low)
            if (float(nsp_h[0]) > self.no_speech_threshold
                    and avg_logprob < self.logprob_threshold):
                log.info("no-speech gate: chunk at %.1fs suppressed "
                         "(p=%.2f, avg_logprob=%.2f)", offset_s,
                         float(nsp_h[0]), avg_logprob)
                return "", [], [], temp
            if i == len(temperatures) - 1:
                return text, words, kept_ids, temp
            raw = text.encode("utf-8")
            compression_ratio = (len(raw) / len(zlib.compress(raw))) if raw else 0.0
            if (compression_ratio <= self.compression_ratio_threshold
                    and avg_logprob >= self.logprob_threshold):
                return text, words, kept_ids, temp
            log.info("temperature fallback: t=%.1f rejected (compression %.2f, "
                     "avg_logprob %.2f)", temp, compression_ratio, avg_logprob)
        return text, words, kept_ids, temp

    def transcribe_streaming(self, audio_16k: np.ndarray,
                             language: Optional[str] = None):
        """Per-window streaming ASR: yields one dict per context window AS IT
        DECODES ({"text", "words", "start", "end", "language"}), preserving
        whisper's sequential condition_on_previous_text semantics exactly —
        ``transcribe`` is this generator plus aggregation, so the streaming
        and offline paths cannot diverge. Lets a consumer pipeline downstream
        work (NMT/TTS) against windows instead of the whole utterance
        (time-to-first-result O(window), WhisperFlow-style serving)."""
        x = np.asarray(audio_16k, np.float32).reshape(-1)
        if language is None:
            language = self.detect_language(x)
        prompt = self._prompt_cache.get(language)
        if prompt is None:  # cache the tiny device array (upload = a full
            # relay round-trip per request otherwise)
            prompt = jnp.asarray([self._prompt_row(language)], jnp.int32)
            self._prompt_cache[language] = prompt
        chunk = 16_000 * self.context_buckets[-1]
        p_len = int(prompt.shape[1])
        base_row = self._prompt_row(language)
        prev_ids: List[int] = []
        for start in range(0, max(len(x), 1), chunk):
            seg = x[start:start + chunk]
            padded, bucket_s = self._pad_to_bucket(seg)
            # whisper condition_on_previous_text: [<|startofprev|>] + previous
            # tokens (truncated to a fixed bucket — static shapes) + base row
            ctx_bucket = 0
            if self.condition_on_previous_text and prev_ids:
                ctx_bucket = max((b for b in self.PREV_CTX_BUCKETS
                                  if b <= len(prev_ids)), default=0)
            if ctx_bucket:
                row = ([self.cfg.sop_token] + prev_ids[-ctx_bucket:] + base_row)
                prompt_c = jnp.asarray([row], jnp.int32)
                chunk_text, chunk_words, kept, used_t = self._decode_chunk_fallback(
                    padded, prompt_c, len(row),
                    start / 16_000.0, len(seg) / 16_000.0, bucket_s,
                    prompt_bare=prompt, p_len_bare=p_len)
            else:
                chunk_text, chunk_words, kept, used_t = self._decode_chunk_fallback(
                    padded, prompt, p_len,
                    start / 16_000.0, len(seg) / 16_000.0, bucket_s)
            # whisper resets the context after a high-temperature fallback
            prev_ids = [] if used_t > 0.5 else prev_ids + kept
            yield {
                "text": chunk_text,
                "words": chunk_words,
                "start": start / 16_000.0,
                "end": (start + len(seg)) / 16_000.0,
                "language": language or "eng",
            }

    def transcribe(self, audio_16k: np.ndarray, language: Optional[str] = None) -> Dict[str, Any]:
        texts: List[str] = []
        words: List[Dict[str, Any]] = []
        language_out = language or "eng"
        for seg in self.transcribe_streaming(audio_16k, language=language):
            if seg["text"]:
                texts.append(seg["text"])
            words.extend(seg["words"])
            language_out = seg["language"]
        return {"text": " ".join(texts), "language": language_out, "words": words}

    def transcribe_batch(self, requests: List[Dict[str, Any]]) -> List[Dict[str, Any]]:
        """Batched ASR: every 30 s chunk of every request rides ONE dispatch.

        ``requests`` entries: {"audio_16k": array, "language": str|None}.
        Chunks are flattened across requests (a 70 s file contributes 3 rows),
        zero-padded to the 30 s window, and the row count padded to a bucket —
        so concurrent callers of any duration mix share compiled graphs.

        Decode-safeguard parity with :meth:`transcribe`: token suppression and
        the no-speech gate apply per row, and rows failing the compression/
        logprob gates re-run through the single-path temperature ladder
        (skipping the greedy rung this dispatch already ran). The one
        deliberate divergence: chunks decode independently, so previous-text
        conditioning does not thread across a request's chunks (serializing
        chunks would defeat the batching).
        """
        if not requests:
            return []
        from ..core.buckets import bucket_batch

        chunk = 16_000 * self.context_buckets[-1]
        langs = [r.get("language") for r in requests]
        # language id for language-less requests: ONE batched dispatch, not
        # N serial detect round-trips
        need = [i for i, l in enumerate(langs) if l is None]
        if need:
            from .languages import whisper_token_to_app

            # pad to a batch bucket like every other dispatch in this file —
            # a raw len(need)-row program would recompile the whole encoder
            # per distinct count of language-less requests
            det = np.zeros((bucket_batch(len(need)), 16_000 * 30), np.float32)
            for j, i in enumerate(need):
                x = np.asarray(requests[i]["audio_16k"], np.float32).reshape(-1)
                seg = x[: 16_000 * 30]
                det[j, : len(seg)] = seg
            ids, _ = jax.device_get(self._detect_b_fn(self.params, det))
            for j, i in enumerate(need):
                langs[i] = whisper_token_to_app(
                    int(ids[j]) - self.cfg.lang_token_start + 50_259)

        specs = []   # (request index, chunk offset seconds, chunk seconds)
        rows: List[np.ndarray] = []
        prompts: List[List[int]] = []
        for i, r in enumerate(requests):
            x = np.asarray(r["audio_16k"], np.float32).reshape(-1)
            prow = self._prompt_row(langs[i])
            for start in range(0, max(len(x), 1), chunk):
                seg = x[start:start + chunk]
                rows.append(seg)
                prompts.append(prow)
                specs.append((i, start / 16_000.0, len(seg) / 16_000.0))
        # one shared context bucket per dispatch (the longest row's bucket)
        window_s = next(
            (b for b in self.context_buckets
             if max(len(r) for r in rows) <= 16_000 * b),
            self.context_buckets[-1])
        from ..core.buckets import row_slices

        results = [{"text": [], "words": []} for _ in requests]
        # bounded dispatches: an unbounded burst (a 1 h podcast alone is 120
        # chunk rows) must not allocate one arbitrarily large device batch
        for lo, hi in row_slices(len(rows), 32):
            nb = bucket_batch(hi - lo, (1, 2, 4, 8, 16, 32))
            audio = np.zeros((nb, 16_000 * window_s), np.float32)
            for j, rrow in enumerate(rows[lo:hi]):
                audio[j, : len(rrow)] = rrow[: 16_000 * window_s]
            prompt = np.tile(np.asarray(prompts[lo], np.int32), (nb, 1))
            prompt[: hi - lo] = np.asarray(prompts[lo:hi], np.int32)
            audio, prompt = _dp_shard(self.mesh, audio, prompt)
            out = self._fn_b(self.params, audio, prompt)
            tokens_np, aligns_np, slp_np, ngen_np, nsp_np = jax.device_get(out)
            p_len = prompt.shape[1]
            for row, (ri, offset, seconds) in enumerate(specs[lo:hi]):
                t, w = self._gated_chunk(
                    tokens_np[row], aligns_np[row], p_len, offset, seconds,
                    window_s,
                    avg_logprob=float(slp_np[row]) / max(int(ngen_np[row]), 1),
                    no_speech_prob=float(nsp_np[row]),
                    seg=rows[lo + row], prompt_row=prompts[lo + row])
                if t:
                    results[ri]["text"].append(t)
                results[ri]["words"].extend(w)
        return [
            {
                "text": " ".join(res["text"]),
                "language": langs[i] or "eng",
                "words": res["words"],
            }
            for i, res in enumerate(results)
        ]


class JaxNllbNmt:
    """NMT engine: NLLB generate with bucketed source lengths."""

    def __init__(
        self,
        cfg: njm.NLLBConfig = None,
        params=None,
        tokenizer: Optional[Tokenizer] = None,
        *,
        lang_code_to_id: Optional[Dict[str, int]] = None,
        dtype=jnp.bfloat16,
        num_beams: int = 1,
        max_new_tokens: int = 200,
        quantize: bool = False,
        mesh=None,
    ):
        self.cfg = cfg or njm.NLLBConfig(
            d_model=512, encoder_layers=6, decoder_layers=6, heads=8,
            ffn_dim=2048, vocab_size=384,
        )
        self.weightless = params is None
        if params is None:
            log.warning("JaxNllbNmt: random weights (no checkpoint supplied)")
            params = host_init(njm.init_nllb, 1, self.cfg)
        self.params = cast_floats(params, dtype)
        self.quantized = quantize
        if quantize:
            self.params = njm.quantize_nllb_decoder(self.params)
        self.mesh = mesh
        if mesh is not None:
            from ..parallel.mesh import TP_AXIS
            from ..parallel.partition import logical_to_sharding

            self.params = logical_to_sharding(
                self.params, mesh, njm.nllb_partition_rules(TP_AXIS))
        self.tokenizer = tokenizer or ByteTokenizer()
        if lang_code_to_id is None and hasattr(self.tokenizer, "token_to_id"):
            # real tokenizer: language tokens resolve through the vocab, the
            # way the reference resolves FLORES codes (cascaded_backend.py:139)
            from .tokenizer import nllb_lang_ids

            lang_code_to_id = nllb_lang_ids(self.tokenizer)
        self.lang_code_to_id = lang_code_to_id or {}
        if not self.lang_code_to_id and self.weightless:
            # stable weightless-mode table (never salted Python hash())
            from .languages import nllb_placeholder_lang_ids

            self.lang_code_to_id = nllb_placeholder_lang_ids(self.cfg.vocab_size)
        self.num_beams = num_beams
        self.max_new_tokens = max_new_tokens

        # forced_bos is a TRACED scalar (it only fills the prompt's second
        # slot — models/nllb.py:261): one compiled program per source bucket
        # regardless of target language. As a static arg, 19 languages × 6
        # buckets would compile ~114 distinct encoder+decoder programs.
        @jax.jit
        def _generate(params, src, forced_bos):
            return njm.generate(
                params, self.cfg, src, forced_bos,
                num_beams=num_beams, max_new_tokens=max_new_tokens,
            )

        self._fn = _generate

    def _lang_id(self, code: str) -> int:
        from .languages import NLLB_LANGUAGES

        for key in (code, NLLB_LANGUAGES.get(code, "")):
            if key in self.lang_code_to_id:
                return self.lang_code_to_id[key]
        raise KeyError(
            f"language {code!r} has no token id — supply lang_code_to_id or a "
            "tokenizer whose vocab contains the FLORES language tokens"
        )

    def _fit_ids(self, ids: List[int]) -> np.ndarray:
        return _fit_vocab(ids, self.cfg.vocab_size, self.weightless, "NMT")

    def _src_bucket(self, n: int) -> int:
        """Source width: smallest bucket ≥ n, doubling above the top bucket
        (core.buckets policy) so transcripts longer than TEXT_BUCKETS[-1]
        ride a wider compiled program instead of crashing the row-assign;
        clamped to the encoder's positional capacity."""
        from ..core.buckets import bucket_size

        return min(bucket_size(n, TEXT_BUCKETS), self.cfg.max_positions)

    def _encode_src(self, text: str, source_lang: str) -> List[int]:
        """NLLB source layout: ``[src_lang] tokens … [eos]`` (HF NllbTokenizer
        non-legacy convention the reference's generate call assumes)."""
        ids = self.tokenizer.encode(text)[: self.cfg.max_positions - 2]
        try:
            return [self._lang_id(source_lang)] + ids + [self.cfg.eos_token]
        except KeyError:
            return ids + [self.cfg.eos_token]

    def translate(self, text: str, source_lang: str, target_lang: str) -> str:
        src = self._encode_src(text, source_lang)
        bucket = self._src_bucket(len(src))
        padded = np.full((1, bucket), self.cfg.pad_token, np.int32)
        padded[0, : len(src)] = self._fit_ids(src)
        out = np.asarray(self._fn(self.params, jnp.asarray(padded), self._lang_id(target_lang)))[0]
        content = [int(t) for t in out[2:] if t not in (self.cfg.eos_token, self.cfg.pad_token)]
        return self.tokenizer.decode(content)

    def translate_batch(self, requests: List[Dict[str, Any]]) -> List[str]:
        """Batched NMT: requests sharing a target language ride one generate
        dispatch (forced-BOS is a static arg, so the batch is grouped by
        target). Entries: {"text", "source_lang", "target_lang"}."""
        if not requests:
            return []
        if len(requests) > 16:   # bounded dispatches for oversized bursts
            from ..core.buckets import row_slices
            out: List[str] = []
            for lo, hi in row_slices(len(requests), 16):
                out.extend(self.translate_batch(requests[lo:hi]))
            return out
        from ..core.buckets import bucket_batch

        results: List[Optional[str]] = [None] * len(requests)
        by_target: Dict[int, List[int]] = {}
        for i, r in enumerate(requests):
            by_target.setdefault(self._lang_id(r["target_lang"]), []).append(i)
        for forced_bos, idxs in by_target.items():
            srcs = [
                self._encode_src(requests[i]["text"], requests[i]["source_lang"])
                for i in idxs
            ]
            bucket = self._src_bucket(max(len(s) for s in srcs))
            nb = bucket_batch(len(idxs))
            padded = np.full((nb, bucket), self.cfg.pad_token, np.int32)
            for row, s in enumerate(srcs):
                padded[row, : len(s)] = self._fit_ids(s)
            out = np.asarray(
                self._fn(self.params, _dp_shard(self.mesh, padded), forced_bos))
            for row, i in enumerate(idxs):
                content = [int(t) for t in out[row, 2:]
                           if t not in (self.cfg.eos_token, self.cfg.pad_token)]
                results[i] = self.tokenizer.decode(content)
        return results  # type: ignore[return-value]


def _reconcile_mtp(cfg_mtp: int, forced: int, params) -> int:
    """Decode width = the MTP width the params can actually serve.

    One rule shared by the native and official-checkpoint TTS paths: the
    requested width (a forced override wins over the config; 0 = unset,
    defer to the config — and ``forced=1`` is an EXPLICIT request to pin
    single-token decode even on an MTP-capable checkpoint) is honored only
    up to the number of heads trained into the params — a wider width would
    index past the heads list at decode time, a params set with no heads can
    only decode single-token. ``params=None`` (random init to come) honors
    the request as-is since the heads will be initialized at that width.
    """
    wanted = forced if forced >= 1 else cfg_mtp
    if wanted <= 1:
        return 1
    if params is None:
        return wanted
    heads = params.get("lm", {}).get("mtp_heads")
    have = (len(heads) + 1) if heads else 1
    if have == 1:
        log.warning(
            "mtp=%d requested but the params carry no mtp_heads — "
            "falling back to single-token decode", wanted)
    elif have != wanted:
        log.warning(
            "mtp=%d requested but the checkpoint carries %d MTP head(s) — "
            "using mtp=%d", wanted, have - 1, have)
    return have


def _reconcile_spec(forced: bool, cfg_spec: bool, width: int) -> bool:
    """Lossless speculative decode is requested by the override OR the config
    (like mtp, an unset override defers to the config) and is only honorable
    at an effective MTP width > 1 — downgrading must be LOUD, or an operator
    setting EST_ENGINES__TTS_SPEC=1 on a headless checkpoint silently serves
    single-token decode believing spec is active."""
    wanted = forced or cfg_spec
    if wanted and width <= 1:
        log.warning(
            "tts_spec requested but the effective MTP width is 1 (no trained "
            "heads / no tts_mtp) — serving standard single-token decode")
        return False
    return wanted


class JaxCosyVoiceTts:
    """TTS engine: CosyVoice synthesize with speaker conditioning from the
    reference audio (kaldi-fbank prompt mel + ECAPA speaker embedding)."""

    sample_rate = 24_000

    def __init__(
        self,
        cfg: cvm.CosyVoiceConfig = None,
        params=None,
        tokenizer: Optional[Tokenizer] = None,
        *,
        dtype=jnp.bfloat16,
        seconds_per_char: float = 0.08,
        mesh=None,
        quantize: bool = False,
        official=None,
        mtp: int = 0,
        spec: bool = False,
        ecapa_weights=None,
        speech_tokenizer_weights=None,
    ):
        """``mesh``: optional ``jax.sharding.Mesh`` — the speech-LM params are
        placed by the tensor-parallel partition rules (models/cosyvoice.py
        ``speech_lm_partition_rules``) and inference programs pick the layout
        up from the committed arrays; everything else replicates.
        ``quantize``: weight-only int8 for the speech-LM decode path.
        ``official``: optional ``(params, OfficialTtsConfig)`` — converted
        llm.pt/flow.pt/hift.pt triple; synthesis then runs the official
        CosyVoice2 chain (models/cosyvoice_official.synthesize_official)
        instead of the TPU-native flow/vocoder.
        ``mtp``: multi-token-prediction decode width. 0 = whatever the
        config/checkpoint carries (an SFT-exported LM with trained MTP heads
        decodes K tokens per backbone pass automatically). K>1 forces the
        width — only honored when the params will actually contain the heads
        (random init, or a checkpoint trained with cfg.mtp == K); a
        checkpoint without heads downgrades to single-token with a warning
        instead of failing the whole server.
        ``spec``: lossless speculative decoding — B=1 requests verify the MTP
        drafts against the true-context sampler (models/cosyvoice.py
        generate_speech_tokens_spec), emitting the single-token sampler's
        stream while amortizing the weight stream over up to K positions per
        pass. False defers to the config's ``spec_decode`` (like ``mtp=0``);
        requesting it without MTP heads downgrades to single-token decode
        with a LOUD warning (_reconcile_spec). Batched requests keep the
        accept-all MTP path.
        ``ecapa_weights`` / ``speech_tokenizer_weights``: optional
        ``(params, cfg)`` for the voice-prompt CONDITIONING models (ECAPA
        x-vector, FSQ speech tokenizer). Without them conditioning runs on
        random init — structurally correct but carrying no speaker identity
        — so loaded main weights with random conditioning are surfaced via
        ``conditioning_weightless`` (decode_info tags it) instead of
        silently corrupting cloned output."""
        from ..models import ecapa, qwen2 as q2

        self.official = official
        if official is not None:
            oparams, ocfg = official
            # MTP width is a property of the trained heads: honor the
            # checkpoint, never a mismatched config or override.
            want = _reconcile_mtp(ocfg.lm.mtp, mtp, oparams)
            want_spec = _reconcile_spec(spec, ocfg.lm.spec_decode, want)
            if want != ocfg.lm.mtp or want_spec != ocfg.lm.spec_decode:
                ocfg = dataclasses.replace(
                    ocfg, lm=dataclasses.replace(
                        ocfg.lm, mtp=want, spec_decode=want_spec))
            self.official_cfg = ocfg
            # config VIEW for the shared conditioning/bucketing code paths
            # (spk_embed_dim / n_mels / text_vocab / samples-per-token)
            self.cfg = cvm.CosyVoiceConfig(
                lm=ocfg.lm,
                flow=cvm.FlowConfig(
                    token_vocab=ocfg.flow.vocab_size + 3,
                    n_mels=ocfg.flow.output_size,
                    spk_embed_dim=ocfg.flow.spk_embed_dim,
                    token_mel_ratio=ocfg.flow.token_mel_ratio),
            )
            params = oparams
            self.weightless = False
        else:
            self.cfg = cfg or cvm.CosyVoiceConfig(
                lm=cvm.SpeechLMConfig(
                    backbone=q2.Qwen2Config(hidden=256, layers=4, heads=8, kv_heads=2,
                                            ffn_dim=1024, max_positions=2048),
                    text_vocab=384, speech_token_size=512),
                flow=cvm.FlowConfig(token_vocab=515, dim=256, layers=4, heads=8),
                vocoder=cvm.VocoderConfig(base_channels=256),
            )
            want = _reconcile_mtp(self.cfg.lm.mtp, mtp, params)
            want_spec = _reconcile_spec(spec, self.cfg.lm.spec_decode, want)
            if want != self.cfg.lm.mtp or want_spec != self.cfg.lm.spec_decode:
                self.cfg = dataclasses.replace(
                    self.cfg, lm=dataclasses.replace(
                        self.cfg.lm, mtp=want, spec_decode=want_spec))
            self.weightless = params is None
            if params is None:
                log.warning("JaxCosyVoiceTts: random weights (no checkpoint supplied)")
                params = host_init(cvm.init_cosyvoice, 2, self.cfg)
        self.params = cast_floats(params, dtype)
        self.quantized = quantize
        if quantize:
            self.params = dict(self.params)
            self.params["lm"] = cvm.quantize_speech_lm(self.params["lm"])
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.mesh import TP_AXIS
            from ..parallel.partition import logical_to_sharding

            repl = NamedSharding(mesh, P())
            self.params = {
                "lm": logical_to_sharding(
                    self.params["lm"], mesh, cvm.speech_lm_partition_rules(TP_AXIS)),
                **{k: jax.device_put(self.params[k], repl)
                   for k in self.params if k != "lm"},
            }
        self.tokenizer = tokenizer or ByteTokenizer()
        self.seconds_per_char = seconds_per_char
        self.dtype = dtype
        if ecapa_weights is not None:
            self._ecapa, self._ecapa_cfg = ecapa_weights
        else:
            self._ecapa_cfg = ecapa.EcapaConfig(channels=128, bottleneck=64, attn_channels=64)
            self._ecapa = host_init(ecapa.init_ecapa, 3, self._ecapa_cfg)
        # the S3-style FSQ speech tokenizer produces prompt speech tokens
        from ..models import speech_tokenizer as st

        if speech_tokenizer_weights is not None:
            self._st, self._st_cfg = speech_tokenizer_weights
        else:
            self._st_cfg = st.SpeechTokenizerConfig(dim=128, layers=2, heads=4)
            self._st = host_init(st.init_speech_tokenizer, 4, self._st_cfg)
        # loaded MAIN weights + random CONDITIONING is the dangerous quadrant:
        # cloned output silently bears no relation to the reference voice
        self.conditioning_weightless = ecapa_weights is None
        if not self.weightless and self.conditioning_weightless:
            log.warning(
                "JaxCosyVoiceTts: main TTS weights are loaded but the ECAPA "
                "conditioning model is RANDOM — voice cloning carries no "
                "speaker identity (bake ecapa/ into EST_MODELS_DIR)")
        # ONE place for the voice-prompt window geometry: every site below
        # must keep mel frames == token_mel_ratio * tokens, or the flow's
        # positional prompt-strip (feat[:, mel_len1:]) mis-slices generated
        # frames for checkpoints with token_mel_ratio != 2
        ratio = self.cfg.flow.token_mel_ratio
        self._prompt_tokens = 50                 # 2 s of FSQ tokens @ 25 Hz
        self._prompt_frames = self._prompt_tokens * ratio
        self._noref_tokens = 2                   # live zero slots, no-ref rows
        self._noref_frames = self._noref_tokens * ratio
        # sampling keys: a host counter folded into a base key INSIDE the
        # jitted program (an eager per-request jax.random.split is one extra
        # relay round-trip per call)
        self._call_count = 0

        if official is not None:
            from ..models import cosyvoice_official as com

            ocfg = self.official_cfg

            @functools.partial(jax.jit, static_argnums=(8,))
            def _synth(params, seed, text, tmask, spk, pmel, pmm, psp, max_new):
                key = jax.random.fold_in(jax.random.PRNGKey(42), seed)
                out = com.synthesize_official(
                    params, ocfg, key, text, tmask,
                    psp, jnp.ones_like(psp, bool), spk, pmel,
                    max_new_tokens=max_new,
                )
                return out["audio"], out["token_lengths"]

            @functools.partial(jax.jit, static_argnums=(9,))
            def _synth_b(params, seed, text, tmask, spk, pmel, pmm, psp, psm, max_new):
                key = jax.random.fold_in(jax.random.PRNGKey(42), seed)
                out = com.synthesize_official(
                    params, ocfg, key, text, tmask, psp, psm, spk, pmel,
                    max_new_tokens=max_new,
                )
                return out["audio"], out["token_lengths"]
        else:
            @functools.partial(jax.jit, static_argnums=(8,))
            def _synth(params, seed, text, tmask, spk, pmel, pmm, psp, max_new):
                key = jax.random.fold_in(jax.random.PRNGKey(42), seed)
                out = cvm.synthesize(
                    params, self.cfg, key, text, tmask,
                    psp, jnp.ones_like(psp, bool), spk, pmel, pmm,
                    max_new_tokens=max_new,
                )
                return out["audio"], out["token_lengths"]

            # dp-sharded batches GSPMD-partition the program; the fused
            # Pallas vocoder stage cannot be auto-sharded, so the batched
            # path falls back to XLA convs under a dp mesh (B=1 _synth keeps
            # the kernel: its operands stay replicated, a valid partition)
            from ..parallel.mesh import DP_AXIS

            batched_fused = (
                False if (mesh is not None and mesh.shape.get(DP_AXIS, 1) > 1)
                else None)

            @functools.partial(jax.jit, static_argnums=(9,))
            def _synth_b(params, seed, text, tmask, spk, pmel, pmm, psp, psm, max_new):
                key = jax.random.fold_in(jax.random.PRNGKey(42), seed)
                out = cvm.synthesize(
                    params, self.cfg, key, text, tmask, psp, psm, spk, pmel, pmm,
                    max_new_tokens=max_new, vocode_fused=batched_fused,
                )
                return out["audio"], out["token_lengths"]

        self._fn = _synth
        self._fn_b = _synth_b

        @jax.jit
        def _cond(ecapa_params, st_params, ref16):
            """Fused voice-prompt conditioning: fixed 10 s 16 kHz reference →
            (speaker embedding, 100-frame prompt mel, 50 prompt speech tokens).
            One dispatch — the eager chain (ECAPA fbank+embed, resample,
            kaldi fbank, FSQ tokenizer) costs >1 s in relay RPCs otherwise."""
            from ..models import speech_tokenizer as st
            from ..ops import kaldi_fbank, resample

            spk = ecapa.embed_audio(ecapa_params, self._ecapa_cfg, ref16[None])
            ref24 = resample(ref16, 16_000, 24_000)
            pmel = kaldi_fbank(ref24[None], sr=24_000)[:, : self._prompt_frames].astype(dtype)
            ids = st.tokenize_audio(st_params, self._st_cfg, ref24)
            psp = (ids[None, : self._prompt_tokens] % self.cfg.lm.speech_token_size).astype(jnp.int32)
            return spk.astype(dtype), pmel, psp

        self._cond_fn = _cond

        @jax.jit
        def _cond_b(ecapa_params, st_params, ref16, has_ref):
            """Batched conditioning: [N, 10 s] references → per-row (spk,
            prompt mel, prompt tokens), rows without a reference zeroed/masked.
            One dispatch for the whole serving batch."""
            from ..models import speech_tokenizer as st
            from ..ops import kaldi_fbank, resample

            spk = ecapa.embed_audio(ecapa_params, self._ecapa_cfg, ref16)
            ref24 = resample(ref16, 16_000, 24_000)
            pmel = kaldi_fbank(ref24, sr=24_000)[:, : self._prompt_frames].astype(dtype)
            st_mel = kaldi_fbank(ref24, sr=24_000, frame_length_ms=40.0,
                                 frame_shift_ms=20.0, n_mels=self._st_cfg.n_mels)
            ids, _ = st.encode(st_params, self._st_cfg, st_mel,
                               jnp.ones(st_mel.shape[:2], bool))
            psp = (ids[:, : self._prompt_tokens] % self.cfg.lm.speech_token_size).astype(jnp.int32)
            # cast the multiplier to the SERVING dtype: a float32 has_ref
            # would promote spk/pmel to f32, running batched conditioning at
            # a different precision than the single-request path
            hr = has_ref.astype(dtype)
            spk = spk.astype(dtype) * hr[:, None]
            pmel = pmel * hr[:, None, None]
            psp = psp * has_ref.astype(jnp.int32)[:, None]
            # rows without a reference keep 2 live (zero) prompt slots — same
            # conditioning the single-request path uses
            psm = hr[:, None].astype(bool) | (jnp.arange(psp.shape[1])[None, :] < self._noref_tokens)
            return spk, pmel, psp, psm

        self._cond_b_fn = _cond_b

    @staticmethod
    def _ref_usable(reference_audio_16k) -> bool:
        """One gate for every cloning decision: a reference engages speaker/
        prompt-speech conditioning only above 0.1 s (1600 samples @16 kHz).
        The prompt TEXT must use the same gate — in inference_zero_shot
        semantics the prompt text is 'already spoken' by the prompt speech
        tokens, so prepending it without them makes the LM synthesize the
        style prompt aloud ahead of the translation."""
        return (reference_audio_16k is not None
                and np.asarray(reference_audio_16k).reshape(-1).size > 1600)

    def _text_ids(self, text: str, style_prompt: str,
                  reference_audio_16k) -> List[int]:
        """Token layout for the speech LM: with a cloning reference, the
        prompt transcription precedes the tts text (inference_zero_shot
        semantics); prompt share capped so the tts text is never starved."""
        ids = self.tokenizer.encode(text)[:256]
        if style_prompt and self._ref_usable(reference_audio_16k):
            room = 256 - len(ids)  # tts text has priority over the prompt
            ids = self.tokenizer.encode(style_prompt)[: min(room, 128)] + ids
        return ids

    def _samples_per_token(self) -> int:
        """Samples per speech token from the ACTIVE vocoder geometry: the
        official-mode cfg view keeps the default VocoderConfig, whose hop
        need not match the loaded HiFT checkpoint's upsample stack."""
        hop = (self.official_cfg.hift.hop if self.official is not None
               else self.cfg.vocoder.hop)
        return self.cfg.flow.token_mel_ratio * hop

    def _fit_text_ids(self, ids: List[int]) -> np.ndarray:
        return _fit_vocab(ids, self.cfg.lm.text_vocab, self.weightless, "text")

    def _prepare_conditioning(self, text: str, reference_audio_16k,
                              style_prompt: str = ""):
        """Shared text/voice-prompt prep for batch and streaming synthesis.

        ``style_prompt`` (the reference audio's transcription) rides in the
        text tokens AHEAD of the tts text — CosyVoice2's
        ``inference_zero_shot`` contract (prompt_text ⧺ tts_text), so the LM
        sees matching text for the prompt speech tokens it conditions on."""
        ids = self._text_ids(text, style_prompt, reference_audio_16k)
        bucket = _bucket_capped(max(len(ids), 1), TEXT_BUCKETS)
        toks = np.zeros((1, bucket), np.int32)
        toks[0, : len(ids)] = self._fit_text_ids(ids)
        tmask = np.zeros((1, bucket), bool)
        tmask[0, : len(ids)] = True

        if self._ref_usable(reference_audio_16k):
            # fixed 10 s window (tile-pad short refs) → static shapes, one
            # compiled conditioning program for every request
            ref = np.asarray(reference_audio_16k, np.float32).reshape(-1)[: 16_000 * 10]
            ref = np.resize(ref, 16_000 * 10)
            spk, pmel, psp = self._cond_fn(self._ecapa, self._st, ref)
        else:
            spk = jnp.zeros((1, self.cfg.flow.spk_embed_dim))
            pmel = jnp.zeros((1, self._noref_frames, self.cfg.flow.n_mels), self.dtype)
            psp = np.zeros((1, self._noref_tokens), np.int32)
        pmm = jnp.ones(pmel.shape[:2], bool)

        seconds = float(np.clip(len(text) * self.seconds_per_char, 0.6, 30.0))
        max_new = _bucket_capped(int(seconds * 25), (64, 128, 256, 512, 768))
        return (jnp.asarray(toks), jnp.asarray(tmask), jnp.asarray(spk, self.dtype),
                pmel, pmm, jnp.asarray(psp), max_new)

    def synthesize(
        self, text: str, *, style_prompt: str = "",
        reference_audio_16k: Optional[np.ndarray] = None, language: str = "en",
    ) -> np.ndarray:
        toks, tmask, spk, pmel, pmm, psp, max_new = self._prepare_conditioning(
            text, reference_audio_16k, style_prompt)
        self._call_count += 1
        audio, lengths = self._fn(self.params, jnp.uint32(self._call_count),
                                  toks, tmask, spk, pmel, pmm, psp, max_new)
        # trim to the EOS-determined token length — post-EOS frames are
        # vocoded from zeroed tokens (artifact tail), exactly what the
        # batched path already cuts
        spt = self._samples_per_token()
        n = max(int(np.asarray(lengths)[0]), 1) * spt
        return np.asarray(audio, np.float32)[0, :n]

    def synthesize_batch(self, requests: List[Dict[str, Any]]) -> List[np.ndarray]:
        """Batched synthesis: N concurrent requests → ONE compiled dispatch.

        ``requests`` entries: {"text": str, "reference_audio_16k": array|None,
        "style_prompt": str, "language": str}. Per-request conditioning is
        prepared individually (each already a single fused program), padded to
        shared buckets (text width, prompt-mel frames, prompt tokens, decode
        budget, batch size), and run through one B×… program. The reference
        serves strictly one request per GPU pass (Docker/cosyvoice_api.py:96);
        at serving batch 8 the MXU amortises weight streaming 8×.
        """
        if not requests:
            return []
        n = len(requests)
        if n > 16:               # bounded dispatches for oversized bursts
            from ..core.buckets import row_slices
            outs: List[np.ndarray] = []
            for lo, hi in row_slices(n, 16):
                outs.extend(self.synthesize_batch(requests[lo:hi]))
            return outs
        from ..core.buckets import bucket_batch

        nb = bucket_batch(n)
        # text packing: pure numpy (shared bucket width across the batch)
        enc = [self._text_ids(r["text"], r.get("style_prompt", ""),
                              r.get("reference_audio_16k"))
               for r in requests]
        t_w = _bucket_capped(max(max(len(e) for e in enc), 1), TEXT_BUCKETS)
        toks = np.zeros((nb, t_w), np.int32)
        tmask = np.zeros((nb, t_w), bool)
        for i, e in enumerate(enc):
            toks[i, : len(e)] = self._fit_text_ids(e)
            tmask[i, : len(e)] = True
        # voice-prompt conditioning: ONE batched dispatch for all rows
        refs = np.zeros((nb, 16_000 * 10), np.float32)
        has_ref = np.zeros((nb,), np.float32)
        for i, r in enumerate(requests):
            ra = r.get("reference_audio_16k")
            if self._ref_usable(ra):
                refs[i] = np.resize(
                    np.asarray(ra, np.float32).reshape(-1)[: 16_000 * 10], 16_000 * 10)
                has_ref[i] = 1.0
        has_ref_host = has_ref.copy()
        refs, has_ref = _dp_shard(self.mesh, refs, has_ref)
        spk, pmel, psp, psm = self._cond_b_fn(self._ecapa, self._st, refs, has_ref)
        # prompt-mel mask parity with the single-request path: rows WITH a
        # reference attend over the full prompt window; rows without keep
        # only 4 live (zero) frames — the same conditioning synthesize() uses
        frames = np.arange(pmel.shape[1])[None, :]
        pmm = (has_ref_host[:, None] > 0) | (frames < self._noref_frames)
        seconds = max(
            float(np.clip(len(r["text"]) * self.seconds_per_char, 0.6, 30.0))
            for r in requests
        )
        max_new = _bucket_capped(int(seconds * 25), (64, 128, 256, 512, 768))
        self._call_count += 1
        toks, tmask, pmm = _dp_shard(self.mesh, toks, tmask, pmm)
        audio, lengths = self._fn_b(
            self.params, jnp.uint32(self._call_count),
            toks, tmask, spk, pmel, pmm, psp, psm, max_new,
        )
        audio = np.asarray(audio, np.float32)
        lengths = np.asarray(lengths)
        spt = self._samples_per_token()
        return [audio[i, : max(int(lengths[i]), 1) * spt] for i in range(n)]

    def synthesize_streaming(
        self, text: str, *, style_prompt: str = "",
        reference_audio_16k: Optional[np.ndarray] = None, language: str = "en",
    ):
        """Incremental synthesis: yields np.float32 chunks at sample_rate.

        TPU-native streaming delivery — the capability the reference config
        declares (chunk_size 25, greek_sft.yaml:20-21) but whose API threw
        away (first generator chunk only, Docker/cosyvoice_api.py:129)."""
        toks, tmask, spk, pmel, pmm, psp, max_new = self._prepare_conditioning(
            text, reference_audio_16k, style_prompt)
        self._call_count += 1
        k = jax.random.fold_in(jax.random.PRNGKey(42), self._call_count)
        if self.official is not None:
            from ..models import cosyvoice_official as com

            yield from com.synthesize_streaming_official(
                self.params, self.official_cfg, k, toks, tmask,
                psp, jnp.ones_like(psp, bool), spk, pmel,
                max_new_tokens=max_new,
            )
            return
        yield from cvm.synthesize_streaming(
            self.params, self.cfg, k, toks, tmask,
            psp, jnp.ones_like(psp, bool), spk, pmel, pmm,
            max_new_tokens=max_new,
        )


def reference_scale_configs() -> Dict[str, Any]:
    """The reference deployment's model scales: Whisper-medium ASR
    (cascaded_backend.py:418), NLLB-200-distilled-600M NMT (:434-442),
    CosyVoice2-0.5B TTS (Docker/cosyvoice_api.py:128)."""
    return {
        "asr_cfg": wjm.WhisperConfig.medium(),
        "nmt_cfg": njm.NLLBConfig.distilled_600m(),
        "tts_cfg": cvm.CosyVoiceConfig(),
    }


def jax_engines(*, batch_tts: bool = False, batch_asr: bool = False,
                batch_nmt: bool = False, max_batch: int = 8,
                batch_wait_ms: float = 20.0, scale: str = "toy",
                quantize: bool = False, stage_parallel: bool = False,
                stage_tp: int = 1, **kwargs) -> "Engines":
    """Engines wired to the JAX models (random weights unless supplied).

    ``scale="reference"`` serves the reference deployment's model scales
    (Whisper-medium / NLLB-600M / CosyVoice-0.5B) instead of the toy
    structure-test dims, so the served pipeline and the benchmarked pipeline
    are the same system. ``batch_tts/asr/nmt=True`` wrap the stage engines in
    serving micro-batchers so concurrent pipeline requests coalesce into
    single batched device dispatches. Per-stage tokenizers override the shared
    ``tokenizer`` via ``asr_tokenizer``/``nmt_tokenizer``/``tts_tokenizer``.

    ``stage_parallel=True`` places each stage's params on a disjoint device
    group (parallel/stages.py — the pipeline-parallel analog of SURVEY §2.19)
    with ``stage_tp``-way tensor parallelism inside each group; an explicit
    ``stage_meshes={"asr": Mesh, ...}`` overrides both it and ``mesh``
    per stage.
    """
    from .engines import Engines

    per_stage = kwargs.get("stage_meshes")
    if stage_tp > 1 and (not stage_parallel or per_stage is not None):
        # stage_tp only takes effect when THIS function builds the stage
        # meshes — loud warning instead of a silent no-op (a misconfigured
        # EST_ENGINES__STAGE_TP without STAGE_PARALLEL=1 would otherwise
        # quietly serve unsharded).
        log.warning(
            "stage_tp=%d ignored: %s — set stage_parallel=True "
            "(EST_ENGINES__STAGE_PARALLEL=1) and drop explicit stage_meshes "
            "for per-stage tensor parallelism", stage_tp,
            "explicit stage_meshes given" if per_stage is not None
            else "stage_parallel is off")
    if stage_parallel and per_stage is None:
        from ..parallel.stages import placement_report, stage_meshes

        per_stage = stage_meshes(tp=stage_tp)
        log.info("stage-parallel placement: %s", placement_report(per_stage))

    def _mesh(stage: str):
        if per_stage is not None and stage in per_stage:
            return per_stage[stage]
        return kwargs.get("mesh")

    if scale == "reference":
        for k, v in reference_scale_configs().items():
            kwargs.setdefault(k, v)
    elif scale != "toy":
        raise ValueError(f"unknown scale {scale!r} (toy|reference)")

    # baked native checkpoints (deploy/Dockerfile.models → models/loaders.py
    # bake_models): EST_MODELS_DIR/{asr,nmt}/ override configs AND weights,
    # so a weights-present deployment serves real models with no extra wiring
    models_dir = os.environ.get("EST_MODELS_DIR")
    if models_dir:
        from pathlib import Path

        from ..models.loaders import load_converted

        root = Path(models_dir)
        if (root / "asr" / "config.json").exists() and "asr_params" not in kwargs:
            params, cfg = load_converted(root / "asr", wjm.WhisperConfig)
            kwargs["asr_params"], kwargs["asr_cfg"] = params, cfg
            log.info("loaded baked ASR weights from %s", root / "asr")
        if (root / "nmt" / "config.json").exists() and "nmt_params" not in kwargs:
            params, cfg = load_converted(root / "nmt", njm.NLLBConfig)
            kwargs["nmt_params"], kwargs["nmt_cfg"] = params, cfg
            log.info("loaded baked NMT weights from %s", root / "nmt")
        if ("tts_official" not in kwargs and "tts_params" not in kwargs
                and all((root / s / "config.json").exists()
                        for s in ("tts_llm", "tts_flow", "tts_hift"))):
            from ..models.loaders import load_official_tts

            kwargs["tts_official"] = load_official_tts(root)
            log.info("loaded baked official CosyVoice triple from %s", root)
        # voice-prompt CONDITIONING weights (est bake --ecapa; an optional
        # trained FSQ tokenizer tree uses the same save_converted format).
        # Without these, cloning conditioning runs on random init even when
        # the main TTS weights are real — JaxCosyVoiceTts warns.
        if (root / "ecapa" / "config.json").exists() and "tts_ecapa" not in kwargs:
            from ..models import ecapa as ecm

            kwargs["tts_ecapa"] = load_converted(root / "ecapa", ecm.EcapaConfig)
            log.info("loaded baked ECAPA conditioning from %s", root / "ecapa")
        if ((root / "speech_tokenizer" / "config.json").exists()
                and "tts_speech_tokenizer" not in kwargs):
            from ..models import speech_tokenizer as stm

            kwargs["tts_speech_tokenizer"] = load_converted(
                root / "speech_tokenizer", stm.SpeechTokenizerConfig)
            log.info("loaded baked FSQ speech tokenizer from %s",
                     root / "speech_tokenizer")

    shared_tok = kwargs.get("tokenizer")
    asr: Any = JaxWhisperAsr(
        kwargs.get("asr_cfg"), kwargs.get("asr_params"),
        kwargs.get("asr_tokenizer", shared_tok), quantize=quantize,
        context_buckets=kwargs.get("asr_context_buckets", (30,)),
        mesh=_mesh("asr"))
    nmt: Any = JaxNllbNmt(
        kwargs.get("nmt_cfg"), kwargs.get("nmt_params"),
        kwargs.get("nmt_tokenizer", shared_tok),
        lang_code_to_id=kwargs.get("lang_code_to_id"), quantize=quantize,
        mesh=_mesh("nmt"))
    tts: Any = JaxCosyVoiceTts(
        kwargs.get("tts_cfg"), kwargs.get("tts_params"),
        kwargs.get("tts_tokenizer", shared_tok), quantize=quantize,
        mesh=_mesh("tts"), official=kwargs.get("tts_official"),
        mtp=kwargs.get("tts_mtp", 0), spec=kwargs.get("tts_spec", False),
        ecapa_weights=kwargs.get("tts_ecapa"),
        speech_tokenizer_weights=kwargs.get("tts_speech_tokenizer"))
    if batch_tts:
        from ..serve.batching import BatchedTts

        tts = BatchedTts(tts, max_batch=max_batch, max_wait_ms=batch_wait_ms)
    if batch_asr:
        from ..serve.batching import BatchedAsr

        asr = BatchedAsr(asr, max_batch=max_batch, max_wait_ms=batch_wait_ms)
    if batch_nmt:
        from ..serve.batching import BatchedNmt

        nmt = BatchedNmt(nmt, max_batch=max_batch, max_wait_ms=batch_wait_ms)
    return Engines(asr=asr, nmt=nmt, tts=tts)
