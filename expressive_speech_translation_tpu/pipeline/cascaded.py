"""CascadedBackend — the production ASR → NMT → TTS pipeline.

Behavioural parity with services/cascaded_backend.py (504 LoC):

- language maps (:53-58, :139-141) via pipeline/languages.py
- ASR word timestamps + inter-word pauses > 250 ms (:146-191)
- cloning reference = first ≤ 25 s of input at 16 kHz (:371-393)
- warm-up inference as init gate (:116-137) — here a tiny compile warm-up
- loudness toward TARGET_LUFS −23 (:38) and the temporal-mapping post-pass
  with visual-guided vs natural-flow fallback (:220-339, :342-368)
- returns {"audio": [1, T] @16 kHz, "transcripts": {source, target}} (:483)

TPU-first change: the reference loads and releases Whisper/NLLB around every
request (:415-452) to fit one GPU; here engines stay resident as compiled
graphs and stage boundaries are in-process arrays, not HTTP hops.
"""

from __future__ import annotations

import logging
import time
from typing import Any, Dict, List, Optional

import numpy as np

from .. import ops
from ..core.config import AppConfig
from ..core.errors import ValidationError
from ..obs.perf import StageTimer
from .audio_processor import AudioProcessor
from .backend import TranslationBackend
from .engines import Engines
from .languages import COSYVOICE_LANGUAGES, NLLB_LANGUAGES, supported_languages
from .temporal_mapper import TemporalMapper
from .visual_temporal_mapper import VisualTemporalMapper

import jax.numpy as jnp

log = logging.getLogger(__name__)

PAUSE_THRESHOLD_SECONDS = 0.25   # cascaded_backend.py:146-191
CLONE_REFERENCE_SECONDS = 25.0   # :376-385
TARGET_LUFS = -23.0              # :38


class CascadedBackend(TranslationBackend):
    def __init__(self, engines: Engines, config: Optional[AppConfig] = None):
        self.engines = engines
        self.config = config or AppConfig()
        self.audio_processor = AudioProcessor(self.config.audio)
        self.temporal_mapper = TemporalMapper()
        self.visual_mapper = VisualTemporalMapper()
        self.initialized = False
        self.last_stage_summary: Dict[str, Any] = {}

    # ------------------------------------------------------------- lifecycle

    def initialize(self) -> None:
        """Warm-up: push 1 s of silence through the stages (parity with the
        reference's silence + "Hello world." warm-up, cascaded_backend.py:125-137)."""
        self.visual_mapper.initialize()
        silence = np.zeros(16_000, np.float32)
        try:
            self.engines.asr.transcribe(silence)
            # warm ALL three stages (the reference warms the full chain):
            # without this the first real request pays the NLLB compile
            # in-request instead of at startup
            self.engines.nmt.translate("Hello world.", "eng", "fra")
            self.engines.tts.synthesize("Hello world.", reference_audio_16k=silence)
        except Exception:  # noqa: BLE001 — warm-up failures are fatal at startup
            log.exception("backend warm-up failed")
            raise
        self.initialized = True
        log.info("CascadedBackend initialized")

    def weights_info(self) -> str:
        return self.engines.weights_info()

    def placement_info(self):
        return self.engines.placement_info()

    def decode_info(self):
        return self.engines.decode_info()

    # -------------------------------------------------------------- languages

    def is_language_supported(self, lang: str) -> bool:
        return lang in COSYVOICE_LANGUAGES and lang in NLLB_LANGUAGES

    def get_supported_languages(self) -> List[str]:
        return supported_languages()

    # ------------------------------------------------------------------ parts

    @staticmethod
    def extract_pauses(words: List[Dict[str, float]]) -> List[Dict[str, float]]:
        """Inter-word pauses > 250 ms (cascaded_backend.py:146-191)."""
        pauses = []
        for prev, cur in zip(words, words[1:]):
            gap = float(cur["start"]) - float(prev["end"])
            if gap > PAUSE_THRESHOLD_SECONDS:
                pauses.append({"start": float(prev["end"]), "end": float(cur["start"]), "duration": gap})
        return pauses

    def reference_audio_for_cloning(self, audio_16k: np.ndarray) -> np.ndarray:
        """First ≤ 25 s (cascaded_backend.py:371-393)."""
        n = int(CLONE_REFERENCE_SECONDS * 16_000)
        return np.asarray(audio_16k, np.float32).reshape(-1)[:n]

    # ------------------------------------------------------------------- main

    def translate_speech(
        self,
        audio: np.ndarray,
        source_lang: str,
        target_lang: str,
        *,
        original_video_frames: Optional[list] = None,
        video_fps: float = 25.0,
        use_voice_cloning: bool = True,
        **kwargs: Any,
    ) -> Dict[str, Any]:
        """``use_voice_cloning=False`` synthesizes without the source-audio
        cloning reference (the frontend's toggle — app.py:358 reads the form
        flag; here it actually controls the reference-audio conditioning)."""
        process_id = f"{time.time_ns():x}"[-8:]  # cascaded_backend.py:398
        if not self.is_language_supported(target_lang):
            raise ValidationError(f"Unsupported target language: {target_lang}")
        if not self.is_language_supported(source_lang):
            # a typo'd source would otherwise silently degrade to an
            # English-prompted ASR + untagged NMT and return garbage with 200
            raise ValidationError(f"Unsupported source language: {source_lang}")

        x = np.asarray(audio, np.float32).reshape(-1)
        timer = StageTimer(audio_seconds=len(x) / 16_000.0)
        log.info("[%s] translate_speech %s→%s (%.1fs audio)",
                 process_id, source_lang, target_lang, timer.audio_seconds)

        with timer.stage("asr"):
            asr = self.engines.asr.transcribe(x, language=source_lang)
        source_text = asr.get("text", "")
        words = asr.get("words", [])

        with timer.stage("nmt"):
            target_text = self.engines.nmt.translate(
                source_text, NLLB_LANGUAGES.get(source_lang, source_lang),
                NLLB_LANGUAGES.get(target_lang, target_lang),
            )
        # reference parity: empty translations are a hard failure
        # (cascaded_backend.py:445-446) — but only when real weights are
        # loaded. Weightless structure mode keeps running (its garbage-in
        # state is already surfaced via weights_info in /health and
        # responses). The Batched* facades forward ``weightless`` from the
        # inner engine, and unknown engines (fakes, wrappers) default to
        # "don't hard-fail": the check only fires when an engine positively
        # declares weightless=False.
        if not target_text.strip() and getattr(self.engines.nmt, "weightless", True) is False:
            raise RuntimeError("Translation result was empty.")

        reference = (self.reference_audio_for_cloning(x)
                     if use_voice_cloning else None)
        with timer.stage("tts"):
            tts_audio = self.engines.tts.synthesize(
                target_text,
                style_prompt=source_text,
                reference_audio_16k=reference,
                language=COSYVOICE_LANGUAGES.get(target_lang, "en"),
            )
        tts_sr = getattr(self.engines.tts, "sample_rate", 24_000)
        if tts_sr != 16_000:
            # host polyphase mirror of ops.resample — per-request lengths vary,
            # so the device op would recompile/eager-dispatch every request
            from ..ops.host_dsp import resample_np

            tts_audio = resample_np(np.asarray(tts_audio), tts_sr, 16_000)

        with timer.stage("post"):
            from ..ops.host_dsp import loudness_normalize_np

            out = self._apply_natural_temporal_mapping(
                tts_audio, x, words,
                original_video_frames=original_video_frames, video_fps=video_fps,
            )
            out = loudness_normalize_np(out, TARGET_LUFS)

        self.last_stage_summary = timer.summary()
        log.info("[%s] done: %s", process_id, {
            k: round(v["xrt"], 4) for k, v in self.last_stage_summary.items()
        })
        return {
            "audio": out.reshape(1, -1).astype(np.float32),
            "transcripts": {"source": source_text, "target": target_text},
            "process_id": process_id,
            "stage_summary": self.last_stage_summary,
        }

    def translate_text(
        self,
        text: str,
        source_lang: str,
        target_lang: str,
        *,
        synthesize: bool = False,
    ) -> Dict[str, Any]:
        """Text-mode translation (simple_translate_tts.py role, SURVEY §2.18:
        text → NLLB → optional TTS): returns {"source_text", "target_text"}
        plus {"audio" [1,T]@16k} when ``synthesize`` — the /translate-text
        route and the SPA TranslateTool ride this."""
        if not text.strip():
            raise ValidationError("text is required")
        if not self.is_language_supported(target_lang):
            raise ValidationError(f"Unsupported target language: {target_lang}")
        target_text = self.engines.nmt.translate(
            text, NLLB_LANGUAGES.get(source_lang, source_lang),
            NLLB_LANGUAGES.get(target_lang, target_lang),
        )
        if not target_text.strip() and getattr(self.engines.nmt, "weightless", True) is False:
            raise RuntimeError("Translation result was empty.")
        out: Dict[str, Any] = {"source_text": text, "target_text": target_text}
        if synthesize:
            wave = self.engines.tts.synthesize(
                target_text, language=COSYVOICE_LANGUAGES.get(target_lang, "en"))
            tts_sr = getattr(self.engines.tts, "sample_rate", 24_000)
            wave = np.asarray(wave, np.float32).reshape(-1)
            if tts_sr != 16_000:
                from ..ops.host_dsp import resample_np

                wave = resample_np(wave, tts_sr, 16_000)
            out["audio"] = wave.reshape(1, -1).astype(np.float32)
        return out

    def translate_speech_streaming(
        self,
        audio: np.ndarray,
        source_lang: str,
        target_lang: str,
    ):
        """Streaming S2ST with a PIPELINED cascade: when the ASR engine
        exposes ``transcribe_streaming`` (per-30s-window decode), each window
        flows window-ASR → NMT → streaming TTS as soon as it exists, so time
        to first audio is O(one ASR window + one TTS chunk) instead of
        O(whole utterance) — WhisperFlow-style serving of the retrieved
        technique papers (PAPERS.md). Transcripts events carry ACCUMULATED
        text (each one supersedes the last; the final one is complete), then
        16 kHz audio chunks follow per window. Engines without streaming ASR
        fall back to utterance-level ASR+NMT then streaming TTS; a TTS engine
        without ``synthesize_streaming`` yields one offline chunk. Temporal
        mapping and loudness normalisation are offline-only post passes and
        are skipped on this path.
        """
        if not self.is_language_supported(target_lang):
            raise ValidationError(f"Unsupported target language: {target_lang}")
        x = np.asarray(audio, np.float32).reshape(-1)
        src_nllb = NLLB_LANGUAGES.get(source_lang, source_lang)
        tgt_nllb = NLLB_LANGUAGES.get(target_lang, target_lang)
        tts = self.engines.tts
        tts_sr = getattr(tts, "sample_rate", 24_000)
        # gate on the UNWRAPPED engines: micro-batch facades define streaming
        # methods that raise AttributeError when the inner engine lacks one,
        # so hasattr on the wrapper is always True and the fallbacks would be
        # unreachable
        tts_inner = getattr(tts, "engine", tts)
        asr_inner = getattr(self.engines.asr, "engine", self.engines.asr)
        tts_streams = hasattr(tts_inner, "synthesize_streaming")
        from ..ops.host_dsp import resample_np

        def tts_events(text: str, style: str, reference):
            kw = dict(style_prompt=style, reference_audio_16k=reference,
                      language=COSYVOICE_LANGUAGES.get(target_lang, "en"))
            chunks = (tts.synthesize_streaming(text, **kw) if tts_streams
                      else iter([tts.synthesize(text, **kw)]))
            for chunk in chunks:
                c = np.asarray(chunk, np.float32)
                if tts_sr != 16_000:
                    # host-side polyphase: chunk lengths vary per request, the
                    # jitted device op would recompile for every unique length
                    # (the offline path made the same switch, translate_speech)
                    c = resample_np(c, tts_sr, 16_000)
                yield {"type": "audio", "chunk": c, "sample_rate": 16_000}

        if hasattr(asr_inner, "transcribe_streaming"):
            reference = self.reference_audio_for_cloning(x)
            src_parts: list = []
            tgt_parts: list = []
            asr_weightless = getattr(asr_inner, "weightless", True)
            for seg in self.engines.asr.transcribe_streaming(
                    x, language=source_lang):
                seg_text = seg.get("text", "").strip()
                # real weights: a silent window stays silent. Weightless/
                # structural runs keep the full pipeline exercised (random
                # weights decode empty text constantly; the offline path
                # likewise still translates+synthesizes in that mode)
                if not seg_text and asr_weightless is False:
                    continue
                seg_target = self.engines.nmt.translate(
                    seg_text, src_nllb, tgt_nllb)
                src_parts.append(seg_text)
                tgt_parts.append(seg_target)
                yield {
                    "type": "transcripts",
                    "source": " ".join(p for p in src_parts if p),
                    "target": " ".join(p for p in tgt_parts if p),
                    "window": [seg.get("start", 0.0), seg.get("end", 0.0)],
                }
                yield from tts_events(seg_target, seg_text, reference)
            if not src_parts:   # silence in, structured empty out
                yield {"type": "transcripts", "source": "", "target": ""}
            return

        asr = self.engines.asr.transcribe(x, language=source_lang)
        source_text = asr.get("text", "")
        target_text = self.engines.nmt.translate(source_text, src_nllb, tgt_nllb)
        yield {"type": "transcripts", "source": source_text, "target": target_text}
        reference = self.reference_audio_for_cloning(x)
        yield from tts_events(target_text, source_text, reference)

    # ------------------------------------------------------------ temporal map

    def _apply_natural_temporal_mapping(
        self,
        translated: np.ndarray,
        source: np.ndarray,
        words: List[Dict[str, float]],
        *,
        original_video_frames: Optional[list] = None,
        video_fps: float = 25.0,
    ) -> np.ndarray:
        """Visual-guided mapping when video frames are available; natural-flow
        fallback otherwise or on failure (cascaded_backend.py:220-339).
        Pause extraction rides inside timing_profile (>250 ms gaps) — there is
        deliberately no second pause computation here."""
        if original_video_frames:
            try:
                from .visual_speech_detector import VisualSpeechDetector

                # a preset detector is honored only when its frame clock
                # matches THIS request's video — segment times scale with
                # frame_skip/fps, so a 25 fps detector on 30 fps frames
                # inflates every boundary by 1.2x
                detector = self.visual_mapper.detector
                if detector is None or getattr(detector, "fps", video_fps) != video_fps:
                    detector = VisualSpeechDetector(fps=video_fps)
                segments = detector.detect_speech_segments(original_video_frames)
                if segments:
                    total = len(original_video_frames) / video_fps
                    return self.visual_mapper.distribute_audio(
                        translated, segments, total, source_audio=source,
                    )
                log.info("no visual speech segments; falling back to natural flow")
            except Exception:  # noqa: BLE001 — parity: fallback, never fail (:285-298)
                log.exception("visual mapping failed; falling back to natural flow")
        try:
            profile = self.temporal_mapper.timing_profile(source, words or None)
            return self.temporal_mapper.apply_temporal_guidance(translated, source, profile)
        except Exception:  # noqa: BLE001 — parity: temporal mapping is best-effort
            log.exception("temporal mapping failed; returning unmapped audio")
            return np.asarray(translated, np.float32).reshape(-1)

    def cleanup(self) -> None:
        log.info("CascadedBackend cleanup")
