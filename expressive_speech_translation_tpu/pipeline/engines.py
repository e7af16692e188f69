"""Stage engines: the seam between the cascade orchestration and the models.

The reference's cascade talks to its stages through process boundaries (whisper
in-process, CosyVoice/MuseTalk over HTTP — SURVEY.md §3.1). Here a stage is an
engine object satisfying the protocols below; three assemblies exist:

- :func:`~..pipeline.jax_engines.jax_engines` — the production path:
  models/* compiled on TPU.
- :func:`fake_engines` (this module) — deterministic fakes so the
  orchestrator, serve layer, and batch runner are testable without weights
  (the test rigor the reference lacks — SURVEY.md §4 implication).
- :func:`~..serve.clients.remote_engines` — ASR/NMT in-process + TTS over
  HTTP, preserving the reference's container contracts (/generate-speech/
  etc., cascaded_backend.py:455-475) for split deployments.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Any, Dict, List, Optional, Protocol

import numpy as np

log = logging.getLogger(__name__)


class AsrEngine(Protocol):
    def transcribe(self, audio_16k: np.ndarray, language: Optional[str] = None) -> Dict[str, Any]:
        """→ {"text": str, "words": [{"word","start","end"}], "language": str}"""


class NmtEngine(Protocol):
    def translate(self, text: str, source_lang: str, target_lang: str) -> str: ...


class TtsEngine(Protocol):
    def synthesize(
        self, text: str, *, style_prompt: str = "", reference_audio_16k: Optional[np.ndarray] = None,
        language: str = "en",
    ) -> np.ndarray:
        """→ waveform float32 at self.sample_rate"""

    sample_rate: int


@dataclasses.dataclass
class Engines:
    asr: AsrEngine
    nmt: NmtEngine
    tts: TtsEngine

    def weights_info(self) -> str:
        """"loaded" | "random" | "fake" — surfaced in /health/model and the
        /translate response so weightless serving is never silent (a 200 with
        random weights must be distinguishable from production output)."""
        kinds = []
        for e in (self.asr, self.nmt, self.tts):
            e = getattr(e, "engine", e)  # unwrap serving micro-batchers
            wl = getattr(e, "weightless", None)
            kinds.append("fake" if wl is None else ("random" if wl else "loaded"))
        if all(k == "loaded" for k in kinds):
            return "loaded"
        if any(k == "random" for k in kinds):
            return "random"
        return "fake"

    def placement_info(self) -> Dict[str, List[int]]:
        """Per-stage device ids the stage's params live on — shows whether
        stage-placement parallelism (parallel/stages.py) / TP sharding took
        effect. Surfaced in /health/model. Empty list = host-side engine
        (fake/remote) with no device-resident params.

        Placement is fixed once the engines are constructed, so the pytree
        walk (O(n_leaves) on reference-scale models) runs once and the result
        is cached — /health/model polling stays O(1)."""
        cached = getattr(self, "_placement_cache", None)
        if cached is not None:
            return cached
        out: Dict[str, List[int]] = {}
        for stage, e in (("asr", self.asr), ("nmt", self.nmt), ("tts", self.tts)):
            e = getattr(e, "engine", e)  # unwrap serving micro-batchers
            params = getattr(e, "params", None)
            devices: set = set()
            if params is not None:
                import jax

                jax.tree_util.tree_map(
                    lambda a: devices.update(
                        d.id for d in getattr(a, "devices", set)()),
                    params)
            out[stage] = sorted(devices)
        # object.__setattr__-free: Engines is a plain (non-frozen) dataclass
        self._placement_cache = out
        return out

    def decode_info(self) -> Dict[str, str]:
        """Per-stage decode configuration an operator can act on — surfaced
        in /health/model next to weights/placement so speed/quality knobs
        (int8, bucketed ASR context, accept-all MTP vs lossless spec) are
        never silently active. One short string per stage."""
        out: Dict[str, str] = {}
        for stage, e in (("asr", self.asr), ("nmt", self.nmt), ("tts", self.tts)):
            e = getattr(e, "engine", e)  # unwrap serving micro-batchers
            bits = []
            if getattr(e, "quantized", False):
                bits.append("int8")
            buckets = getattr(e, "context_buckets", None)
            if buckets is not None:
                bits.append("ctx=" + ("exact" if tuple(buckets) == (30,)
                                      else str(tuple(buckets))))
            lm = getattr(getattr(e, "cfg", None), "lm", None)
            if lm is not None and getattr(lm, "mtp", 1) > 1:
                bits.append(("spec" if getattr(lm, "spec_decode", False)
                             else "mtp") + f"K{lm.mtp}")
            if (getattr(e, "conditioning_weightless", False)
                    and not getattr(e, "weightless", True)):
                # loaded main weights + random conditioning: cloning carries
                # no speaker identity — never silent
                bits.append("cond=random")
            out[stage] = ",".join(bits) if bits else "default"
        return out


# ----------------------------------------------------------------- fake stage


class FakeAsr:
    """Deterministic ASR fake: energy-segmented 'words'."""

    def __init__(self, text: str = "hello world this is a test"):
        self.text = text

    def transcribe(self, audio_16k: np.ndarray, language: Optional[str] = None) -> Dict[str, Any]:
        audio = np.asarray(audio_16k).reshape(-1)
        duration = len(audio) / 16_000.0
        words = self.text.split()
        step = duration / max(len(words), 1)
        return {
            "text": self.text,
            "language": language or "eng",
            "words": [
                {"word": w, "start": round(i * step, 3), "end": round((i + 0.8) * step, 3)}
                for i, w in enumerate(words)
            ],
        }


class FakeNmt:
    def translate(self, text: str, source_lang: str, target_lang: str) -> str:
        return f"[{target_lang}] {text}"


class FakeTts:
    """Sine-at-text-hash synth — length proportional to text length."""

    sample_rate = 24_000

    def synthesize(
        self, text: str, *, style_prompt: str = "",
        reference_audio_16k: Optional[np.ndarray] = None, language: str = "en",
    ) -> np.ndarray:
        seconds = max(0.5, min(len(text) * 0.06, 30.0))
        freq = 200 + (hash(text) % 200)
        t = np.arange(int(self.sample_rate * seconds)) / self.sample_rate
        envelope = 0.5 + 0.5 * np.sin(2 * np.pi * 2.5 * t) ** 2
        return (0.3 * envelope * np.sin(2 * np.pi * freq * t)).astype(np.float32)

    def synthesize_streaming(
        self, text: str, *, style_prompt: str = "",
        reference_audio_16k: Optional[np.ndarray] = None, language: str = "en",
        chunk_samples: int = 24_000,
    ):
        """Chunked counterpart of synthesize (same total waveform)."""
        wave = self.synthesize(text, style_prompt=style_prompt,
                               reference_audio_16k=reference_audio_16k,
                               language=language)
        for i in range(0, len(wave), chunk_samples):
            yield wave[i:i + chunk_samples]


def fake_engines(text: str = "hello world this is a test") -> Engines:
    return Engines(asr=FakeAsr(text), nmt=FakeNmt(), tts=FakeTts())
