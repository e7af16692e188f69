"""Alternate translation backends + model lifecycle manager.

Parity with the reference's pyc-only services (SURVEY.md §2.4, recovered by
marshal inspection) and the surviving standalone source:

- :class:`SeamlessBackend` — direct S2ST (facebook/seamless-m4t-v2-large
  equivalent) with the translate_speech.py behaviours: 80–7500 Hz bandpass
  pre-filter, ``num_beams=5``, tanh limiting (translate_speech.py:79-154).
- :class:`ESPnetBackend` — per-language on-demand ASR/TTS loading with cache
  and fallback text when ASR is empty (test_espnet_backend.py contract).
- :class:`ModelManager` — singleton model lifecycle with inactivity reload
  ("Model inactive for too long, reloading…" — services/utils.py:27-52).
- :class:`TranslationEnvironment` — content-aware generation parameters
  (speech_focused / mixed_content / general →
  beam/temperature/penalty sets, services/translation_environment.py:22-82).
"""

from __future__ import annotations

import logging
import threading
import time
from typing import Any, Callable, Dict, List, Optional

import numpy as np

from .. import ops
from .backend import TranslationBackend
from .languages import NLLB_LANGUAGES, supported_languages
from .tokenizer import ByteTokenizer, Tokenizer

import jax
import jax.numpy as jnp

log = logging.getLogger(__name__)


# -------------------------------------------------------------- environments


class TranslationEnvironment:
    """Content-aware generation parameter selection."""

    PARAMS = {
        # translation_environment.py:22-82 parameter sets
        "speech_focused": {"num_beams": 5, "temperature": 0.7, "repetition_penalty": 1.2},
        "mixed_content": {"num_beams": 4, "temperature": 0.8, "repetition_penalty": 1.3},
        "general": {"num_beams": 3, "temperature": 1.0, "repetition_penalty": 1.0},
    }

    @classmethod
    def classify(cls, audio_analysis: Dict[str, Any]) -> str:
        music = audio_analysis.get("music_detection", {}).get("confidence", 0.0)
        if music < 0.15:
            return "speech_focused"
        if music < 0.4:
            return "mixed_content"
        return "general"

    @classmethod
    def generation_params(cls, audio_analysis: Dict[str, Any]) -> Dict[str, Any]:
        return dict(cls.PARAMS[cls.classify(audio_analysis)])


# -------------------------------------------------------------- model manager


class ModelManager:
    """Singleton lifecycle manager with inactivity reload (§2.4 ModelManager:
    __new__/_initialize/_verify_model/_load_model/get_model_components/cleanup)."""

    _instance: Optional["ModelManager"] = None
    _lock = threading.Lock()
    INACTIVITY_SECONDS = 1800.0

    def __new__(cls, *args, **kwargs):
        with cls._lock:
            if cls._instance is None:
                cls._instance = super().__new__(cls)
                cls._instance._initialized = False
            return cls._instance

    def __init__(self, loader: Optional[Callable[[], Any]] = None):
        if self._initialized and loader is None:
            return
        self._initialize(loader)

    def _initialize(self, loader: Optional[Callable[[], Any]]):
        self._loader = loader
        self._components: Any = None
        self._last_used = 0.0
        self._initialized = True

    def _load_model(self):
        if self._loader is None:
            raise RuntimeError("ModelManager has no loader configured")
        log.info("ModelManager: loading model components")
        self._components = self._loader()
        self._last_used = time.monotonic()

    def _verify_model(self) -> bool:
        return self._components is not None

    def get_model_components(self):
        now = time.monotonic()
        if self._verify_model() and now - self._last_used > self.INACTIVITY_SECONDS:
            log.info("Model inactive for too long, reloading…")  # utils.py:27-52 parity
            self._components = None
        if not self._verify_model():
            self._load_model()
        self._last_used = now
        return self._components

    def cleanup(self):
        log.info("ModelManager cleanup")
        self._components = None

    def __del__(self):  # pragma: no cover — interpreter-shutdown path
        try:
            self.cleanup()
        except Exception:  # noqa: BLE001
            pass

    @classmethod
    def reset_singleton(cls):
        """Test hook."""
        with cls._lock:
            cls._instance = None


# ------------------------------------------------------------- seamless (S2ST)


def bandpass_80_7500(audio: np.ndarray, sr: int = 16_000) -> np.ndarray:
    """FFT-domain bandpass 80–7500 Hz (translate_speech.py pre-filter)."""
    x = np.asarray(audio, np.float32).reshape(-1)
    spec = np.fft.rfft(x)
    freqs = np.fft.rfftfreq(len(x), 1.0 / sr)
    spec[(freqs < 80) | (freqs > 7500)] = 0
    return np.fft.irfft(spec, n=len(x)).astype(np.float32)


class SeamlessBackend(TranslationBackend):
    """Direct S2ST backend (SeamlessM4T-v2 equivalent, models/seamless.py)."""

    def __init__(self, params=None, cfg=None, tokenizer: Optional[Tokenizer] = None,
                 *, num_beams: int = 5):
        from ..models import seamless as sm

        self.cfg = cfg or sm.SeamlessConfig()
        self._params = params
        self.tokenizer = tokenizer or ByteTokenizer()
        self.num_beams = num_beams
        self.initialized = False
        self._fn = None

    def initialize(self) -> None:
        from ..models import seamless as sm
        from ..models.common import cast_floats

        if self._params is None:
            log.warning("SeamlessBackend: random weights (no checkpoint supplied)")
            self._params = sm.init_seamless(jax.random.PRNGKey(7), self.cfg)
        self._params = cast_floats(self._params, jnp.bfloat16)

        import functools

        @functools.partial(jax.jit, static_argnums=(2,))
        def fn(params, mel, beams):
            return sm.translate_s2st(params, self.cfg, mel, num_beams=beams,
                                     max_text_tokens=64, max_units=256)

        self._fn = fn
        self.initialized = True

    def is_language_supported(self, lang: str) -> bool:
        return lang in NLLB_LANGUAGES

    def get_supported_languages(self) -> List[str]:
        return sorted(NLLB_LANGUAGES)

    def translate_speech(self, audio, source_lang: str, target_lang: str, **kw) -> Dict[str, Any]:
        from ..ops import kaldi_fbank

        x = bandpass_80_7500(np.asarray(audio, np.float32).reshape(-1))
        mel = kaldi_fbank(jnp.asarray(x[None]), sr=16_000,
                          frame_length_ms=25.0, frame_shift_ms=10.0).astype(jnp.bfloat16)
        out = self._fn(self._params, mel, self.num_beams)
        wave = np.asarray(out["audio"], np.float32)[0]
        wave = np.tanh(wave)  # translate_speech.py:147 limiter
        text_ids = [int(t) for t in np.asarray(out["text_tokens"])[0]
                    if t not in (self.cfg.pad_token, self.cfg.eos_token, self.cfg.decoder_start_token)]
        return {
            "audio": wave.reshape(1, -1),
            "transcripts": {"source": "", "target": self.tokenizer.decode(text_ids)},
        }


# --------------------------------------------------------------- espnet-style


class ESPnetBackend(TranslationBackend):
    """Per-language on-demand ASR/TTS backend (§2.4 ESPnetBackend:
    _load_asr_model/_load_tts_model per language, cached; ASR-empty fallback)."""

    FALLBACK_TEXT = "Hello, this is a test."  # test_espnet_backend.py contract

    def __init__(
        self,
        asr_factory: Optional[Callable[[str], Any]] = None,
        tts_factory: Optional[Callable[[str], Any]] = None,
    ):
        from .engines import FakeAsr, FakeTts

        self._asr_factory = asr_factory or (lambda lang: FakeAsr())
        self._tts_factory = tts_factory or (lambda lang: FakeTts())
        self._asr_models: Dict[str, Any] = {}
        self._tts_models: Dict[str, Any] = {}
        self.initialized = False

    def initialize(self) -> None:
        self.initialized = True

    def _load_asr_model(self, lang: str):
        if lang not in self._asr_models:
            log.info("ESPnetBackend: loading ASR model for %s", lang)
            self._asr_models[lang] = self._asr_factory(lang)
        return self._asr_models[lang]

    def _load_tts_model(self, lang: str):
        if lang not in self._tts_models:
            log.info("ESPnetBackend: loading TTS model for %s", lang)
            self._tts_models[lang] = self._tts_factory(lang)
        return self._tts_models[lang]

    def is_language_supported(self, lang: str) -> bool:
        return lang in supported_languages()

    def get_supported_languages(self) -> List[str]:
        return supported_languages()

    def translate_speech(self, audio, source_lang: str, target_lang: str, **kw) -> Dict[str, Any]:
        x = np.asarray(audio, np.float32).reshape(-1)
        asr = self._load_asr_model(source_lang)
        result = asr.transcribe(x, language=source_lang)
        text = (result.get("text") or "").strip() or self.FALLBACK_TEXT
        tts = self._load_tts_model(target_lang)
        wave = tts.synthesize(text, language=target_lang)
        sr = getattr(tts, "sample_rate", 16_000)
        if sr != 16_000:
            wave = np.asarray(ops.resample(jnp.asarray(wave), sr, 16_000))
        return {
            "audio": np.asarray(wave, np.float32).reshape(1, -1),
            "transcripts": {"source": text, "target": text},
        }
