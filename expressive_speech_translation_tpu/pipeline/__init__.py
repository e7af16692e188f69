"""Cascade orchestration: backends, manager, audio processor, temporal mappers."""

from .audio_processor import LANGUAGE_PARAMS, AudioProcessor
from .backend import TranslationBackend, TranslationManager, TranslationStrategy
from .cascaded import CascadedBackend
from .engines import Engines, fake_engines
from .languages import COSYVOICE_LANGUAGES, NLLB_LANGUAGES, supported_languages
from .temporal_mapper import TemporalMapper, TimingProfile
from .visual_speech_detector import SpeechSegment, VisualSpeechDetector
from .visual_temporal_mapper import VisualTemporalMapper
from .watermark import WaterMark, make_payload

__all__ = [
    "AudioProcessor",
    "CascadedBackend",
    "COSYVOICE_LANGUAGES",
    "Engines",
    "LANGUAGE_PARAMS",
    "NLLB_LANGUAGES",
    "SpeechSegment",
    "TemporalMapper",
    "TimingProfile",
    "TranslationBackend",
    "TranslationManager",
    "TranslationStrategy",
    "VisualSpeechDetector",
    "VisualTemporalMapper",
    "WaterMark",
    "fake_engines",
    "make_payload",
    "supported_languages",
]
