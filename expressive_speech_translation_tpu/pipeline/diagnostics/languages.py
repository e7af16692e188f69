"""Per-language phonetic analyzers.

Parity with services/diagnostics/language_analysis/: French nasalisation /
liaison / prosody / vowels (french.py:11-380), German vowel length / glottal
stops / final devoicing (german.py:11-301), Italian gemination (italian.py:11),
Portuguese nasalisation / reduction (portuguese.py:11), Spanish trill /
interdental / stops (spanish.py:11). Each analyzer measures acoustic proxies
for the language's signature phenomena and returns named scores in [0, 1].
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from ...evals.acoustic_metrics import track_f0
from .spectral import SpectralAnalyzer
from .temporal import TemporalAnalyzer


class _Base:
    language = "generic"

    def __init__(self, sr: int = 16_000):
        self.sr = sr
        self.spectral = SpectralAnalyzer(sr)
        self.temporal = TemporalAnalyzer(sr)

    # shared acoustic proxies -------------------------------------------------

    def _nasal_ratio(self, spec: Dict[str, float]) -> float:
        """Nasal murmur concentrates ~250–500 Hz with damped higher formants."""
        lo = spec["band_low_mid"]
        hi = spec["band_upper_mid"] + spec["band_presence"]
        return float(np.clip(lo / max(lo + hi, 1e-9), 0, 1))

    def _burst_rate(self, audio: np.ndarray) -> float:
        """Short energy bursts per second (stop consonants / trills / glottal stops)."""
        x = np.asarray(audio, np.float32).reshape(-1)
        frame = 160  # 10 ms
        n = len(x) // frame
        if n < 4:
            return 0.0
        env = np.sqrt((x[: n * frame].reshape(n, frame) ** 2).mean(axis=1))
        d = np.diff(env)
        thr = d.std() * 2 + 1e-9
        bursts = int(((d[:-1] > thr) & (d[1:] < -thr / 2)).sum())
        return bursts / (len(x) / self.sr)

    def _vowel_length_variation(self, audio: np.ndarray) -> float:
        """CV of voiced-run durations (long/short vowel contrast proxy)."""
        f0 = track_f0(audio, self.sr)
        runs, cur = [], 0
        for v in ~np.isnan(f0):
            if v:
                cur += 1
            elif cur:
                runs.append(cur)
                cur = 0
        if cur:
            runs.append(cur)
        if len(runs) < 2:
            return 0.0
        runs_arr = np.asarray(runs, np.float32)
        return float(np.clip(runs_arr.std() / (runs_arr.mean() + 1e-9), 0, 1))

    def _prosody_range(self, audio: np.ndarray) -> float:
        f0 = track_f0(audio, self.sr)
        voiced = f0[~np.isnan(f0)]
        if voiced.size < 4:
            return 0.0
        return float(np.clip((np.percentile(voiced, 90) - np.percentile(voiced, 10)) / 200.0, 0, 1))

    def analyze(self, audio: np.ndarray) -> Dict[str, float]:  # pragma: no cover — overridden
        return {}


class FrenchAnalyzer(_Base):
    language = "fra"

    def analyze(self, audio: np.ndarray) -> Dict[str, float]:
        spec = self.spectral.analyze(audio)
        temp = self.temporal.analyze(audio)
        # liaison proxy: few pauses relative to segments (smooth linking)
        liaison = 1.0 - min(temp["pause_count"] / max(temp["n_segments"], 1), 1.0)
        return {
            "nasalization": self._nasal_ratio(spec),
            "liaison_smoothness": float(liaison),
            "prosody_range": self._prosody_range(audio),
            "vowel_frontness": float(np.clip(spec["centroid_hz"] / 2500.0, 0, 1)),
        }


class GermanAnalyzer(_Base):
    language = "deu"

    def analyze(self, audio: np.ndarray) -> Dict[str, float]:
        spec = self.spectral.analyze(audio)
        return {
            "vowel_length_contrast": self._vowel_length_variation(audio),
            "glottal_stop_rate": float(np.clip(self._burst_rate(audio) / 6.0, 0, 1)),
            # final devoicing proxy: low voiced-energy tails at segment ends
            "final_devoicing": float(np.clip(1.0 - spec["band_bass"] * 4.0, 0, 1)),
        }


class ItalianAnalyzer(_Base):
    language = "ita"

    def analyze(self, audio: np.ndarray) -> Dict[str, float]:
        return {
            "gemination": float(np.clip(self._burst_rate(audio) / 8.0, 0, 1)),
            "vowel_clarity": self._prosody_range(audio),
        }


class PortugueseAnalyzer(_Base):
    language = "por"

    def analyze(self, audio: np.ndarray) -> Dict[str, float]:
        spec = self.spectral.analyze(audio)
        temp = self.temporal.analyze(audio)
        return {
            "nasalization": self._nasal_ratio(spec),
            # vowel reduction proxy: low speech ratio within segments
            "vowel_reduction": float(np.clip(1.0 - temp["speech_ratio"], 0, 1)),
        }


class SpanishAnalyzer(_Base):
    language = "spa"

    def analyze(self, audio: np.ndarray) -> Dict[str, float]:
        spec = self.spectral.analyze(audio)
        return {
            "trill_rate": float(np.clip(self._burst_rate(audio) / 10.0, 0, 1)),
            "interdental_energy": float(np.clip(spec["band_presence"] * 8.0, 0, 1)),
            "stop_crispness": float(np.clip(self._burst_rate(audio) / 6.0, 0, 1)),
        }


LANGUAGE_ANALYZERS = {
    a.language: a for a in (FrenchAnalyzer, GermanAnalyzer, ItalianAnalyzer,
                            PortugueseAnalyzer, SpanishAnalyzer)
}


def analyze_language(audio: np.ndarray, language: str, sr: int = 16_000) -> Dict[str, float]:
    cls = LANGUAGE_ANALYZERS.get(language)
    if cls is None:
        return {}
    return cls(sr).analyze(audio)
