"""AudioProcessor: validation, preprocessing, music detection, enhancement.

Behavioural parity with services/audio_processor.py (483 LoC), with the DSP on
the TPU compute path (ops/): Kaiser resample (:297-304), correlation-aware
stereo downmix (:313-324), STFT(1024/256) spectral noise gate with 1.2× speech
boost (:326-352), multi-resolution band EQ + compression (:362-438), validity
checks (:82-112), preprocessing chain (:152-204), music detection (:206-276),
and the per-language enhancement parameter table (:26-72).
"""

from __future__ import annotations

import dataclasses
import functools
import logging
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import ops
from ..core.config import AudioConfig
from ..core.errors import ValidationError

log = logging.getLogger(__name__)

BAND_EDGES_HZ = (0.0, 150.0, 300.0, 800.0, 1500.0, 3000.0, 5000.0, 8000.0)


@dataclasses.dataclass(frozen=True)
class LanguageParams:
    """Per-language enhancement recipe (audio_processor.py:26-72)."""

    band_multipliers: Tuple[float, ...] = (1.0,) * 7
    compression_threshold: float = 0.5
    compression_ratio: float = 1.0
    formant_boost: float = 0.0


LANGUAGE_PARAMS: Dict[str, LanguageParams] = {
    # French: presence-band lift, gentle compression (audio_processor.py:28-48)
    "fra": LanguageParams(
        band_multipliers=(0.95, 1.0, 1.05, 1.15, 1.2, 1.1, 1.0),
        compression_threshold=0.45, compression_ratio=1.5, formant_boost=1.1,
    ),
    # German: low-mid clarity, stronger compression (audio_processor.py:49-69)
    "deu": LanguageParams(
        band_multipliers=(0.9, 1.0, 1.1, 1.2, 1.15, 1.05, 0.95),
        compression_threshold=0.4, compression_ratio=1.8, formant_boost=1.15,
    ),
    "default": LanguageParams(),
}


@functools.lru_cache(maxsize=32)
def _cached_resample_fn(orig_sr: int, target_sr: int,
                        lowpass_filter_width: int, rolloff: float, beta: float):
    """Module-level jit cache keyed on the config VALUES that shape the
    program (shape specialization itself is jax.jit's job) — shared across
    all AudioProcessor instances, including per-request ones."""

    @jax.jit
    def fn(x):
        return ops.resample(
            x, orig_sr, target_sr,
            lowpass_filter_width=lowpass_filter_width,
            rolloff=rolloff, beta=beta,
        )

    return fn


@functools.lru_cache(maxsize=16)
def _cached_gate_fn(sr: int, n_fft: int, hop: int):
    @jax.jit
    def fn(x, valid_samples):
        valid_frames = 1 + valid_samples // hop  # centered framing count
        return ops.spectral_noise_gate(
            x, sr=sr, n_fft=n_fft, hop=hop,
            speech_boost=1.2, valid_frames=valid_frames)

    return fn


class AudioProcessor:
    SUPPORTED_FORMATS = (".wav", ".mp3", ".ogg", ".flac")  # audio_processor.py:21
    SAMPLE_RATE = 16_000

    def __init__(self, config: Optional[AudioConfig] = None):
        self.config = config or AudioConfig()

    # ------------------------------------------------------------- validation

    def is_valid_audio(self, audio: np.ndarray) -> Tuple[bool, str]:
        """NaN/Inf, RMS ∈ [1e-6, 1.0], |DC| < 0.1, ≥ 100 ms (audio_processor.py:82-112)."""
        x = np.asarray(audio, np.float32).reshape(-1)
        if x.size < int(0.1 * self.SAMPLE_RATE):
            return False, "Audio too short (minimum 100ms)"
        if not np.isfinite(x).all():
            return False, "Audio contains NaN or Inf values"
        rms = float(np.sqrt(np.mean(x**2)))
        if rms < 1e-6:
            return False, "Audio is silent (RMS too low)"
        if rms > 1.0:
            return False, "Audio RMS too high (clipped or unnormalised)"
        if abs(float(np.mean(x))) >= 0.1:
            return False, "Audio has excessive DC offset"
        return True, "ok"

    def validate_audio_length(
        self, duration_seconds: float, *, max_seconds: Optional[float] = None
    ) -> None:
        limit = max_seconds if max_seconds is not None else self.config.max_audio_seconds
        if duration_seconds > limit:
            raise ValidationError(
                f"Audio is too long ({duration_seconds:.1f}s). Maximum allowed is {limit:.0f}s"
            )
        if duration_seconds < 0.1:
            raise ValidationError("Audio is too short (minimum 100ms)")

    # ---------------------------------------------------------- preprocessing

    def preprocess_audio(self, audio: np.ndarray) -> np.ndarray:
        """DC removal → pre-emphasis 0.97 → silence gate → 0.95 peak normalize
        (audio_processor.py:152-204)."""
        x = jnp.asarray(np.asarray(audio, np.float32).reshape(-1))
        x = ops.remove_dc(x)
        x = ops.preemphasis(x, 0.97)
        x = ops.silence_gate(x, threshold_db=-40.0)
        x = ops.peak_normalize(x, 0.95)
        return np.asarray(x)

    # -------------------------------------------------------- music detection

    def detect_background_music(self, audio: np.ndarray, sr: int = 16_000) -> Dict[str, Any]:
        """Weighted flatness / band-ratio / rhythm / stability score
        (audio_processor.py:206-276). Returns {"has_music", "confidence", ...}."""
        x = jnp.asarray(np.asarray(audio, np.float32).reshape(-1))
        if x.shape[0] < 1024:
            # shorter than one analysis frame: the envelope/STFT would be
            # empty (np.correlate raises on empty input) — a sub-64 ms clip
            # carries no music evidence; report a benign no-music result
            return {"has_music": False, "confidence": 0.0, "flatness": 0.0,
                    "bass_ratio": 0.0, "high_ratio": 0.0, "rhythm": 0.0,
                    "stability": 0.0}
        flatness = float(jnp.median(ops.spectral_flatness(x)))

        real, imag = ops.stft(x, 1024, 256)
        mag = np.asarray(jnp.sqrt(real**2 + imag**2))
        freqs = np.linspace(0, sr / 2, mag.shape[-1])
        total = mag.sum() + 1e-8
        bass_ratio = mag[:, freqs < 250].sum() / total
        high_ratio = mag[:, freqs > 4000].sum() / total

        # rhythm: autocorrelation peaks of the energy envelope
        env = np.asarray(ops.energy_envelope(x))
        env = env - env.mean()
        ac = np.correlate(env, env, mode="full")[len(env) - 1:]
        ac /= ac[0] + 1e-8
        # peaks in the 0.25–2 s lag range (30–240 BPM); envelope hop = 256
        # hi is the INCLUSIVE last lag index (clamped to the envelope), so
        # the slice needs hi+1 or the 2.0 s / 30 BPM bin is never inspected
        lo, hi = int(0.25 * sr / 256), min(int(2.0 * sr / 256), len(ac) - 1)
        rhythm = float(np.max(ac[lo:hi + 1])) if hi >= lo else 0.0

        # temporal stability of band energies
        frame_e = mag.sum(axis=-1)
        stability = 1.0 - float(np.std(frame_e) / (np.mean(frame_e) + 1e-8))

        # Calibrated on the committed harvard.wav fixture vs synthetic music:
        # rhythm regularity and band-energy stability separate music (≈0.9/0.7)
        # from clean speech (≈0.4/<0); flatness and band ratios are weak alone.
        confidence = float(np.clip(
            0.25 * min(flatness * 10, 1.0)
            + 0.15 * min((bass_ratio + high_ratio) * 1.5, 1.0)
            + 0.35 * np.clip((rhythm - 0.3) / 0.7, 0.0, 1.0)
            + 0.25 * np.clip(stability, 0.0, 1.0),
            0.0, 1.0,
        ))
        return {
            "has_music": confidence > 0.25,   # audio_processor.py:276
            "confidence": confidence,
            "features": {
                "flatness": flatness, "bass_ratio": float(bass_ratio),
                "high_ratio": float(high_ratio), "rhythm": rhythm,
                "stability": stability,
            },
        }

    # ------------------------------------------------------------- main paths

    # request audio-length buckets (seconds at 16 kHz) for the jitted denoise
    # program: arbitrary upload lengths hit a handful of compiled graphs
    DENOISE_BUCKETS_S = (5, 10, 30, 60, 150, 300)

    def _resample_fn(self, bucket_samples: int, orig_sr: int):
        """Jitted Kaiser resample per (input-length bucket, source rate) —
        one conv dispatch; zero-padding is exact for a linear FIR (the
        unpadded op right-pads with zeros anyway), so trimming the output at
        ceil(valid·new/orig) reproduces the unpadded result bit-for-bit.

        Cached at module level on CONFIG VALUES, not on ``self`` (ADVICE r2:
        per-request ``AudioProcessor()`` construction made instance-keyed
        caches miss every request and pinned dead instances + executables)."""
        cfg = self.config
        return _cached_resample_fn(
            orig_sr, self.SAMPLE_RATE, cfg.resample_lowpass_filter_width,
            cfg.resample_rolloff, cfg.resample_kaiser_beta)

    def _gate_fn(self, bucket_samples: int):
        return _cached_gate_fn(self.SAMPLE_RATE, self.config.denoise_n_fft,
                               self.config.denoise_hop)

    def process_audio(
        self, audio: np.ndarray, orig_sr: int = 16_000, *, denoise: bool = True
    ) -> np.ndarray:
        """Downmix → resample → spectral noise gate (audio_processor.py:278-360).

        Accepts [T] or [C, T]; returns mono [T'] at 16 kHz, float32.

        Host/device split: downmix + Kaiser resample run on host (numpy
        mirrors, parity-tested — per-request lengths vary, so device versions
        either recompile per length or dispatch eagerly over the relay); the
        STFT denoise is real compute and runs as ONE jitted device program per
        length bucket, with the padded tail masked out of the noise-profile
        estimate."""
        x = np.asarray(audio, np.float32)
        if x.ndim == 2 and x.shape[0] > 2:
            # >2 channels (5.1 etc.): average everything — picking only
            # front L/R would DROP the center channel, which carries most
            # dialogue in cinematic mixes
            x = x.mean(axis=0)
        elif x.ndim == 2 and x.shape[0] == 2:
            # correlation-aware downmix (ops.stereo_to_mono math, host-side)
            l, r = x[0], x[1]
            corr = float(np.sum(l * r) /
                         max(np.sqrt(np.sum(l * l) * np.sum(r * r)), 1e-8))
            mid = 0.5 * (l + r)
            x = mid if corr > 0.5 else mid + 0.25 * np.abs(l - r) * np.sign(mid)
        x = x.reshape(-1)

        if orig_sr != self.SAMPLE_RATE:
            n_in = len(x)
            bucket = next(
                (b * orig_sr for b in self.DENOISE_BUCKETS_S if n_in <= b * orig_sr),
                self.DENOISE_BUCKETS_S[-1] * orig_sr)
            if n_in > bucket:
                bucket = n_in
            padded = np.zeros(bucket, np.float32)
            padded[:n_in] = x
            target_len = -(-n_in * self.SAMPLE_RATE // orig_sr)
            x = np.asarray(self._resample_fn(bucket, orig_sr)(jnp.asarray(padded)))[:target_len]
        ok, reason = self.is_valid_audio(x)
        if not ok:
            raise ValidationError(f"Invalid audio: {reason}")
        if denoise:
            n = len(x)
            bucket = next(
                (b * self.SAMPLE_RATE for b in self.DENOISE_BUCKETS_S
                 if n <= b * self.SAMPLE_RATE),
                self.DENOISE_BUCKETS_S[-1] * self.SAMPLE_RATE)
            if n > bucket:  # beyond the top bucket: cap-length inputs only
                bucket = n
            padded = np.zeros(bucket, np.float32)
            padded[:n] = x
            y = self._gate_fn(bucket)(jnp.asarray(padded), jnp.int32(n))
            x = np.asarray(y)[:n]
        return x.astype(np.float32)

    def apply_spectral_enhancement(self, audio: np.ndarray, language: str) -> np.ndarray:
        """Multi-resolution per-language EQ + compression (audio_processor.py:362-438)."""
        params = LANGUAGE_PARAMS.get(language, LANGUAGE_PARAMS["default"])
        x = jnp.asarray(np.asarray(audio, np.float32).reshape(-1))
        y = ops.spectral_enhance(
            x,
            sr=self.SAMPLE_RATE,
            band_edges_hz=BAND_EDGES_HZ,
            band_multipliers=params.band_multipliers,
            compression_threshold=params.compression_threshold,
            compression_ratio=params.compression_ratio,
            resolutions=(512, 1024, 2048),
            resolution_weights=(0.2, 0.4, 0.4),
        )
        y = ops.peak_normalize(y, 0.95)
        return np.asarray(y)

    def process_audio_enhanced(
        self, audio: np.ndarray, orig_sr: int = 16_000, language: str = "default"
    ) -> np.ndarray:
        """Full chain (audio_processor.py:440-484)."""
        x = self.process_audio(audio, orig_sr)
        x = self.preprocess_audio(x)
        return self.apply_spectral_enhancement(x, language)
