"""Audio DSP building blocks used by the pipeline layer.

TPU-native re-implementations of the reference's AudioProcessor/TemporalMapper
numerics (services/audio_processor.py, services/temporal_mapper.py): DC removal,
pre-emphasis, peak normalisation, spectral noise gating, multi-resolution
spectral enhancement, band EQ, phase-vocoder time stretch, energy envelopes.
All functions are jit-able with static shapes and operate on [..., T] arrays.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .stft import istft, stft
from .windows import hann

SPEECH_BAND_HZ: Tuple[float, float] = (300.0, 3400.0)


def remove_dc(x: jnp.ndarray) -> jnp.ndarray:
    return x - jnp.mean(x, axis=-1, keepdims=True)


def preemphasis(x: jnp.ndarray, coeff: float = 0.97) -> jnp.ndarray:
    """y[t] = x[t] - coeff * x[t-1] (audio_processor.py:171)."""
    prev = jnp.concatenate([x[..., :1] * 0, x[..., :-1]], axis=-1)
    return x - coeff * prev


def peak_normalize(x: jnp.ndarray, peak: float = 0.95) -> jnp.ndarray:
    """Scale so max |x| == peak (audio_processor.py:199)."""
    m = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    return x * (peak / jnp.maximum(m, 1e-8))


def soft_limit(x: jnp.ndarray, drive: float = 1.0) -> jnp.ndarray:
    """tanh limiter (translate_speech.py:147 uses tanh to prevent clipping)."""
    return jnp.tanh(x * drive)


def silence_gate(
    x: jnp.ndarray, threshold_db: float = -40.0, frame: int = 512
) -> jnp.ndarray:
    """Zero out frames whose RMS is below threshold (audio_processor.py:180-193)."""
    t = x.shape[-1]
    n_frames = -(-t // frame)
    pad = n_frames * frame - t
    padded = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)]) if pad else x
    framed = padded.reshape(*x.shape[:-1], n_frames, frame)
    rms = jnp.sqrt(jnp.mean(framed**2, axis=-1, keepdims=True) + 1e-12)
    thr = 10.0 ** (threshold_db / 20.0)
    gated = jnp.where(rms > thr, framed, 0.0).reshape(*x.shape[:-1], n_frames * frame)
    return gated[..., :t]


def stereo_to_mono(x: jnp.ndarray) -> jnp.ndarray:
    """Correlation-aware downmix: mid/side when channels are decorrelated
    (audio_processor.py:313-324), else plain average. x: [C, T] → [T]."""
    if x.ndim == 1:
        return x
    if x.shape[0] == 1:
        return x[0]
    l, r = x[0], x[1]
    corr = jnp.sum(l * r) / jnp.maximum(
        jnp.sqrt(jnp.sum(l * l) * jnp.sum(r * r)), 1e-8
    )
    mid = 0.5 * (l + r)
    side_boosted = 0.5 * (l + r) + 0.25 * jnp.abs(l - r) * jnp.sign(mid)
    return jnp.where(corr > 0.5, mid, side_boosted)


def rms_db(x: jnp.ndarray) -> jnp.ndarray:
    return 20.0 * jnp.log10(jnp.sqrt(jnp.mean(x**2, axis=-1) + 1e-12))


def loudness_normalize(x: jnp.ndarray, target_lufs: float = -23.0) -> jnp.ndarray:
    """RMS-proxy loudness normalisation toward target LUFS (TARGET_LUFS=-23,
    cascaded_backend.py:38). Full BS.1770 gating is host-side in evals."""
    gain_db = target_lufs - rms_db(x)
    gain = 10.0 ** (gain_db / 20.0)
    return soft_limit(x * gain[..., None], 1.0) if x.ndim > 1 else soft_limit(x * gain, 1.0)


# --------------------------------------------------------------- noise gating


def spectral_noise_gate(
    x: jnp.ndarray,
    *,
    sr: int = 16_000,
    n_fft: int = 1024,
    hop: int = 256,
    noise_percentile_frames: int = 10,
    oversubtract: float = 1.2,
    speech_boost: float = 1.2,
    gate_floor: float = 0.1,
    valid_frames: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """STFT-domain noise gate with speech-band boost.

    Mirrors the reference denoiser (audio_processor.py:326-352): estimate the
    noise profile from the quietest frames, soft-gate magnitudes below
    ``oversubtract × noise``, boost 300–3400 Hz, and reconstruct with the
    original phase.

    ``valid_frames``: optional (traced) frame count for bucket-padded inputs —
    padded all-zero frames would otherwise win the quietest-frame selection
    and null the noise profile (disabling the gate).
    """
    length = x.shape[-1]
    real, imag = stft(x, n_fft, hop)
    mag = jnp.sqrt(real * real + imag * imag + 1e-12)

    frame_energy = jnp.sum(mag, axis=-1)
    if valid_frames is not None:
        frame_idx = jnp.arange(mag.shape[-2])
        frame_energy = jnp.where(frame_idx < valid_frames, frame_energy, jnp.inf)
    k = min(noise_percentile_frames, mag.shape[-2])
    _, idx = jax.lax.top_k(-frame_energy, k)  # quietest frames
    noise_profile = jnp.mean(
        jnp.take_along_axis(mag, idx[..., None], axis=-2), axis=-2, keepdims=True
    )

    gain = jnp.clip((mag - oversubtract * noise_profile) / jnp.maximum(mag, 1e-8), gate_floor, 1.0)

    freqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    speech_mask = ((freqs >= SPEECH_BAND_HZ[0]) & (freqs <= SPEECH_BAND_HZ[1])).astype(np.float32)
    boost = 1.0 + (speech_boost - 1.0) * jnp.asarray(speech_mask)
    gain = jnp.minimum(gain * boost, 1.0)

    return istft(real * gain, imag * gain, n_fft, hop, length=length)


# ------------------------------------------------- multi-resolution enhancement


def band_eq_gains(
    sr: int, n_bins: int, n_fft: int, band_edges_hz: Sequence[float], multipliers: Sequence[float]
) -> np.ndarray:
    """Per-bin gain vector from band-edge/multiplier tables
    (the 7-band language EQ, audio_processor.py:26-72)."""
    freqs = np.linspace(0, sr / 2, n_bins)
    gains = np.ones(n_bins, dtype=np.float32)
    for lo, hi, mult in zip(band_edges_hz[:-1], band_edges_hz[1:], multipliers):
        gains[(freqs >= lo) & (freqs < hi)] = mult
    return gains


def spectral_enhance(
    x: jnp.ndarray,
    *,
    sr: int = 16_000,
    band_edges_hz: Sequence[float] = (0, 150, 300, 800, 1500, 3000, 5000, 8000),
    band_multipliers: Sequence[float] = (1.0,) * 7,
    compression_threshold: float = 0.5,
    compression_ratio: float = 1.0,
    resolutions: Sequence[int] = (512, 1024, 2048),
    resolution_weights: Sequence[float] = (0.2, 0.4, 0.4),
) -> jnp.ndarray:
    """Multi-resolution band EQ + magnitude compression
    (audio_processor.py:362-438): process at three STFT resolutions and mix."""
    length = x.shape[-1]
    out = jnp.zeros_like(x)
    for n_fft, weight in zip(resolutions, resolution_weights):
        hop = n_fft // 4
        real, imag = stft(x, n_fft, hop)
        mag = jnp.sqrt(real * real + imag * imag + 1e-12)
        phase_r, phase_i = real / mag, imag / mag

        gains = jnp.asarray(band_eq_gains(sr, n_fft // 2 + 1, n_fft, band_edges_hz, band_multipliers))
        new_mag = mag * gains
        if compression_ratio != 1.0:
            peak = jnp.max(new_mag, axis=(-2, -1), keepdims=True)
            norm = new_mag / jnp.maximum(peak, 1e-8)
            compressed = jnp.where(
                norm > compression_threshold,
                compression_threshold + (norm - compression_threshold) / compression_ratio,
                norm,
            )
            new_mag = compressed * peak
        y = istft(new_mag * phase_r, new_mag * phase_i, n_fft, hop, length=length)
        out = out + weight * y
    return out


# ------------------------------------------------------------- phase vocoder


def phase_vocoder_stretch(
    x: jnp.ndarray,
    rate: float,
    *,
    n_fft: int = 2048,
    hop: int = 512,
) -> jnp.ndarray:
    """Time-stretch by ``rate`` (>1 = faster/shorter) with a phase vocoder —
    the temporal mapper's stretch primitive (temporal_mapper.py:289-315),
    clipped by the caller to [0.7, 1.5].

    ``rate`` must be a static Python float (shape-defining).
    """
    real, imag = stft(x, n_fft, hop)
    n_frames = real.shape[-2]
    out_frames = max(2, int(n_frames / rate))

    # Sample positions in original frame index space
    t = np.arange(out_frames) * rate
    t0 = np.clip(np.floor(t).astype(np.int64), 0, n_frames - 2)
    frac = jnp.asarray((t - t0).astype(np.float32))[..., :, None]
    t0 = jnp.asarray(t0)

    mag = jnp.sqrt(real * real + imag * imag + 1e-12)
    phase = jnp.arctan2(imag, real)

    mag_a = jnp.take(mag, t0, axis=-2)
    mag_b = jnp.take(mag, t0 + 1, axis=-2)
    out_mag = (1 - frac) * mag_a + frac * mag_b

    # Phase advance accumulation
    omega = jnp.asarray(
        (2.0 * np.pi * hop * np.arange(n_fft // 2 + 1) / n_fft).astype(np.float32)
    )
    dphase = jnp.take(phase, t0 + 1, axis=-2) - jnp.take(phase, t0, axis=-2) - omega
    dphase = dphase - 2.0 * jnp.pi * jnp.round(dphase / (2.0 * jnp.pi))
    step = dphase + omega

    def acc(carry, s):
        new = carry + s
        return new, new

    first_phase = jnp.take(phase, t0[:1], axis=-2)
    _, acc_phases = jax.lax.scan(acc, first_phase[..., 0, :], jnp.moveaxis(step, -2, 0))
    out_phase = jnp.moveaxis(acc_phases, 0, -2)
    # keep the first frame's original phase
    out_phase = jnp.concatenate([first_phase, out_phase[..., 1:, :]], axis=-2)

    out_real = out_mag * jnp.cos(out_phase)
    out_imag = out_mag * jnp.sin(out_phase)
    return istft(out_real, out_imag, n_fft, hop)


# ------------------------------------------------------------------ features


def energy_envelope(x: jnp.ndarray, frame: int = 512, hop: int = 256) -> jnp.ndarray:
    """Frame RMS energy [..., frames] (VAD feature, temporal_mapper.py:64-126)."""
    from .stft import frame_signal

    frames = frame_signal(x, frame, hop, center=False)
    return jnp.sqrt(jnp.mean(frames**2, axis=-1) + 1e-12)


def spectral_centroid_rolloff(
    x: jnp.ndarray, *, sr: int = 16_000, n_fft: int = 1024, hop: int = 256,
    rolloff_pct: float = 0.85,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-frame spectral centroid (Hz) and rolloff (Hz) — the other two VAD
    features weighted 0.3/0.2 in the reference (temporal_mapper.py:88-104)."""
    real, imag = stft(x, n_fft, hop)
    mag = jnp.sqrt(real * real + imag * imag + 1e-12)
    freqs = jnp.asarray(np.linspace(0, sr / 2, n_fft // 2 + 1, dtype=np.float32))
    total = jnp.sum(mag, axis=-1)
    centroid = jnp.sum(mag * freqs, axis=-1) / jnp.maximum(total, 1e-8)
    cum = jnp.cumsum(mag, axis=-1)
    target = rolloff_pct * total[..., None]
    rolloff_idx = jnp.argmax(cum >= target, axis=-1)
    rolloff = jnp.take(freqs, rolloff_idx)
    return centroid, rolloff


def spectral_flatness(x: jnp.ndarray, *, n_fft: int = 1024, hop: int = 256) -> jnp.ndarray:
    """Per-frame flatness (geometric/arithmetic mean ratio) — music-detection
    feature (audio_processor.py:217-231)."""
    real, imag = stft(x, n_fft, hop)
    power = real * real + imag * imag + 1e-10
    log_mean = jnp.mean(jnp.log(power), axis=-1)
    return jnp.exp(log_mean) / jnp.mean(power, axis=-1)
