"""Mel filterbanks and log-mel frontends.

Two consumers with different conventions, both reproduced exactly:

- **Whisper ASR frontend**: librosa-style slaney-scale slaney-normed triangular
  filters, n_fft=400, hop=160, 80 (or 128) mels at 16 kHz; log10, max-8dB floor,
  (x+4)/4 normalisation. Parity target: transformers' WhisperFeatureExtractor.
- **Kaldi-style fbank** for CosyVoice speech-token/mel features: povey window,
  snip-edges framing, HTK mel scale, n_fft=1920, hop=480, 80 mels at 24 kHz
  (greek_sft.yaml:55-63).

Filterbank matrices are numpy constants baked into compiled graphs; the
mel projection itself is one [frames, n_bins] @ [n_bins, n_mels] matmul (MXU).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax.numpy as jnp
import numpy as np

from .stft import frame_signal, spectrogram
from .windows import povey


def hz_to_mel(freq, *, htk: bool = False):
    freq = np.asarray(freq, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + freq / 700.0)
    # Slaney: linear below 1 kHz, log above
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (freq - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(freq >= min_log_hz, min_log_mel + np.log(np.maximum(freq, 1e-10) / min_log_hz) / logstep, mels)


def mel_to_hz(mels, *, htk: bool = False):
    mels = np.asarray(mels, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (mels / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(mels >= min_log_mel, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs)


@functools.lru_cache(maxsize=16)
def mel_filterbank(
    sr: int,
    n_fft: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
    *,
    htk: bool = False,
    norm: Optional[str] = "slaney",
) -> np.ndarray:
    """librosa.filters.mel-compatible triangular filterbank, [n_bins, n_mels]."""
    fmax = fmax if fmax is not None else sr / 2.0
    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sr / 2.0, n_bins)
    mel_pts = np.linspace(hz_to_mel(fmin, htk=htk), hz_to_mel(fmax, htk=htk), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts, htk=htk)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    if norm == "slaney":
        enorm = 2.0 / (hz_pts[2: n_mels + 2] - hz_pts[:n_mels])
        weights *= enorm[:, None]
    return weights.T.astype(np.float32)  # [n_bins, n_mels]


# ----------------------------------------------------------- whisper frontend

WHISPER_N_FFT = 400
WHISPER_HOP = 160
WHISPER_SR = 16_000
WHISPER_CHUNK_SECONDS = 30
WHISPER_SAMPLES = WHISPER_SR * WHISPER_CHUNK_SECONDS  # 480_000
WHISPER_FRAMES = WHISPER_SAMPLES // WHISPER_HOP       # 3000


def whisper_log_mel(
    audio: jnp.ndarray, *, n_mels: int = 80, pad_to_chunk: bool = True,
    chunk_samples: int = WHISPER_SAMPLES,
) -> jnp.ndarray:
    """Whisper-compatible log-mel: [..., T] → [..., n_mels, frames].

    Matches openai-whisper ``log_mel_spectrogram`` / transformers
    WhisperFeatureExtractor: hann(400), hop 160, reflect-centered, power
    spectrogram with the final frame dropped, slaney mel, log10 clamped at
    1e-10, floored at (max - 8), then (x + 4) / 4. ``chunk_samples`` restricts
    the 30 s window for bucketed serving (see ops/pallas_mel.py).
    """
    if pad_to_chunk:
        deficit = chunk_samples - audio.shape[-1]
        if deficit < 0:
            audio = audio[..., :chunk_samples]
        elif deficit > 0:
            audio = jnp.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(0, deficit)])
    power = spectrogram(audio, WHISPER_N_FFT, WHISPER_HOP, center=True, power=2.0)
    power = power[..., :-1, :]  # whisper drops the last frame
    fb = jnp.asarray(mel_filterbank(WHISPER_SR, WHISPER_N_FFT, n_mels))
    mel = jnp.maximum(power @ fb, 1e-10)
    log_spec = jnp.log10(mel)
    peak = jnp.max(log_spec, axis=(-2, -1), keepdims=True)
    log_spec = jnp.maximum(log_spec, peak - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    return jnp.swapaxes(log_spec, -1, -2)  # [..., n_mels, frames]


# ------------------------------------------------------------- kaldi fbank

def kaldi_fbank(
    audio: jnp.ndarray,
    *,
    sr: int = 24_000,
    n_mels: int = 80,
    frame_length_ms: float = 80.0,   # 1920 samples at 24 kHz (greek_sft.yaml:60)
    frame_shift_ms: float = 20.0,    # 480 samples
    dither: float = 0.0,             # must be 0 — see guard below
    preemphasis: float = 0.97,
    remove_dc: bool = True,
    fmin: float = 20.0,
    fmax: Optional[float] = None,
    log_floor: float = 1.1920928955078125e-07,  # kaldi EPSILON
) -> jnp.ndarray:
    """Kaldi/torchaudio-compliance-style fbank: [..., T] → [..., frames, n_mels].

    Snip-edges framing, per-frame DC removal, pre-emphasis with edge
    replication, povey window, power spectrum, HTK-scale mel (no norm), ln.
    """
    if dither:
        # silently ignoring a requested dither would fake Kaldi parity for
        # pipelines configured with it; implementing it needs a PRNG key —
        # add one if a converted checkpoint ever requires dithered features
        raise NotImplementedError("kaldi_fbank: dither is not implemented; "
                                  "pass dither=0.0 (the CosyVoice setting)")
    frame_len = int(sr * frame_length_ms / 1000.0)
    hop = int(sr * frame_shift_ms / 1000.0)
    n_fft = 1 << (frame_len - 1).bit_length()  # next pow2, kaldi round_to_power_of_two

    frames = frame_signal(audio, frame_len, hop, center=False)
    if remove_dc:
        frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    if preemphasis:
        prev = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
        frames = frames - preemphasis * prev
    frames = frames * jnp.asarray(povey(frame_len))
    pad = n_fft - frame_len
    if pad:
        frames = jnp.pad(frames, [(0, 0)] * (frames.ndim - 1) + [(0, pad)])

    from .stft import _dft_bases

    cos_b, sin_b = _dft_bases(n_fft)
    real = frames @ jnp.asarray(cos_b)
    imag = frames @ jnp.asarray(sin_b)
    power = real * real + imag * imag

    fb = jnp.asarray(
        mel_filterbank(sr, n_fft, n_mels, fmin=fmin, fmax=fmax, htk=True, norm=None)
    )
    mel = jnp.maximum(power @ fb, log_floor)
    return jnp.log(mel)
