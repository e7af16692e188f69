"""Audio DSP compute path: STFT, mel, resample, EQ — jnp + Pallas kernels."""

from .dsp import (
    energy_envelope,
    loudness_normalize,
    peak_normalize,
    phase_vocoder_stretch,
    preemphasis,
    remove_dc,
    rms_db,
    silence_gate,
    soft_limit,
    spectral_centroid_rolloff,
    spectral_enhance,
    spectral_flatness,
    spectral_noise_gate,
    stereo_to_mono,
)
from .mel import kaldi_fbank, mel_filterbank, whisper_log_mel
from .resample import resample
from .stft import frame_signal, istft, num_frames, spectrogram, stft

__all__ = [
    "energy_envelope",
    "frame_signal",
    "istft",
    "kaldi_fbank",
    "loudness_normalize",
    "mel_filterbank",
    "num_frames",
    "peak_normalize",
    "phase_vocoder_stretch",
    "preemphasis",
    "remove_dc",
    "resample",
    "rms_db",
    "silence_gate",
    "soft_limit",
    "spectral_centroid_rolloff",
    "spectral_enhance",
    "spectral_flatness",
    "spectral_noise_gate",
    "spectrogram",
    "stereo_to_mono",
    "stft",
    "whisper_log_mel",
]
