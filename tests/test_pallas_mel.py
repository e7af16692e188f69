"""Fused Pallas log-mel kernel vs the jnp reference (interpret mode on CPU)."""

import numpy as np

from expressive_speech_translation_tpu.ops import whisper_log_mel
from expressive_speech_translation_tpu.ops.pallas_mel import whisper_log_mel_pallas
import pytest

pytestmark = pytest.mark.quick


def _speechlike(seconds=3.0, sr=16000, seed=2):
    g = np.random.default_rng(seed)
    t = np.arange(int(sr * seconds)) / sr
    x = (
        0.4 * np.sin(2 * np.pi * 220 * t)
        + 0.2 * np.sin(2 * np.pi * 880 * t + 1.0)
        + 0.02 * g.standard_normal(t.shape)
    )
    # amplitude modulation to mimic syllables
    x *= 0.5 + 0.5 * np.sin(2 * np.pi * 3.0 * t) ** 2
    return x.astype(np.float32)


def test_pallas_log_mel_matches_reference():
    x = _speechlike()
    ref = np.asarray(whisper_log_mel(x))
    got = np.asarray(whisper_log_mel_pallas(x, interpret=True))
    assert got.shape == ref.shape == (80, 3000)
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_pallas_log_mel_128_mels():
    x = _speechlike(1.0)
    ref = np.asarray(whisper_log_mel(x, n_mels=128))
    got = np.asarray(whisper_log_mel_pallas(x, n_mels=128, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)
