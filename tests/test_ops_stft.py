"""Golden tests: STFT/iSTFT vs torch.stft, mel vs transformers WhisperFeatureExtractor."""

import numpy as np
import pytest

from expressive_speech_translation_tpu import ops

pytestmark = pytest.mark.quick

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def signal(rng=None):
    g = np.random.default_rng(7)
    t = np.arange(16000 * 2) / 16000.0
    x = (
        0.5 * np.sin(2 * np.pi * 440 * t)
        + 0.2 * np.sin(2 * np.pi * 1330 * t + 0.4)
        + 0.05 * g.standard_normal(t.shape)
    ).astype(np.float32)
    return x


@pytest.mark.parametrize("n_fft,hop", [(1024, 256), (512, 128), (400, 160), (2048, 512)])
def test_stft_matches_torch(signal, n_fft, hop):
    real, imag = ops.stft(signal, n_fft, hop)
    ref = torch.stft(
        torch.from_numpy(signal),
        n_fft,
        hop_length=hop,
        window=torch.hann_window(n_fft),
        center=True,
        pad_mode="reflect",
        return_complex=True,
    ).numpy()  # [bins, frames]
    np.testing.assert_allclose(np.asarray(real).T, ref.real, atol=2e-2, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(imag).T, ref.imag, atol=2e-2, rtol=1e-3)
    # relative Frobenius error should be tiny
    got = np.asarray(real).T + 1j * np.asarray(imag).T
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 1e-4


@pytest.mark.parametrize("n_fft,hop", [(1024, 256), (2048, 512)])
def test_istft_roundtrip(signal, n_fft, hop):
    real, imag = ops.stft(signal, n_fft, hop)
    recon = np.asarray(ops.istft(real, imag, n_fft, hop, length=len(signal)))
    # Edges are lossy with center padding; compare the interior
    s = slice(n_fft, len(signal) - n_fft)
    rel = np.linalg.norm(recon[s] - signal[s]) / np.linalg.norm(signal[s])
    assert rel < 1e-3


def test_stft_batched(signal):
    batch = np.stack([signal, signal * 0.5])
    real, imag = ops.stft(batch, 512, 128)
    single_r, _ = ops.stft(signal, 512, 128)
    assert real.shape[0] == 2
    np.testing.assert_allclose(np.asarray(real[0]), np.asarray(single_r), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(real[1]), 0.5 * np.asarray(single_r), rtol=1e-4, atol=1e-5)


def test_whisper_log_mel_matches_transformers(signal):
    from transformers import WhisperFeatureExtractor

    fe = WhisperFeatureExtractor()  # defaults: 80 mel, n_fft 400, hop 160
    ref = fe(signal, sampling_rate=16000, return_tensors="np")["input_features"][0]
    got = np.asarray(ops.whisper_log_mel(signal))
    assert got.shape == ref.shape  # [80, 3000]
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)


def test_whisper_log_mel_128(signal):
    from transformers import WhisperFeatureExtractor

    fe = WhisperFeatureExtractor(feature_size=128)
    ref = fe(signal, sampling_rate=16000, return_tensors="np")["input_features"][0]
    got = np.asarray(ops.whisper_log_mel(signal, n_mels=128))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)


def test_mel_filterbank_slaney_properties():
    fb = ops.mel_filterbank(16000, 400, 80)
    assert fb.shape == (201, 80)
    assert (fb >= 0).all()
    # Each filter must have support
    assert (fb.sum(axis=0) > 0).all()


def test_kaldi_fbank_shape_and_finite(signal):
    x24 = np.asarray(ops.resample(signal, 16000, 24000))
    feats = np.asarray(ops.kaldi_fbank(x24, sr=24000))
    # snip-edges framing: 1 + (T - 1920) // 480
    expected_frames = 1 + (len(x24) - 1920) // 480
    assert feats.shape == (expected_frames, 80)
    assert np.isfinite(feats).all()
    # Energy concentrated near 440/1330 Hz bins → variance across mels
    assert feats.std() > 0.5
