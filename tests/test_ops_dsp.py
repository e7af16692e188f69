"""Tests for resample and DSP blocks (property-based golden checks)."""

import numpy as np
import pytest

from expressive_speech_translation_tpu import ops


def sine(freq, sr, seconds=1.0, amp=0.5):
    t = np.arange(int(sr * seconds)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


@pytest.mark.parametrize("orig,new", [(44100, 16000), (16000, 24000), (48000, 16000), (22050, 16000)])
def test_resample_preserves_tone(orig, new):
    x = sine(440.0, orig, 1.0)
    y = np.asarray(ops.resample(x, orig, new))
    assert y.shape[-1] == -(-x.shape[-1] * new // orig)
    # Dominant frequency must stay 440 Hz
    spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    peak_hz = np.argmax(spec) * new / len(y)
    assert abs(peak_hz - 440.0) < 2.0
    # Amplitude preserved within 2 %
    interior = y[len(y) // 4: -len(y) // 4]
    assert abs(interior.max() - 0.5) < 0.01


def test_resample_matches_scipy_bandlimited():
    """For a bandlimited signal both resamplers approximate the ideal one."""
    from scipy import signal as sps

    g = np.random.default_rng(3)
    x = g.standard_normal(16000).astype(np.float32)
    # Band-limit to < 6 kHz (below both Nyquists)
    sos = sps.butter(8, 6000, fs=16000, output="sos")
    x = sps.sosfiltfilt(sos, x).astype(np.float32)
    y = np.asarray(ops.resample(x, 16000, 8000 * 3 // 1))  # 16k→24k
    ref = sps.resample_poly(x, 3, 2).astype(np.float32)
    s = slice(200, -200)
    rel = np.linalg.norm(y[s] - ref[s]) / np.linalg.norm(ref[s])
    assert rel < 5e-3


def test_resample_identity():
    x = sine(100, 16000)
    assert ops.resample(x, 16000, 16000) is x


def test_preemphasis_and_dc():
    x = sine(440, 16000) + 0.3
    y = np.asarray(ops.remove_dc(x))
    assert abs(y.mean()) < 1e-6
    p = np.asarray(ops.preemphasis(x, 0.97))
    np.testing.assert_allclose(p[1:], x[1:] - 0.97 * x[:-1], atol=1e-6)


def test_peak_normalize():
    x = sine(440, 16000, amp=0.1)
    y = np.asarray(ops.peak_normalize(x, 0.95))
    assert abs(np.abs(y).max() - 0.95) < 1e-5


def test_silence_gate_zeroes_quiet_regions():
    loud = sine(440, 16000, 0.5, amp=0.5)
    quiet = sine(440, 16000, 0.5, amp=1e-4)
    x = np.concatenate([loud, quiet])
    y = np.asarray(ops.silence_gate(x, threshold_db=-40.0))
    assert np.abs(y[: len(loud) - 512]).max() > 0.4
    assert np.abs(y[len(loud) + 512:]).max() == 0.0


def test_stereo_to_mono_correlated_and_not():
    l = sine(440, 16000)
    # correlated → mid
    m = np.asarray(ops.stereo_to_mono(np.stack([l, l])))
    np.testing.assert_allclose(m, l, atol=1e-6)
    mono = np.asarray(ops.stereo_to_mono(l))
    np.testing.assert_allclose(mono, l)


def test_spectral_noise_gate_improves_snr():
    g = np.random.default_rng(11)
    # Speech-like structure: tone burst with leading/trailing pauses so the
    # noise profile can be estimated from the quiet frames (as in real speech).
    pause = np.zeros(8000, np.float32)
    clean = np.concatenate([pause, sine(440, 16000, 1.0), pause])
    noise = (0.02 * g.standard_normal(clean.shape)).astype(np.float32)
    noisy = clean + noise
    out = np.asarray(ops.spectral_noise_gate(noisy))
    assert out.shape == noisy.shape

    def snr(sig):
        s = slice(9000, 23000)  # the tone region
        err = sig[s] - clean[s]
        return 10 * np.log10(np.sum(clean[s] ** 2) / np.sum(err**2))

    assert snr(out) > snr(noisy) + 3.0  # at least 3 dB better
    # Pauses should be strongly attenuated
    assert np.abs(out[:7000]).mean() < 0.4 * np.abs(noisy[:7000]).mean()


def test_phase_vocoder_stretch_changes_length_not_pitch():
    x = sine(440, 16000, 2.0)
    y = np.asarray(ops.phase_vocoder_stretch(x, rate=1.25))
    assert y.shape[-1] < x.shape[-1]
    assert abs(y.shape[-1] - x.shape[-1] / 1.25) < 3000
    spec = np.abs(np.fft.rfft(y[2048:-2048] * np.hanning(len(y) - 4096)))
    peak_hz = np.argmax(spec) * 16000 / (len(y) - 4096)
    assert abs(peak_hz - 440.0) < 6.0


def test_energy_envelope_and_centroid():
    x = np.concatenate([sine(440, 16000, 0.5), np.zeros(8000, np.float32)])
    env = np.asarray(ops.energy_envelope(x))
    assert env[: len(env) // 3].mean() > 10 * env[-len(env) // 3:].mean()
    cent, roll = ops.spectral_centroid_rolloff(sine(1000, 16000))
    c = np.asarray(cent)
    assert abs(np.median(c) - 1000.0) < 150.0


def test_spectral_flatness_discriminates_noise_vs_tone():
    g = np.random.default_rng(5)
    noise = g.standard_normal(16000).astype(np.float32)
    tone = sine(440, 16000)
    f_noise = float(np.median(np.asarray(ops.spectral_flatness(noise))))
    f_tone = float(np.median(np.asarray(ops.spectral_flatness(tone))))
    assert f_noise > 0.3
    assert f_tone < 0.01


def test_loudness_normalize_moves_rms_toward_target():
    x = sine(440, 16000, amp=0.02)
    y = np.asarray(ops.loudness_normalize(x, target_lufs=-23.0))
    assert abs(float(ops.rms_db(y)) - (-23.0)) < 1.5


def test_ops_jit_on_8device_mesh():
    """ops must compile under jit with batch sharding on the virtual mesh."""
    import jax
    import jax.numpy as jnp

    from expressive_speech_translation_tpu.parallel import data_sharding, host_cpu_mesh

    mesh = host_cpu_mesh(8)
    x = jnp.asarray(np.stack([sine(300 + 50 * i, 16000, 0.5) for i in range(8)]))
    x = jax.device_put(x, data_sharding(mesh, 2))
    fn = jax.jit(lambda a: ops.whisper_log_mel(a))
    out = fn(x)
    assert out.shape == (8, 80, 3000)
    assert np.isfinite(np.asarray(out)).all()


# ----------------------------------------------- host (numpy) glue mirrors


class TestHostDspParity:
    """ops/host_dsp.py must mirror the JAX ops exactly — the serving post
    stage runs the host versions (per-request shapes vary; see module doc)."""

    def test_phase_vocoder_parity(self):
        import jax.numpy as jnp

        from expressive_speech_translation_tpu.ops.host_dsp import (
            phase_vocoder_stretch_np,
        )

        x = sine(220.0, 16000, 1.5) + 0.2 * sine(731.0, 16000, 1.5)
        for rate in (0.8, 1.0, 1.3):
            ref = np.asarray(ops.phase_vocoder_stretch(jnp.asarray(x), rate))
            got = phase_vocoder_stretch_np(x, rate)
            assert got.shape == ref.shape
            np.testing.assert_allclose(got, ref, atol=2e-3)

    def test_loudness_normalize_parity(self):
        import jax.numpy as jnp

        from expressive_speech_translation_tpu.ops.host_dsp import (
            loudness_normalize_np,
        )

        x = 0.02 * sine(300.0, 16000, 0.7)
        ref = np.asarray(ops.loudness_normalize(jnp.asarray(x), -23.0))
        got = loudness_normalize_np(x, -23.0)
        np.testing.assert_allclose(got, ref, atol=1e-5)

    @pytest.mark.parametrize("orig,new", [(24000, 16000), (22050, 16000), (16000, 24000)])
    def test_resample_parity(self, orig, new):
        import jax.numpy as jnp

        from expressive_speech_translation_tpu.ops.host_dsp import resample_np

        x = sine(440.0, orig, 0.9)
        ref = np.asarray(ops.resample(jnp.asarray(x), orig, new))
        got = resample_np(x, orig, new)
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=2e-4)
