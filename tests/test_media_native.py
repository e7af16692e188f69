"""C++ libav shim tests (skipped when the .so isn't built)."""

import numpy as np
import pytest

from expressive_speech_translation_tpu.media import native
from expressive_speech_translation_tpu.media.wavio import read_wav, write_wav

pytestmark = [pytest.mark.skipif(not native.available(), reason="native shim not built"), pytest.mark.quick]

# input_video_short.mov was stripped from the reference (.MISSING_LARGE_BLOBS);
# this committed frontend asset is a real H.264 MP4 with audio.
VIDEO_FIXTURE = "/root/reference/Frontend/public/videos/man-speaking-into-the-microphone.mp4"


def tone(freq=440.0, seconds=1.0, sr=16000):
    t = np.arange(int(sr * seconds)) / sr
    return (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_decode_wav_matches_pure_python(tmp_path):
    x = tone()
    p = tmp_path / "t.wav"
    write_wav(p, x, 16000)
    a_native, sr_n = native.decode_audio(p)
    a_py, sr_p = read_wav(p)
    assert sr_n == sr_p == 16000
    np.testing.assert_allclose(a_native, a_py, atol=1e-4)


def test_decode_real_fixture_and_resample():
    audio, sr = native.decode_audio("/root/reference/Backend/harvard.wav")
    assert sr == 44100
    assert audio.shape[0] == 2  # stereo
    mono16, sr16 = native.decode_audio(
        "/root/reference/Backend/harvard.wav", target_rate=16000, target_channels=1
    )
    assert sr16 == 16000
    assert mono16.ndim == 1
    assert abs(len(mono16) - audio.shape[1] * 16000 / 44100) < 200


def test_decode_mov_video_fixture():
    frames, fps = native.decode_video(
        VIDEO_FIXTURE, max_frames=10
    )
    assert frames.shape[0] == 10
    assert frames.shape[3] == 3
    assert 10 < fps < 70
    assert frames.dtype == np.uint8
    # real video content: frames vary
    assert frames.std() > 1.0


def test_extract_audio_from_video(tmp_path):
    # the committed MP4 fixture has no audio track; build a video WITH audio
    # through our own encoder, then extract through the decode path
    g = np.random.default_rng(1)
    frames = g.uniform(0, 255, (24, 48, 48, 3)).astype(np.uint8)
    vid = tmp_path / "with_audio.mp4"
    native.encode_video(vid, frames, fps=24.0, audio=tone(310.0, 1.0), audio_rate=16000)
    audio, sr = native.decode_audio(vid, target_rate=16000, target_channels=1)
    assert sr == 16000
    assert len(audio) > 12000
    assert float(np.abs(audio).max()) > 0.01

    # and the real fixture cleanly reports its missing audio
    from expressive_speech_translation_tpu.core.errors import MediaError

    with pytest.raises(MediaError, match="no audio stream"):
        native.decode_audio(VIDEO_FIXTURE, target_rate=16000, target_channels=1)


def test_encode_and_mux_roundtrip(tmp_path):
    # encode video from synthetic frames + tone
    g = np.random.default_rng(0)
    frames = (g.uniform(0, 255, (12, 64, 64, 3))).astype(np.uint8)
    vid = tmp_path / "v.mp4"
    native.encode_video(vid, frames, fps=12.0, audio=tone(seconds=1.0), audio_rate=16000)
    assert vid.stat().st_size > 1000

    back, fps = native.decode_video(vid)
    assert back.shape[0] >= 10
    assert abs(fps - 12.0) < 1.0

    # mux: replace audio with a different tone
    out = tmp_path / "muxed.mp4"
    native.mux_audio_video(vid, tone(220.0, 1.0), 16000, out)
    assert out.stat().st_size > 1000
    audio, sr = native.decode_audio(out, target_rate=16000, target_channels=1)
    # dominant frequency of the recovered audio is 220 Hz
    spec = np.abs(np.fft.rfft(audio * np.hanning(len(audio))))
    peak_hz = np.argmax(spec) * sr / len(audio)
    assert abs(peak_hz - 220.0) < 8.0


def test_encode_audio_formats(tmp_path):
    x = tone(330.0)
    for ext in (".wav", ".m4a"):
        p = tmp_path / f"a{ext}"
        try:
            native.encode_audio(p, x, 16000)
        except Exception:
            if ext == ".wav":
                raise
            pytest.skip(f"no encoder for {ext}")
        back, sr = native.decode_audio(p, target_rate=16000, target_channels=1)
        spec = np.abs(np.fft.rfft(back[1000:-1000] * np.hanning(len(back) - 2000)))
        peak_hz = np.argmax(spec) * sr / (len(back) - 2000)
        assert abs(peak_hz - 330.0) < 10.0, ext


def test_missing_file_clean_error(tmp_path):
    from expressive_speech_translation_tpu.core.errors import MediaError

    with pytest.raises(MediaError) as e:
        native.decode_audio(tmp_path / "nope.mp3")
    assert "cannot open" in str(e.value)
