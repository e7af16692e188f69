"""Model-microservice facades: FastAPI-contract parity over Werkzeug."""

import io
import json

import numpy as np
import pytest
from werkzeug.test import Client

from expressive_speech_translation_tpu.media.wavio import read_wav, write_wav
from expressive_speech_translation_tpu.serve.model_services import (
    CosyVoiceService,
    MuseTalkService,
    OpenVoiceService,
    SimilarityService,
)

pytestmark = pytest.mark.quick


def wav_bytes(freq=220.0, seconds=1.0, sr=16000):
    import os, tempfile

    t = np.arange(int(sr * seconds)) / sr
    x = (0.4 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
    fd, path = tempfile.mkstemp(suffix=".wav")
    os.close(fd)
    write_wav(path, x, sr)
    data = open(path, "rb").read()
    os.unlink(path)
    return data


def test_cosyvoice_service_contract(tmp_path):
    svc = CosyVoiceService()
    client = Client(svc)
    # health before any load
    h = client.get("/health").get_json()
    assert h["status"] == "healthy" and h["models_loaded"] == []
    resp = client.post("/generate-speech/", data={
        "text": "hello from the service",
        "style_prompt": "calm",
        "reference_audio": (io.BytesIO(wav_bytes()), "ref.wav"),
    })
    assert resp.status_code == 200
    assert resp.mimetype == "audio/wav"
    assert resp.data[:4] == b"RIFF"
    # model registry: greek variant lazily loads
    client.post("/generate-speech/", data={"text": "γειά", "model": "greek"})
    assert set(client.get("/health").get_json()["models_loaded"]) == {"default", "greek"}
    # missing text → 400
    assert client.post("/generate-speech/", data={}).status_code == 400


class FakeVideoIO:
    def extract_audio(self, p):
        return np.zeros(16000, np.float32), 16000

    def mux(self, p, a, sr, o):
        open(o, "wb").write(b"MUXED" + bytes(2000))

    def lipsync(self, p, a, sr, o):
        open(o, "wb").write(b"LIPSYNCED" + bytes(2000))


class FailingLipsync(FakeVideoIO):
    def lipsync(self, p, a, sr, o):
        raise RuntimeError("no model")


def test_musetalk_service_contract_and_fallback():
    client = Client(MuseTalkService(video_io=FakeVideoIO()))
    resp = client.post("/lipsync-video/", data={
        "video": (io.BytesIO(b"vid" * 100), "in.mp4"),
        "audio": (io.BytesIO(wav_bytes()), "a.wav"),
    })
    assert resp.status_code == 200 and resp.mimetype == "video/mp4"
    assert resp.data.startswith(b"LIPSYNCED")
    # failure → mux fallback, still 200
    client2 = Client(MuseTalkService(video_io=FailingLipsync()))
    resp2 = client2.post("/lipsync-video/", data={
        "video": (io.BytesIO(b"v"), "in.mp4"),
        "audio": (io.BytesIO(wav_bytes()), "a.wav"),
    })
    assert resp2.data.startswith(b"MUXED")
    # missing audio → 400
    assert client.post("/lipsync-video/", data={
        "video": (io.BytesIO(b"v"), "in.mp4")}).status_code == 400


def test_similarity_service_contract():
    # cosine on raw-waveform proxy embeddings keeps the test hermetic+fast
    def scorer(a, b):
        n = min(len(a), len(b))
        return float(np.dot(a[:n], b[:n]) / (np.linalg.norm(a[:n]) * np.linalg.norm(b[:n]) + 1e-9))

    client = Client(SimilarityService(scorer=scorer))
    same = client.post("/compare-voices/", data={
        "audio1": (io.BytesIO(wav_bytes(220)), "a.wav"),
        "audio2": (io.BytesIO(wav_bytes(220)), "b.wav"),
    }).get_json()
    diff = client.post("/compare-voices/", data={
        "audio1": (io.BytesIO(wav_bytes(220)), "a.wav"),
        "audio2": (io.BytesIO(wav_bytes(333)), "b.wav"),
    }).get_json()
    assert same["similarity"] > 0.99
    assert diff["similarity"] < same["similarity"]
    assert len(same["request_id"]) == 8
    assert client.get("/health").get_json()["status"] == "healthy"


def test_openvoice_service_contract():
    def converter(src, src_sr, ref, ref_sr):
        return src * 0.5  # trivial converter for the contract test

    client = Client(OpenVoiceService(converter=converter))
    status = client.get("/status").get_json()
    assert status["status"] == "ready"
    assert status["native_sample_rate"] == 22050
    resp = client.post("/clone-voice", data={
        "source_audio": (io.BytesIO(wav_bytes(220)), "s.wav"),
        "reference_audio": (io.BytesIO(wav_bytes(300)), "r.wav"),
    })
    assert resp.status_code == 200 and resp.data[:4] == b"RIFF"
    assert client.post("/clone-voice", data={
        "source_audio": (io.BytesIO(wav_bytes()), "s.wav")}).status_code == 400


def test_cosyvoice_service_streaming():
    """stream=true → chunked WAV: unbounded RIFF header + PCM16 whose decoded
    samples match the non-streaming synthesis of the same text."""
    svc = CosyVoiceService()
    client = Client(svc)
    text = "streaming hello"
    resp = client.post("/generate-speech/", data={"text": text, "stream": "true"})
    assert resp.status_code == 200 and resp.mimetype == "audio/wav"
    data = resp.data
    assert data[:4] == b"RIFF" and data[4:8] == b"\xff\xff\xff\xff"
    assert data[36:40] == b"data" and data[40:44] == b"\xff\xff\xff\xff"
    pcm = np.frombuffer(data[44:], "<i2").astype(np.float32) / 32767.0
    ref = svc.get_model("default").synthesize(text)
    assert len(pcm) == len(ref)
    np.testing.assert_allclose(pcm, np.clip(ref, -1, 1), atol=1e-3)
