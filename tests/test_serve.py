"""HTTP facade tests via the Werkzeug test client (route/JSON/SSE contracts)."""

import base64
import io
import json

import numpy as np
import pytest
from werkzeug.test import Client

from expressive_speech_translation_tpu.core.config import AppConfig, load_config
from expressive_speech_translation_tpu.media.wavio import read_wav, write_wav
from expressive_speech_translation_tpu.pipeline.backend import TranslationManager
from expressive_speech_translation_tpu.pipeline.cascaded import CascadedBackend
from expressive_speech_translation_tpu.pipeline.engines import fake_engines
from expressive_speech_translation_tpu.serve.app import create_app

pytestmark = pytest.mark.quick


def wav_bytes(seconds=2.0, sr=16000, seed=0):
    import tempfile, os

    g = np.random.default_rng(seed)
    t = np.arange(int(sr * seconds)) / sr
    x = (0.4 * np.sin(2 * np.pi * 220 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t) ** 2)
         + 0.01 * g.standard_normal(t.shape)).astype(np.float32)
    fd, path = tempfile.mkstemp(suffix=".wav")
    os.close(fd)
    write_wav(path, x, sr)
    data = open(path, "rb").read()
    os.unlink(path)
    return data


class FakeVideoIO:
    def extract_audio(self, video_path):
        g = np.random.default_rng(1)
        t = np.arange(32000) / 16000
        return (0.3 * np.sin(2 * np.pi * 300 * t) + 0.01 * g.standard_normal(len(t))).astype(np.float32), 16000

    def mux(self, video_path, audio, sr, out_path):
        open(out_path, "wb").write(b"MUXED" + bytes(2000))

    def lipsync(self, video_path, audio, sr, out_path):
        open(out_path, "wb").write(b"LIPSYNCED" + bytes(2000))


class FailingLipsyncIO(FakeVideoIO):
    def lipsync(self, video_path, audio, sr, out_path):
        raise RuntimeError("lipsync model unavailable")


@pytest.fixture()
def client():
    app = create_app(video_io=FakeVideoIO())
    return Client(app)


def test_translate_route_contract(client):
    resp = client.post(
        "/translate",
        data={
            "file": (io.BytesIO(wav_bytes()), "test.wav"),
            "target_language": "fra",
        },
    )
    assert resp.status_code == 200, resp.get_data(as_text=True)
    body = resp.get_json()
    assert set(body) >= {"audio", "transcripts", "request_id"}
    # returned audio is a valid base64 wav
    raw = base64.b64decode(body["audio"])
    assert raw[:4] == b"RIFF"
    assert body["transcripts"]["target"].startswith("[fra_Latn]")


def test_translate_requires_target_language(client):
    resp = client.post("/translate", data={"file": (io.BytesIO(wav_bytes()), "t.wav")})
    assert resp.status_code == 400
    assert "target_language" in resp.get_json()["error"]


def test_translate_rejects_bad_format(client):
    resp = client.post(
        "/translate",
        data={"file": (io.BytesIO(b"x"), "evil.exe"), "target_language": "fra"},
    )
    assert resp.status_code == 400
    assert "Unsupported format" in resp.get_json()["error"]


def test_translate_wrong_content_type(client):
    resp = client.post("/translate", data="rawbody", content_type="text/plain")
    assert resp.status_code == 400


def test_supported_languages_and_backends(client):
    resp = client.get("/supported-languages")
    assert resp.status_code == 200
    assert "fra" in resp.get_json()["languages"]
    resp = client.get("/available-backends")
    body = resp.get_json()
    assert body["default"] == "cascaded"
    assert "cascaded" in body["backends"]
    # selection-time decode provenance rides along with weight provenance
    assert "decode" in body and "cascaded" in body["decode"]


def test_health_and_status(client):
    # uninitialized → 503; after a translate it is initialized → 200
    r0 = client.get("/health/model")
    assert r0.status_code == 503
    client.post("/translate", data={
        "file": (io.BytesIO(wav_bytes()), "t.wav"), "target_language": "fra"})
    r1 = client.get("/health/model")
    assert r1.status_code == 200
    body = r1.get_json()
    assert body["healthy"] is True
    # decode-mode surface rides along with weights/placement (fake engines
    # report no decode attributes → {} or per-stage defaults)
    assert "decode" in body
    status = client.get("/translation-service-status").get_json()
    assert status["status"] == "ok"
    assert status["backends"]["cascaded"]["initialized"] is True


def test_process_video_sse_stream(client):
    resp = client.post(
        "/process-video",
        data={
            "file": (io.BytesIO(b"fakevideo" * 100), "clip.mp4"),
            "target_language": "fra",
        },
    )
    assert resp.status_code == 200
    assert resp.mimetype == "text/event-stream"
    frames = [json.loads(line[6:]) for line in resp.get_data(as_text=True).split("\n\n") if line.startswith("data: ")]
    progresses = [f["progress"] for f in frames]
    assert progresses[:5] == [10, 20, 30, 55, 60]
    final = frames[-1]
    assert final["progress"] == 100
    video = base64.b64decode(final["result"]["video"])
    assert video.startswith(b"LIPSYNCED")
    assert "transcripts" in final["result"]


def test_process_video_lipsync_fallback():
    app = create_app(video_io=FailingLipsyncIO())
    client = Client(app)
    resp = client.post(
        "/process-video",
        data={"file": (io.BytesIO(b"v" * 100), "c.mp4"), "target_language": "fra"},
    )
    frames = [json.loads(l[6:]) for l in resp.get_data(as_text=True).split("\n\n") if l.startswith("data: ")]
    final = frames[-1]
    video = base64.b64decode(final["result"]["video"])
    assert video.startswith(b"MUXED")  # audio-dub fallback (video_routes.py:286-293)


def test_video_too_large():
    cfg = load_config(env={}, **{"audio.max_video_mb": 0.001})
    app = create_app(config=cfg, video_io=FakeVideoIO())
    resp = Client(app).post(
        "/process-video",
        data={"file": (io.BytesIO(b"v" * 10000), "c.mp4"), "target_language": "fra"},
    )
    assert resp.status_code == 400


def test_audio_url_policy(client):
    for url, ok in [
        ("https://open.spotify.com/track/xyz", False),
        ("https://www.netflix.com/watch/1", False),
        ("ftp://youtube.com/x", False),
        ("https://example.org/audio.mp3", False),
    ]:
        resp = client.post(
            "/process-audio-url",
            json={"url": url, "target_language": "fra"},
        )
        assert resp.status_code == 400, url
    # allowed platform but yt-dlp absent on this host → clean MediaError (400)
    resp = client.post(
        "/process-audio-url",
        json={"url": "https://www.youtube.com/watch?v=abc", "target_language": "fra"},
    )
    assert resp.status_code == 400
    assert "yt-dlp" in resp.get_json()["error"]


def test_audio_url_with_fetcher():
    def fetcher(url):
        t = np.arange(16000) / 16000
        return (0.3 * np.sin(2 * np.pi * 250 * t)).astype(np.float32) + np.float32(0.01) * np.random.default_rng(0).standard_normal(16000).astype(np.float32), 16000

    app = create_app(video_io=FakeVideoIO(), url_fetcher=fetcher)
    resp = Client(app).post(
        "/process-audio-url",
        json={"url": "https://youtu.be/abc", "target_language": "deu"},
    )
    assert resp.status_code == 200
    assert "audio" in resp.get_json()


def test_podcast_upload(client):
    resp = client.post(
        "/upload_podcast",
        data={"file": (io.BytesIO(wav_bytes(3.0)), "pod.wav")},
    )
    assert resp.status_code == 200
    body = resp.get_json()
    assert body["status"] == "uploaded"
    assert abs(body["duration_seconds"] - 3.0) < 0.1
    assert len(body["podcast_id"]) == 32


def test_rate_limit_translate():
    cfg = load_config(env={}, **{"serve.translate_limit": "2 per minute",
                                 "serve.default_limits": ()})
    app = create_app(config=cfg, video_io=FakeVideoIO())
    client = Client(app)
    payload = lambda: {"file": (io.BytesIO(wav_bytes()), "t.wav"), "target_language": "fra"}
    assert client.post("/translate", data=payload()).status_code == 200
    assert client.post("/translate", data=payload()).status_code == 200
    resp = client.post("/translate", data=payload())
    assert resp.status_code == 429
    assert "Rate limit" in resp.get_json()["error"]


def test_cors_headers():
    app = create_app(video_io=FakeVideoIO())
    client = Client(app)
    resp = client.get("/available-backends", headers={"Origin": "http://localhost:3000"})
    assert resp.headers.get("Access-Control-Allow-Origin") == "http://localhost:3000"
    resp2 = client.get("/available-backends", headers={"Origin": "http://evil.example"})
    assert "Access-Control-Allow-Origin" not in resp2.headers


def test_unknown_route_404(client):
    assert client.get("/nope").status_code == 404


def test_error_ids_stable(client):
    r1 = client.post("/translate", data={"file": (io.BytesIO(b"z"), "a.exe"), "target_language": "x"})
    assert r1.status_code == 400
    assert len(r1.get_json()["error_id"]) == 8


def test_translate_streaming_sse():
    """POST /translate with stream=true → SSE: transcripts event, PCM16
    audio_chunk events, terminal done event."""
    import base64 as b64
    import json as jsonlib

    from expressive_speech_translation_tpu.serve.app import create_app

    app = create_app()
    client = Client(app)
    resp = client.post("/translate", data={
        "target_language": "fra",
        "stream": "true",
        "audio": (io.BytesIO(wav_bytes()), "in.wav"),
    })
    assert resp.status_code == 200
    assert resp.mimetype == "text/event-stream"
    frames = [jsonlib.loads(line[len("data: "):])
              for line in resp.get_data(as_text=True).splitlines()
              if line.startswith("data: ")]
    assert frames[0]["phase"] == "Translating speech"
    assert "source" in frames[0]["transcripts"]
    chunks = [f for f in frames if "audio_chunk" in f]
    assert chunks and all(f["sample_rate"] == 16_000 for f in chunks)
    pcm = b64.b64decode(chunks[0]["audio_chunk"])
    assert len(pcm) % 2 == 0 and len(pcm) > 0
    assert frames[-1].get("done") is True


def test_translate_streaming_sse_concurrent():
    """Two simultaneous stream=1 requests must not cross wires: each SSE
    stream carries its own transcripts and audio, fully framed (threaded
    serving is the production mode, app.py:523 parity)."""
    import json as jsonlib
    import threading

    from expressive_speech_translation_tpu.serve.app import create_app

    app = create_app()
    results, errors = [None, None], []

    def one(i):
        try:
            client = Client(app)
            resp = client.post("/translate", data={
                "target_language": "fra",
                "stream": "true",
                "audio": (io.BytesIO(wav_bytes()), f"in{i}.wav"),
            })
            assert resp.status_code == 200
            frames = [jsonlib.loads(line[len("data: "):])
                      for line in resp.get_data(as_text=True).splitlines()
                      if line.startswith("data: ")]
            results[i] = frames
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=one, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errors, errors[:1]
    for frames in results:
        assert frames is not None
        assert any("transcripts" in f for f in frames)
        assert any("audio_chunk" in f for f in frames)
        assert frames[-1].get("done") is True


@pytest.mark.slow


def test_engine_config_wiring(monkeypatch):
    """create_app builds engines per config.engines; the server entrypoint
    default is jax, embedded default stays fake (hermetic tests)."""
    from expressive_speech_translation_tpu.core.config import AppConfig, EngineConfig
    from expressive_speech_translation_tpu.serve.app import create_app

    app = create_app()  # embedded default: fake engines
    b = app.manager.get_backend()
    assert b.engines.weights_info() == "fake"

    import dataclasses

    cfg = AppConfig(engines=EngineConfig(mode="jax", scale="toy",
                                         asr_context_buckets=(2, 4)))
    app2 = create_app(config=cfg)
    b2 = app2.manager.get_backend()
    assert b2.engines.weights_info() == "random"  # jax engines, random weights
    assert b2.engines.asr.context_buckets == (2, 4)

    with pytest.raises(ValueError, match="unknown engine mode"):
        create_app(config=AppConfig(engines=EngineConfig(mode="bogus")))


def test_engine_config_env_overrides(monkeypatch):
    from expressive_speech_translation_tpu.core.config import load_config

    monkeypatch.setenv("EST_ENGINES__MODE", "fake")
    monkeypatch.setenv("EST_ENGINES__SCALE", "toy")
    monkeypatch.setenv("EST_ENGINES__ASR_CONTEXT_BUCKETS", "4,10")
    cfg = load_config()
    assert cfg.engines.mode == "fake"
    assert cfg.engines.scale == "toy"
    assert cfg.engines.asr_context_buckets == (4, 10)


def test_podcast_persistence_roundtrip(client):
    """podcast_routes.py:17-95 parity + retrieval: upload persists the file
    under a UUID name; list → metadata → raw-audio fetch round-trips."""
    raw = wav_bytes(2.0)
    resp = client.post(
        "/upload_podcast",
        data={"file": (io.BytesIO(raw), "show.wav"), "title": "My Show"},
    )
    assert resp.status_code == 200
    body = resp.get_json()
    assert body["title"] == "My Show"
    assert body["duration"] == "00:02"
    assert body["filepath"].endswith("_show.wav")
    pid = body["podcast_id"]

    listed = client.get("/podcasts").get_json()["podcasts"]
    assert any(p["id"] == pid for p in listed)

    meta = client.get(f"/podcasts/{pid}").get_json()
    assert meta["filename"] == "show.wav"

    audio = client.get(f"/podcasts/{pid}/audio")
    assert audio.status_code == 200
    assert audio.data == raw  # byte-exact original upload

    # unknown / malformed ids are 400s, not 500s
    assert client.get("/podcasts/" + "0" * 32).status_code == 400
    assert client.get("/podcasts/../etc/passwd").status_code in (400, 404)


def test_podcast_store_json_named_upload(tmp_path):
    """An upload whose sanitized filename ends in .json must not collide
    with the metadata sidecar scheme (sidecars are {id}.meta.json)."""
    from expressive_speech_translation_tpu.serve.podcasts import PodcastStore

    store = PodcastStore(tmp_path)
    meta = store.save(b"\x00\x01binary", "notes.json", duration_seconds=1.0)
    got, audio_path = store.get(meta["id"])
    assert got["filename"] == "notes.json"
    assert audio_path.read_bytes() == b"\x00\x01binary"
    episodes = store.list()
    assert len(episodes) == 1 and episodes[0]["id"] == meta["id"]
    assert episodes[0]["episode"] == "1"


def test_podcast_store_legacy_sidecars(tmp_path):
    """Pre-rename uploads ({id}_{fname}.json next to {id}_{fname}) stay
    listed after an upgrade, and new episode numbers count them — no
    duplicate episode numbers across schemes."""
    import json as _json

    from expressive_speech_translation_tpu.serve.podcasts import PodcastStore

    legacy_id = "a" * 32
    (tmp_path / f"{legacy_id}_old.wav").write_bytes(b"RIFFlegacy")
    (tmp_path / f"{legacy_id}_old.wav.json").write_text(
        _json.dumps({"id": legacy_id, "episode": "1", "filename": "old.wav"}))
    # a stray non-podcast json (no 32-hex prefix / no audio twin) is ignored
    (tmp_path / "random_notes.json").write_text("{}")

    store = PodcastStore(tmp_path)
    listed = store.list()
    assert [p["id"] for p in listed] == [legacy_id]
    meta = store.save(b"\x00new", "new.wav", duration_seconds=1.0)
    assert meta["episode"] == "2"  # counts the legacy entry
    ids = {p["id"] for p in store.list()}
    assert ids == {legacy_id, meta["id"]}
    got, audio = store.get(legacy_id)
    assert audio.read_bytes() == b"RIFFlegacy"


def test_translate_text_route(client):
    """Text-mode TranslateTool endpoint: NLLB translation + optional TTS
    (simple_translate_tts.py capability over HTTP, SURVEY §2.18)."""
    resp = client.post("/translate-text", json={
        "text": "hello world", "source_language": "eng",
        "target_language": "fra", "synthesize": True,
    })
    assert resp.status_code == 200
    body = resp.get_json()
    assert body["source_text"] == "hello world"
    assert body["target_text"]
    assert "audio" in body and len(body["audio"]) > 100

    # text-only (no synthesis)
    resp2 = client.post("/translate-text", json={
        "text": "good morning", "target_language": "deu",
    })
    assert resp2.status_code == 200
    assert "audio" not in resp2.get_json()

    # validation
    assert client.post("/translate-text", json={"text": ""}).status_code == 400
    assert client.post("/translate-text",
                       json={"text": "x"}).status_code == 400  # no target


def test_spa_serves_all_reference_views(client):
    """Frontend component parity (SURVEY §2.17): the served SPA carries the
    studio flow, the VideoSyncInterface-equivalent dubbing view (36-language
    picker, cloning toggle, backend select), the text TranslateTool, the
    analytics dashboard, podcasts, and pricing."""
    html = client.get("/").data.decode()
    for anchor in ("view-home", "home-start", "view-studio", "view-dub",
                   "view-text", "view-analytics",
                   "view-podcasts", "view-pricing", "dub-langs", "dub-clone",
                   "dub-backend", "tt-text", "tt-speak"):
        assert anchor in html, f"SPA missing {anchor}"
    js = client.get("/static/app.js").data.decode()
    assert js.count('["') > 30  # language table present
    assert "DUB_LANGUAGES" in js and "/translate-text" in js
    # the 36-language VideoSyncInterface list (VideoSyncInterface.js:10-49)
    import re

    langs = re.search(r"DUB_LANGUAGES = \[(.*?)\];", js, re.S).group(1)
    codes = re.findall(r'\["([a-z_A-Z]+)",', langs)
    # the reference ships 35 languages (VideoSyncInterface.js:10-49 — 9
    # common-first + 26 alphabetical)
    assert len(codes) == 35, f"expected 35 dubbing languages, got {len(codes)}"
    assert {"fra", "cmn_Hant", "vie", "cym", "uzn"} <= set(codes)
    # client-side upload validation + link guidance (useTranslation.js:111-133,
    # audioUtils.js, LinkSection.js:22-28)
    assert "AUDIO_EXTENSIONS" in js and "File size exceeds 50MB limit" in js
    # streaming studio flow (SSE stream=1 consumer: live transcripts + audio)
    assert "stream-toggle" in html
    assert "runAudioStreaming" in js and "wavB64FromPcm" in js
    assert js.count("runAudioStreaming") >= 2  # defined AND dispatched
    assert "spotify.com" in js and "Received empty audio data" in js
    # staged progress messages on the non-SSE audio path (useTranslation.js:26-33)
    assert "Analyzing speech patterns..." in js and "Translation complete!" in js


def test_use_voice_cloning_flag_reaches_tts(client):
    """The dub view's toggle is functional end-to-end: with
    use_voice_cloning=false the TTS engine receives NO cloning reference
    (app.py:358 form-flag parity, wired through the cascaded backend)."""
    calls = []
    # fresh app so we can spy on the tts engine
    from expressive_speech_translation_tpu.core.config import AppConfig, EngineConfig
    from expressive_speech_translation_tpu.serve.app import create_app

    app = create_app(config=AppConfig(engines=EngineConfig(mode="fake")),
                     video_io=FakeVideoIO())
    tts = app.manager.get_backend("cascaded").engines.tts
    orig = tts.synthesize

    def spy(text, **kw):
        calls.append(kw.get("reference_audio_16k") is not None)
        return orig(text, **kw)

    tts.synthesize = spy
    c = Client(app)
    for flag, expect_ref in (("false", False), ("true", True)):
        calls.clear()
        resp = c.post("/process-video", data={
            "file": (io.BytesIO(b"v" * 100), "c.mp4"),
            "target_language": "fra", "use_voice_cloning": flag,
        })
        assert resp.status_code == 200
        resp.get_data()  # drain the SSE stream so the pipeline runs
        assert calls and calls[0] is expect_ref, (flag, calls)


def _sse_frames(resp):
    return [json.loads(line[6:]) for line in
            resp.get_data(as_text=True).split("\n\n") if line.startswith("data: ")]


class Mp4VideoIO(FakeVideoIO):
    """Writes outputs with a real ISO-BMFF header so the MP4 watermark
    applies, and records the paths it was handed."""

    def __init__(self):
        self.mux_args = None

    def mux(self, video_path, audio, sr, out_path):
        self.mux_args = (video_path, out_path)
        open(out_path, "wb").write(
            b"\x00\x00\x00\x18ftypisom\x00\x00\x02\x00isomiso2" + bytes(2000))

    lipsync = mux


def test_process_video_watermarks_delivered_mp4(tmp_path):
    """Provenance must ride the DELIVERED artifact: the base64 MP4 in the
    final SSE frame carries the free-box payload and WaterMark.verify
    accepts it (a watermark on a deleted temp WAV reaches no one)."""
    from expressive_speech_translation_tpu.pipeline.watermark import WaterMark

    app = create_app(video_io=Mp4VideoIO())
    c = Client(app)
    resp = c.post("/process-video", data={
        "file": (io.BytesIO(b"fakevideo" * 100), "clip.mp4"),
        "target_language": "fra",
    })
    frames = _sse_frames(resp)
    final = frames[-1]
    assert final["phase"] == "complete", final
    out = tmp_path / "delivered.mp4"
    out.write_bytes(base64.b64decode(final["result"]["video"]))
    payload = WaterMark.extract_watermark_mp4(out)
    assert payload and payload["req_id"] == final["result"]["request_id"]
    assert WaterMark.verify(out)


def test_process_video_upload_name_cannot_collide():
    """An upload literally named output.mp4 (or dubbed.wav) must not be
    read/written as a pipeline artifact."""
    vio = Mp4VideoIO()
    app = create_app(video_io=vio)
    c = Client(app)
    resp = c.post("/process-video", data={
        "file": (io.BytesIO(b"fakevideo" * 100), "output.mp4"),
        "target_language": "fra",
    })
    frames = _sse_frames(resp)
    assert frames[-1]["phase"] == "complete", frames[-1]
    src_path, out_path = vio.mux_args
    assert src_path != out_path
    assert "upload" in src_path


def test_process_video_surfaces_validation_errors_in_stream():
    """Client errors raised after the SSE stream is committed must carry the
    user-safe message, not a generic failure frame."""
    app = create_app(video_io=Mp4VideoIO())
    c = Client(app)
    resp = c.post("/process-video", data={
        "file": (io.BytesIO(b"fakevideo" * 100), "clip.mp4"),
        "target_language": "xxx",
    })
    frames = _sse_frames(resp)
    assert "Unsupported target language" in frames[-1]["error"]


def test_process_video_passes_frames_for_visual_mapping():
    """A VideoIO exposing frames() routes them (plus the effective fps) into
    translate_speech so the visual-guided temporal mapping can run."""
    seen = {}

    class FramesVideoIO(Mp4VideoIO):
        def frames(self, video_path):
            return np.zeros((10, 8, 8, 3), np.uint8), 12.5

    class SpyBackend:
        initialized = True
        sample_rate = 16_000

        def initialize(self):
            pass

        def is_language_supported(self, lang):
            return True

        def translate_speech(self, audio, s, t, **kw):
            seen.update(kw)
            return {"audio": np.zeros((1, 1600), np.float32),
                    "transcripts": {}}

    from expressive_speech_translation_tpu.serve.video import VideoProcessor

    vp = VideoProcessor(FramesVideoIO())
    out = list(vp.process_video(b"x" * 100, SpyBackend(), "eng", "fra"))
    assert any("complete" in f for f in out)
    assert len(seen["original_video_frames"]) == 10
    assert seen["video_fps"] == 12.5


def test_health_and_static_exempt_from_default_limits():
    """Liveness probes / SPA polls / asset loads must never 429 (the default
    100-per-hour budget only guards real work routes)."""
    cfg = load_config(env={}, **{"serve.default_limits": ["2 per hour"]})
    app = create_app(config=cfg, video_io=FakeVideoIO())
    c = Client(app)
    for _ in range(10):
        assert c.get("/translation-service-status").status_code == 200
        assert c.get("/auth-config").status_code == 200
        assert c.get("/health/model").status_code in (200, 503)  # never 429
    # real work routes still consume the default budget
    for _ in range(2):
        c.post("/translate-text", json={"text": "hi", "target_language": "fra"})
    r = c.post("/translate-text", json={"text": "hi", "target_language": "fra"})
    assert r.status_code == 429


def test_process_video_content_length_gate():
    """A huge declared body is refused before the multipart parse buffers it."""
    from expressive_speech_translation_tpu.core.errors import ValidationError
    from werkzeug.test import EnvironBuilder
    from werkzeug.wrappers import Request

    cfg = load_config(env={}, **{"audio.max_video_mb": 1.0})
    app = create_app(config=cfg, video_io=FakeVideoIO())
    env = EnvironBuilder(
        method="POST", path="/process-video",
        content_type="multipart/form-data; boundary=x").get_environ()
    # a client-declared 50 MB body (the test client would recompute the
    # header from a real body; the gate reads the declared length)
    env["CONTENT_LENGTH"] = str(50 * 1024 * 1024)
    with pytest.raises(ValidationError, match="too large"):
        app.dispatch(Request(env))


def test_batched_facades_hasattr_honesty():
    """hasattr on a Batched* wrapper must reflect the INNER engine's
    streaming capability (a class-level forwarder would trap every caller's
    fallback path)."""
    from expressive_speech_translation_tpu.serve.batching import BatchedAsr, BatchedTts

    class PlainAsr:
        def transcribe_batch(self, reqs):
            return [{"text": ""} for _ in reqs]

    class StreamingAsr(PlainAsr):
        def transcribe_streaming(self, audio, language=None):
            yield {"text": "seg"}

    plain = BatchedAsr(PlainAsr())
    assert not hasattr(plain, "transcribe_streaming")
    streaming = BatchedAsr(StreamingAsr())
    assert hasattr(streaming, "transcribe_streaming")
    assert list(streaming.transcribe_streaming(None))[0]["text"] == "seg"
    plain.shutdown(); streaming.shutdown()

    class PlainTts:
        def synthesize_batch(self, reqs):
            return [np.zeros(10, np.float32) for _ in reqs]

    t = BatchedTts(PlainTts())
    assert not hasattr(t, "synthesize_streaming")
    t.shutdown()


def test_wav_bytes_roundtrip_in_memory():
    from expressive_speech_translation_tpu.media.wavio import (
        read_wav_bytes, wav_bytes,
    )

    x = (0.5 * np.sin(np.arange(1600) * 0.1)).astype(np.float32)
    data = wav_bytes(x, 16000)
    y, sr = read_wav_bytes(data)
    assert sr == 16000 and len(y) == len(x)
    np.testing.assert_allclose(y, x, atol=1e-4)
