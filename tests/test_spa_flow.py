"""Headless SPA studio-flow drive (VERDICT r3 #7).

No JS runtime exists on this host, so these tests bind the ACTUAL strings in
serve/static/app.js (endpoints, form fields, SSE keys the client branches on,
the phase-checklist labels, the dubbing language table) to live server
behavior through the Werkzeug client — if either side drifts, the extraction
or the assertion fails. Reference behaviors:
/root/reference/Frontend/src/components/TranslationFlow.js:95-170 (manual SSE
frame parsing, progress/phase/result), hooks/useTranslation.js:191-301
(multipart upload → base64 audio + transcripts), VideoSyncInterface.js:10-49
(the 35-language dubbing picker).
"""

import base64
import io
import json
import re
from pathlib import Path

import numpy as np
import pytest
from werkzeug.test import Client

from expressive_speech_translation_tpu.serve.app import create_app

from test_serve import FailingLipsyncIO, FakeVideoIO, wav_bytes

pytestmark = pytest.mark.quick

APP_JS = Path(__file__).resolve().parents[1] / (
    "expressive_speech_translation_tpu/serve/static/app.js")


@pytest.fixture(scope="module")
def js():
    return APP_JS.read_text()


@pytest.fixture()
def client():
    return Client(create_app(video_io=FakeVideoIO()))


def sse_frames(data: bytes):
    """Parse exactly as app.js does: split on blank line, 'data: ' prefix."""
    out = []
    for frame in data.decode().split("\n\n"):
        if frame.startswith("data: "):
            out.append(json.loads(frame[len("data: "):]))
    return out


def test_streaming_studio_flow_event_sequence(client, js):
    """Upload → SSE → live transcripts → PCM chunks → completion, consuming
    only the keys runAudioStreaming actually branches on."""
    fn = js[js.index("async function runAudioStreaming"):]
    # the client posts multipart to /translate with stream=1 — extract, don't assume
    assert 'fetch("/translate"' in fn
    assert 'form.append("stream", "1")' in fn
    fields = set(re.findall(r'form\.append\("(\w+)"', fn))
    assert {"file", "source_language", "target_language", "stream"} <= fields
    branch_keys = set(re.findall(r"msg\.(\w+)", fn))
    assert {"error", "progress", "phase", "transcripts", "audio_chunk",
            "sample_rate"} <= branch_keys

    resp = client.post("/translate", data={
        "file": (io.BytesIO(wav_bytes(2.5)), "speech.wav"),
        "source_language": "eng", "target_language": "fra", "stream": "1",
    })
    assert resp.status_code == 200
    assert "text/event-stream" in resp.headers["Content-Type"]
    frames = sse_frames(resp.data)
    assert frames, "no SSE frames"
    assert not any("error" in f for f in frames)

    # transcripts frames carry ACCUMULATED text: each supersedes the last
    transcripts = [f["transcripts"] for f in frames if "transcripts" in f]
    assert transcripts, "no transcript frames for speech input"
    for t in transcripts:
        assert set(t) >= {"source", "target"}
    lens = [len(t["source"]) for t in transcripts]
    assert lens == sorted(lens), "accumulated transcripts shrank"

    # audio chunks decode as int16 PCM exactly the way the client does
    chunks = [f for f in frames if "audio_chunk" in f]
    assert chunks, "no audio chunks for speech input"
    total = 0
    for f in chunks:
        raw = base64.b64decode(f["audio_chunk"])
        assert len(raw) % 2 == 0 and len(raw) > 0
        pcm = np.frombuffer(raw, "<i2").astype(np.float32) / 32768
        assert np.isfinite(pcm).all()
        assert f.get("sample_rate", 16000) in (16000, 22050, 24000)
        total += len(pcm)
    assert total > 0

    # at least one transcript frame precedes the first audio chunk (the UI
    # shows live text while audio is still synthesizing)
    first_audio = next(i for i, f in enumerate(frames) if "audio_chunk" in f)
    assert any("transcripts" in f for f in frames[:first_audio + 1])

    # progress only moves forward (setProgress writes a monotone bar)
    prog = [f["progress"] for f in frames if "progress" in f]
    assert prog == sorted(prog)


def test_nonstream_flow_matches_use_translation_contract(client, js):
    """useTranslation.processAudio contract: multipart → JSON base64 WAV +
    transcripts + request id; audio must decode non-empty (the client throws
    'Received empty audio data' on an empty blob)."""
    resp = client.post("/translate", data={
        "file": (io.BytesIO(wav_bytes(2.0)), "speech.wav"),
        "source_language": "eng", "target_language": "fra",
    })
    assert resp.status_code == 200
    body = resp.get_json()
    assert set(body) >= {"audio", "transcripts", "request_id"}
    raw = base64.b64decode(body["audio"])
    assert len(raw) > 44  # non-empty WAV (audioUtils.js empty-blob guard)
    # decodeAudioData-equivalent: parse the WAV and confirm speech-bearing PCM
    from expressive_speech_translation_tpu.media.wavio import read_wav
    import tempfile, os

    fd, path = tempfile.mkstemp(suffix=".wav")
    os.close(fd)
    try:
        open(path, "wb").write(raw)
        audio, sr = read_wav(path)
    finally:
        os.unlink(path)
    audio = np.asarray(audio, np.float32).reshape(-1)
    assert audio.size > 0 and np.isfinite(audio).all()
    # the analytics pane (renderAnalytics → pitch/level tracks) needs signal
    assert float(np.sqrt(np.mean(audio ** 2))) > 1e-5


def test_video_flow_phase_checklist(client, js):
    """TranslationFlow.js video path: SSE progress ticks 10/20/…/90, phase
    labels that drive the updatePhases checklist (extracted from app.js and
    replayed through its matching rule), final frame with video + transcripts."""
    phases = re.search(r"VIDEO_PHASES = \[(.*?)\];", js, re.S).group(1)
    labels = re.findall(r'"([^"]+)"', phases)
    assert len(labels) == 6  # Extract/Preprocess/Translate/Watermark/LipSync/Encode

    resp = client.post("/process-video", data={
        "file": (io.BytesIO(b"\x00" * 4000), "clip.mp4"),
        "source_language": "eng", "target_language": "fra",
    })
    assert resp.status_code == 200
    frames = sse_frames(resp.data)
    prog = [f["progress"] for f in frames if "progress" in f]
    # success path: 75 ("finalize") is reserved for the lip-sync
    # failed/disabled fallback, exactly as in video_routes.py:288/297
    assert set(prog) >= {10, 20, 30, 55, 60, 90}
    assert prog == sorted(prog)

    fb = Client(create_app(video_io=FailingLipsyncIO())).post(
        "/process-video", data={
            "file": (io.BytesIO(b"\x00" * 4000), "clip.mp4"),
            "source_language": "eng", "target_language": "fra",
        })
    fb_prog = [f["progress"] for f in sse_frames(fb.data) if "progress" in f]
    assert 75 in fb_prog, "lip-sync fallback must tick 75 (video_routes.py:288)"
    assert fb_prog == sorted(fb_prog)

    # replay updatePhases' first-word matching rule: the checklist index must
    # move monotonically forward and reach every stage
    reached = []
    for f in frames:
        label = f.get("phase") or ""
        idx = next((i for i, p in enumerate(labels)
                    if label.startswith(p.split(" ")[0])), None)
        if idx is not None:
            reached.append(idx)
    assert reached == sorted(reached), f"checklist went backwards: {reached}"
    assert set(reached) == set(range(len(labels))), (
        f"phases missing from stream: {sorted(set(range(len(labels))) - set(reached))}")

    # the client reads msg.result.video / msg.result.transcripts (app.js:801-805)
    final = frames[-1]["result"]
    assert "video" in final and "transcripts" in final
    assert len(base64.b64decode(final["video"])) > 1000


def test_dub_language_picker_exact_reference_parity(js):
    """VideoSyncInterface.js:10-49 SUPPORTED_LANGUAGES, exact codes and order
    (9 common-first + 26 alphabetical = 35)."""
    expected = [
        "fra", "spa", "deu", "ita", "por", "rus", "jpn", "cmn", "ukr",
        "ben", "cat", "cmn_Hant", "cym", "dan", "eng", "est", "fin", "hin",
        "ind", "kor", "mlt", "nld", "pes", "pol", "ron", "slk", "swe", "swh",
        "tel", "tgl", "tha", "tur", "urd", "uzn", "vie",
    ]
    langs = re.search(r"DUB_LANGUAGES = \[(.*?)\];", js, re.S).group(1)
    codes = re.findall(r'\["([a-zA-Z_]+)",', langs)
    assert codes == expected


def test_dub_flow_uses_process_video_with_cloning_flag(client, js):
    """The dubbing view posts the cloning toggle with the video —
    VideoSyncInterface 'Enable Voice Cloning' semantics."""
    dub = js[js.index("function initDub"):]
    assert 'fetch("/process-video"' in dub
    assert re.search(r'form\.append\("use_voice_cloning"', dub), (
        "dub view no longer sends the cloning toggle")
    resp = client.post("/process-video", data={
        "file": (io.BytesIO(b"\x00" * 4000), "clip.mp4"),
        "source_language": "eng", "target_language": "fra",
        "use_voice_cloning": "true",
    })
    assert resp.status_code == 200
    assert sse_frames(resp.data)[-1]["result"].get("video")


def test_lip_sync_toggle_contract(client, js):
    """TranslationFlow.js:40,91 applyLipSync: both the studio video flow and
    the dub view post apply_lip_sync; disabling it takes the reference's
    75-tick 'disabled' path (video_routes.py:294-300) and muxes instead of
    lip-syncing."""
    # client-side: both flows post the flag, and the studio shows the toggle
    # only for the video mode
    vid = js[js.index("async function runVideo"):]
    assert re.search(r'form\.append\("apply_lip_sync"', vid)
    dub = js[js.index("function initDub"):]
    assert re.search(r'form\.append\("apply_lip_sync"', dub)
    assert 'lipsyncrow' in js and "state.mode !== \"video\"" in js

    resp = client.post("/process-video", data={
        "file": (io.BytesIO(b"\x00" * 4000), "clip.mp4"),
        "source_language": "eng", "target_language": "fra",
        "apply_lip_sync": "false",
    })
    assert resp.status_code == 200
    frames = sse_frames(resp.data)
    prog = [f["progress"] for f in frames if "progress" in f]
    assert 75 in prog
    phases = [f.get("phase", "") for f in frames]
    assert any("disabled" in p.lower() for p in phases)
    video = base64.b64decode(frames[-1]["result"]["video"])
    assert video.startswith(b"MUXED")  # mux, not the lipsync renderer


def test_transport_and_comparative_analytics_surface(js):
    """WaveformPlayer.js transport (play/pause, rewind, m:ss time, volume +
    mute) and VoiceAnalyticsDashboard.js chart set (source-vs-target line,
    radar with the 5 reference axes, emotion bars) exist and are wired to the
    elements the page serves."""
    html = (APP_JS.parent / "index.html").read_text()
    for el in ("transport", "tr-play", "tr-rewind", "tr-time", "tr-vol",
               "tr-mute", "an-cmp-pitch", "an-radar", "an-emotion"):
        assert f'id="{el}"' in html, el
    for fn in ("initTransport", "fmtTime", "drawMultiLine", "drawRadar",
               "drawBars", "voiceStats", "emotionProfile", "decodeSourceUpload"):
        assert f"function {fn}" in js, fn
    # the radar carries the reference's exact five axes
    # (VoiceAnalyticsDashboard.js:29-35)
    assert re.search(r'\[\s*"Volume",\s*"Pace",\s*"Pitch",\s*"Clarity",\s*"Emotion"\s*\]', js)
    # the stat tiles show the reference's change-vs-source chips
    assert "vs source" in js
    # transport drives the audio element, reference seek/finish semantics
    tr = js[js.index("function initTransport"):]
    assert "audioEl.currentTime = 0" in tr  # rewind + finish reset
    assert "audioEl.muted" in tr


def test_dropzone_and_transcript_view_parity(js):
    """TranslateTool.js:72-83 drag-and-drop (preventDefault + type filter into
    the same file-input pipeline) and TranscriptView.js Show/Hide Transcript
    toggle with language-named sections + empty-state fallbacks."""
    html = (APP_JS.parent / "index.html").read_text()
    assert 'id="dropzone"' in html and "drag and drop" in html
    dz = js[js.index('$("dropzone")'):]
    assert "e.preventDefault()" in dz
    assert "dataTransfer.files[0]" in dz
    assert 'startsWith(want)' in dz  # audio/ vs video/ type filter

    tv = js[js.index("function showTranscripts"):]
    assert '"Show Transcript"' in tv and '"Hide Transcript"' in tv
    assert "Source Text (" in tv and "Target Text (" in tv
    assert "No source text available" in tv
    assert "No target text available" in tv


def test_backend_selector_surfaces_weight_provenance(client, js):
    """VERDICT r4 weak #5: /available-backends carries per-backend weight
    provenance and BOTH SPA selectors render a warning tag for any backend
    that is not 'loaded' — a random-weight backend is never silently
    presented as production-ready (reference contract: Backend/app.py:382-389
    returns the bare name list; 'weights' is additive)."""
    body = client.get("/available-backends").get_json()
    assert set(body["weights"]) == set(body["backends"])
    for name, w in body["weights"].items():
        assert w in ("loaded", "random", "fake", "unknown")

    # one shared label helper reads the weights map and tags non-loaded
    # backends; both selectors render through it
    assert "function backendOptionLabel" in js
    assert js.count("backendOptionLabel(name, b)") >= 2
    assert '!== "loaded"' in js and "weights`" in js


# ----------------------------------------------------------- OIDC auth gate
# VERDICT r4 #5: the reference wires react-oidc-context + a Cognito config at
# the app root but ships the provider COMMENTED OUT (Frontend/src/index.js:
# 5-21). Parity = same posture: gate present, inert until configured.


def test_auth_config_route_disabled_by_default(client):
    body = client.get("/auth-config").get_json()
    assert body["enabled"] is False
    assert body["response_type"] == "code"          # cognitoAuthConfig shape
    assert body["scope"] == "phone openid email"    # index.js scope


def test_auth_config_route_enabled_with_authority():
    from expressive_speech_translation_tpu.core.config import load_config

    cfg = load_config(**{
        "serve.auth_authority": "https://idp.example.com",
        "serve.auth_client_id": "client123",
    })
    c = Client(create_app(config=cfg, video_io=FakeVideoIO()))
    body = c.get("/auth-config").get_json()
    assert body == {
        "enabled": True,
        "authority": "https://idp.example.com",
        "client_id": "client123",
        "response_type": "code",
        "scope": "phone openid email",
    }


def test_login_gate_guards_studio_views(client, js):
    """Headless flow of the login-gated studio: the SPA fetches /auth-config,
    gates studio/dub/podcasts when enabled and no session, redirects through
    an authorization-code URL, and stores the landing ?code as the session."""
    # the gate covers exactly the creator-facing views
    gated = re.search(r'GATED_VIEWS = \[(.*?)\];', js).group(1)
    assert re.findall(r'"(\w+)"', gated) == ["studio", "dub", "podcasts"]
    # inert unless the server enables it AND no session exists
    fn = js[js.index("function authRequired"):]
    fn = fn[:fn.index("}")]
    assert "auth.cfg.enabled" in fn and "authSession()" in fn
    # nav routing diverts gated views to the login view
    sv = js[js.index("function showView"):]
    assert 'authRequired(view) ? "login" : view' in sv
    # authorization-code redirect with the configured shape
    su = js[js.index("function signinUrl"):]
    assert "oauth2/authorize" in su
    assert "client_id" in su and "redirect_uri" in su
    assert 'response_type: c.response_type || "code"' in su
    # landing: ?code stored as the localStorage session, URL cleaned
    ia = js[js.index("async function initAuth"):]
    assert '.get("code")' in ia
    assert 'localStorage.setItem("est_auth"' in ia
    assert "history.replaceState" in ia
    # the login view exists with the sign-in button the JS binds
    html = (APP_JS.parent / "index.html").read_text()
    assert 'id="view-login"' in html and 'id="login-go"' in html
    # and the SPA boots through the auth check before populating selectors
    assert "initAuth().then(init)" in js
    # server side of the flow responds
    assert client.get("/auth-config").status_code == 200


def test_waveform_zoom_and_regions_parity(js):
    """wavesurfer zoom + regions parity on the canvas player: wheel-zoom
    anchored at the cursor, drag-to-create a loop region, double-click
    clears, click-seek stays window-aware."""
    zoom = js[js.index("function waveZoomAt"):]
    zoom = zoom[:zoom.index("\n}")]
    assert "Math.min(64, Math.max(1," in zoom          # zoom clamp [1, 64]
    assert "cursorFrac" in zoom                         # anchored at cursor
    draw = js[js.index("function drawWave"):]
    draw = draw[:draw.index("\n}")]
    assert "view.region" in draw                        # region overlay drawn
    # interactions wired on the result waveform
    assert "canvas.onwheel" in js and "ev.preventDefault()" in js
    assert "canvas.onmousedown" in js and "canvas.ondblclick" in js
    assert "wview.region = { start:" in js
    # region loop playback on timeupdate
    assert "audioEl.currentTime = r.start * buf.duration" in js
    # click-seek converts through the zoom window
    assert "wview.offset + x / wview.zoom" in js


def test_analytics_chart_tooltip_parity(js):
    """recharts <Tooltip/> parity: hover crosshair + value readout on the
    measured pitch/level charts, units included, cleared on mouseleave."""
    chart = js[js.index("function drawChart"):]
    chart = chart[:chart.index("\n}")]
    assert "canvas.onmousemove" in chart
    assert "canvas.onmouseleave" in chart
    assert "canvas.title = label" in chart              # headless-assertable
    assert 'unit: " Hz"' in js and 'unit: " dB"' in js
