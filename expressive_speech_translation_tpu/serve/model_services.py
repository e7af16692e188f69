"""Per-model service endpoints (the reference's Docker microservice contracts).

The TPU build runs stages in-process, but the reference's container HTTP
contracts are preserved for split deployments and client compatibility
(SURVEY.md §2.11 / §7 serve):

- CosyVoice  (:8002)  ``POST /generate-speech/``  multipart: text, style_prompt,
                      reference_audio → WAV stream; ``GET /health``
                      (Docker/cosyvoice_api.py:82-153; multi-model registry
                      {"default", "greek"} with lazy load, :37-69)
- MuseTalk   (:8003)  ``POST /lipsync-video/``  multipart: video, audio → MP4
                      (Docker/musetalk_api.py:48-77)
- Similarity (:8001)  ``POST /compare-voices/``  two audio files → cosine score
                      (Docker/similarity_api.py:27-74)
- OpenVoice  (:8004)  ``POST /clone-voice`` source+reference audio → converted
                      WAV; ``GET /status`` (Docker/openvoice_api.py:119-288)

Each service is a small Werkzeug WSGI app around an engine object; 8-char
request ids per call (cosyvoice_api.py:104 parity).
"""

from __future__ import annotations

import io
import json
import logging
import os
import tempfile
import threading
import time
from pathlib import Path
from typing import Any, Callable, Dict, Optional

import numpy as np
from werkzeug.routing import Map, Rule
from werkzeug.wrappers import Request, Response

from ..core.errors import ESTError, ValidationError, error_id
from ..media.wavio import read_wav, write_wav
from ..obs.logging_setup import new_request_id

log = logging.getLogger(__name__)


def _json(payload, status=200):
    return Response(json.dumps(payload), status=status, mimetype="application/json")


def _wav_response(audio: np.ndarray, sr: int) -> Response:
    with tempfile.NamedTemporaryFile(suffix=".wav") as f:
        write_wav(f.name, audio, sr)
        data = Path(f.name).read_bytes()
    return Response(data, mimetype="audio/wav")


def _streaming_wav_response(chunks, sr: int) -> Response:
    """Chunked-transfer WAV: header with unbounded RIFF/data sizes (the live-
    stream convention players accept) followed by PCM16 chunks as they are
    synthesised — time-to-first-byte is one TTS chunk, not the utterance."""
    import struct

    header = (
        b"RIFF" + struct.pack("<I", 0xFFFFFFFF) + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16)
        + b"data" + struct.pack("<I", 0xFFFFFFFF)
    )

    def gen():
        yield header
        for c in chunks:
            pcm = np.clip(np.asarray(c, np.float32), -1.0, 1.0)
            yield (pcm * 32767.0).astype("<i2").tobytes()

    return Response(gen(), mimetype="audio/wav", direct_passthrough=True)


def _read_audio_upload(file) -> tuple[np.ndarray, int]:
    suffix = Path(file.filename or "a.wav").suffix.lower() or ".wav"
    raw = file.read()
    if suffix == ".wav":
        with tempfile.NamedTemporaryFile(suffix=".wav") as f:
            Path(f.name).write_bytes(raw)
            return read_wav(f.name)
    from ..media import decode_audio_bytes

    return decode_audio_bytes(raw, suffix)


class _ServiceApp:
    """Shared WSGI plumbing for the four model services."""

    routes: Map

    def __call__(self, environ, start_response):
        request = Request(environ)
        req_id = new_request_id()
        t0 = time.perf_counter()
        try:
            adapter = self.routes.bind_to_environ(environ)
            endpoint, args = adapter.match()
            response = getattr(self, f"route_{endpoint}")(request, req_id, **args)
        except ESTError as e:
            response = _json(e.to_payload(), e.http_status)
        except Exception as e:  # noqa: BLE001 — service boundary
            eid = error_id(repr(e))
            log.exception("[%s] service error %s", req_id, eid)
            try:
                code = e.code  # werkzeug HTTPException
            except AttributeError:
                code = 500
            response = _json({"error": "internal error", "error_id": eid}, code or 500)
        log.info("[%s] %s %s -> %s (%.3fs)", req_id, request.method, request.path,
                 response.status_code, time.perf_counter() - t0)
        return response(environ, start_response)


class CosyVoiceService(_ServiceApp):
    """TTS service with the multi-model registry (default / greek, lazy-loaded)."""

    def __init__(
        self,
        model_factories: Optional[Dict[str, Callable[[], Any]]] = None,
        *,
        batching: bool = False,
        max_batch: int = 8,
        batch_wait_ms: float = 20.0,
    ):
        if model_factories is None:
            from ..pipeline.engines import FakeTts

            model_factories = {"default": FakeTts, "greek": FakeTts}
        self._factories = model_factories
        self._models: Dict[str, Any] = {}
        self._load_lock = threading.Lock()
        self._batching = batching
        self._max_batch = max_batch
        self._batch_wait_ms = batch_wait_ms
        self.routes = Map([
            Rule("/generate-speech/", endpoint="generate", methods=["POST"]),
            Rule("/health", endpoint="health", methods=["GET"]),
        ])

    def get_model(self, name: str):
        """Lazy load + cache (cosyvoice_api.py:37-69); with batching on,
        batch-capable models are wrapped in the micro-batching facade.
        Locked: under the threaded server, two concurrent first requests
        would otherwise each run the factory — duplicating a multi-GB weight
        load and leaking the loser's micro-batcher collector thread."""
        key = name if name in self._factories else "default"
        if key not in self._models:
            with self._load_lock:
                if key not in self._models:
                    log.info("loading TTS model %r", key)
                    model = self._factories[key]()
                    if self._batching and hasattr(model, "synthesize_batch"):
                        from .batching import BatchedTts

                        model = BatchedTts(model, max_batch=self._max_batch,
                                           max_wait_ms=self._batch_wait_ms)
                    self._models[key] = model
        return self._models[key]

    def warm_up(self):
        """Startup pre-warm (cosyvoice_api.py:71-80)."""
        self.get_model("default").synthesize("Hello world.")

    def route_health(self, request, req_id):
        payload = {"status": "healthy", "models_loaded": list(self._models)}
        batch_stats = {
            name: m.stats for name, m in self._models.items() if hasattr(m, "stats")
        }
        if batch_stats:
            payload["batching"] = batch_stats
        return _json(payload)

    def route_generate(self, request, req_id):
        text = request.form.get("text")
        if not text:
            raise ValidationError("text is required")
        style = request.form.get("style_prompt", "")
        model = self.get_model(request.form.get("model", "default"))
        ref = None
        if "reference_audio" in request.files:
            ref_audio, ref_sr = _read_audio_upload(request.files["reference_audio"])
            ref = np.asarray(ref_audio, np.float32).reshape(-1)
            if ref_sr != 16_000:
                import jax.numpy as jnp

                from .. import ops

                ref = np.asarray(ops.resample(jnp.asarray(ref), ref_sr, 16_000))
        sr = getattr(model, "sample_rate", 24_000)
        want_stream = request.form.get("stream", "").lower() in ("1", "true", "yes")
        if want_stream and hasattr(model, "synthesize_streaming"):
            chunks = model.synthesize_streaming(
                text, style_prompt=style, reference_audio_16k=ref)
            return _streaming_wav_response(chunks, sr)
        wave = model.synthesize(text, style_prompt=style, reference_audio_16k=ref)
        return _wav_response(np.asarray(wave, np.float32), sr)


class MuseTalkService(_ServiceApp):
    def __init__(self, video_io=None):
        if video_io is None:
            from ..media.native import NativeVideoIO

            video_io = NativeVideoIO()
        self.video_io = video_io
        self.routes = Map([
            Rule("/lipsync-video/", endpoint="lipsync", methods=["POST"]),
            Rule("/health", endpoint="health", methods=["GET"]),
        ])

    def route_health(self, request, req_id):
        return _json({"status": "healthy"})

    def route_lipsync(self, request, req_id):
        video = request.files.get("video")
        audio_file = request.files.get("audio")
        if video is None or audio_file is None:
            raise ValidationError("video and audio files are required")
        audio, sr = _read_audio_upload(audio_file)
        audio = np.asarray(audio, np.float32).reshape(-1)
        with tempfile.TemporaryDirectory() as tmp:
            vin = Path(tmp) / (video.filename or "in.mp4")
            vin.write_bytes(video.read())
            vout = Path(tmp) / "out.mp4"
            try:
                self.video_io.lipsync(str(vin), audio, sr, str(vout))
            except Exception:  # noqa: BLE001 — musetalk_api returns 500; we mux-fallback
                log.exception("[%s] lipsync failed; muxing", req_id)
                self.video_io.mux(str(vin), audio, sr, str(vout))
            return Response(vout.read_bytes(), mimetype="video/mp4")


class SimilarityService(_ServiceApp):
    def __init__(self, scorer: Optional[Callable[[np.ndarray, np.ndarray], float]] = None):
        if scorer is None:
            from ..evals.acoustic_metrics import speaker_similarity

            scorer = speaker_similarity
        self.scorer = scorer
        self.routes = Map([
            Rule("/compare-voices/", endpoint="compare", methods=["POST"]),
            Rule("/health", endpoint="health", methods=["GET"]),
        ])

    def route_health(self, request, req_id):
        return _json({"status": "healthy"})

    def route_compare(self, request, req_id):
        f1, f2 = request.files.get("audio1"), request.files.get("audio2")
        if f1 is None or f2 is None:
            raise ValidationError("audio1 and audio2 files are required")
        a1, _ = _read_audio_upload(f1)
        a2, _ = _read_audio_upload(f2)
        score = float(self.scorer(np.asarray(a1).reshape(-1), np.asarray(a2).reshape(-1)))
        return _json({"similarity": round(score, 4), "request_id": req_id})


class OpenVoiceService(_ServiceApp):
    def __init__(self, converter: Optional[Callable[..., np.ndarray]] = None):
        self._converter = converter
        self._params = None
        self.routes = Map([
            Rule("/clone-voice", endpoint="clone", methods=["POST"]),
            Rule("/status", endpoint="status", methods=["GET"]),
        ])

    def _ensure_model(self):
        if self._converter is not None or self._params is not None:
            return
        import jax

        from ..models import openvoice as ov

        root = os.environ.get("EST_MODELS_DIR")
        if root and (Path(root) / "openvoice" / "config.json").exists():
            from ..models.loaders import load_converted

            self._params, self._cfg = load_converted(
                Path(root) / "openvoice", ov.OpenVoiceConfig)
            log.info("OpenVoiceService: baked converter from %s",
                     Path(root) / "openvoice")
            return
        self._cfg = ov.OpenVoiceConfig()
        log.warning("OpenVoiceService: random weights (no checkpoint supplied)")
        self._params = ov.init_openvoice(jax.random.PRNGKey(5), self._cfg)

    def route_status(self, request, req_id):
        return _json({
            "status": "ready",
            "model_loaded": self._converter is not None or self._params is not None,
            "native_sample_rate": 22_050,   # openvoice_api.py native SR
        })

    def route_clone(self, request, req_id):
        src_f = request.files.get("source_audio") or request.files.get("audio")
        ref_f = request.files.get("reference_audio") or request.files.get("target_audio")
        if src_f is None or ref_f is None:
            raise ValidationError("source_audio and reference_audio files are required")
        src, src_sr = _read_audio_upload(src_f)
        ref, ref_sr = _read_audio_upload(ref_f)
        src = np.asarray(src, np.float32).reshape(-1)
        ref = np.asarray(ref, np.float32).reshape(-1)

        if self._converter is not None:
            out = self._converter(src, src_sr, ref, ref_sr)
            return _wav_response(np.asarray(out, np.float32), 22_050)

        self._ensure_model()
        import jax.numpy as jnp

        from .. import ops
        from ..models import openvoice as ov

        src22 = np.asarray(ops.resample(jnp.asarray(src), src_sr, 22_050)) if src_sr != 22_050 else src
        ref22 = np.asarray(ops.resample(jnp.asarray(ref), ref_sr, 22_050)) if ref_sr != 22_050 else ref
        se_src = ov.extract_se(self._params, self._cfg, ov.spectrogram_22k(jnp.asarray(src22[None])))
        se_tgt = ov.extract_se(self._params, self._cfg, ov.spectrogram_22k(jnp.asarray(ref22[None])))
        out = ov.convert_tone(self._params, self._cfg, jnp.asarray(src22[None]), se_src, se_tgt)
        return _wav_response(np.asarray(out, np.float32)[0], 22_050)


def run_service(name: str, port: Optional[int] = None) -> None:
    """Launch one model service: cosyvoice | musetalk | similarity | openvoice."""
    from werkzeug.serving import run_simple

    from ..core import enable_persistent_compilation_cache
    from ..core.platform import pin_platform_from_env

    pin_platform_from_env()
    enable_persistent_compilation_cache()

    services = {
        "cosyvoice": (CosyVoiceService, 8002),
        "musetalk": (MuseTalkService, 8003),
        "similarity": (SimilarityService, 8001),
        "openvoice": (OpenVoiceService, 8004),
    }
    cls, default_port = services[name]
    if name == "cosyvoice":
        from ..core.config import load_config

        sc = load_config().serve
        app = cls(batching=sc.tts_batching, max_batch=sc.tts_max_batch,
                  batch_wait_ms=sc.tts_batch_wait_ms)
        app.warm_up()
    elif name == "musetalk":
        # the container entrypoint serves the REAL full-frame pipeline
        # (detection → crop → render → blend). Baked weights load from
        # EST_MODELS_DIR/musetalk (bake_models --musetalk), and the audio
        # condition defaults to 50 Hz whisper ENCODER states from a resident
        # encoder whose width matches the UNet (EST_MODELS_DIR/
        # musetalk_whisper, then asr) — the reference's own conditioning
        # (api_inference_logic.py:63-72, :99-102). Random weights + tiled
        # log-mel otherwise, surfaced by the engine's warnings.
        from ..media.native import NativeVideoIO
        from ..pipeline.musetalk_pipeline import default_lipsync_fn

        app = cls(video_io=NativeVideoIO(lipsync_fn=default_lipsync_fn()))
    else:
        app = cls()
    run_simple("0.0.0.0", port or default_port, app, threaded=True)


if __name__ == "__main__":
    import sys

    run_service(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else None)
