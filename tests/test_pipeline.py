"""Pipeline layer: backend manager, audio processor, temporal mapping,
cascaded orchestration with fake engines, watermarking, WAV io."""

import numpy as np
import pytest

from expressive_speech_translation_tpu.core.errors import ValidationError
from expressive_speech_translation_tpu.media.wavio import read_wav, write_wav
from expressive_speech_translation_tpu.pipeline import (
    AudioProcessor,
    CascadedBackend,
    TranslationManager,
    TranslationStrategy,
    TemporalMapper,
    VisualSpeechDetector,
    VisualTemporalMapper,
    WaterMark,
    fake_engines,
    make_payload,
    supported_languages,
)
from expressive_speech_translation_tpu.pipeline.visual_speech_detector import SpeechSegment

pytestmark = pytest.mark.quick


def speech_like(seconds=2.0, sr=16000, seed=0):
    g = np.random.default_rng(seed)
    t = np.arange(int(sr * seconds)) / sr
    x = 0.4 * np.sin(2 * np.pi * 220 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t) ** 2)
    return (x + 0.01 * g.standard_normal(t.shape)).astype(np.float32)


# ----------------------------------------------------------- manager/strategy


def test_manager_lazy_init_and_fallback():
    backend = CascadedBackend(fake_engines())
    mgr = TranslationManager()
    mgr.register_backend("cascaded", backend, is_default=True)
    assert not backend.initialized
    got = mgr.get_backend("nonexistent")  # falls back to default + lazy init
    assert got is backend
    assert backend.initialized


def test_strategy_threshold():
    assert TranslationStrategy.select_strategy({"music_detection": {"confidence": 0.2}}) == "speech_with_music"
    assert TranslationStrategy.select_strategy({"music_detection": {"confidence": 0.1}}) == "speech_only"
    assert TranslationStrategy.select_strategy({}) == "speech_only"


# -------------------------------------------------------------- audio processor


def test_is_valid_audio_rules():
    ap = AudioProcessor()
    ok, _ = ap.is_valid_audio(speech_like())
    assert ok
    assert not ap.is_valid_audio(np.zeros(16000, np.float32))[0]          # silent
    assert not ap.is_valid_audio(np.full(16000, np.nan, np.float32))[0]   # nan
    assert not ap.is_valid_audio(speech_like(0.05))[0]                     # too short
    assert not ap.is_valid_audio(speech_like() + 0.5)[0]                   # DC offset


def test_validate_audio_length():
    ap = AudioProcessor()
    ap.validate_audio_length(200.0)
    with pytest.raises(ValidationError) as e:
        ap.validate_audio_length(301.0)
    assert "too long" in str(e.value)


def test_process_audio_resamples_and_denoises():
    ap = AudioProcessor()
    x = speech_like(1.0, sr=44100)
    y = ap.process_audio(x, orig_sr=44100)
    assert abs(len(y) - 16000) <= 2
    assert y.dtype == np.float32


def test_music_detection_discriminates(harvard_wav):
    ap = AudioProcessor()
    g = np.random.default_rng(0)
    t = np.arange(16000 * 3) / 16000
    # "music": broadband + steady rhythm
    music = sum(0.2 * np.sin(2 * np.pi * f * t) for f in (110, 220, 330, 440, 880, 1760))
    music = (music * (1 + 0.5 * np.sign(np.sin(2 * np.pi * 2 * t)))).astype(np.float32)
    music += 0.05 * g.standard_normal(len(t)).astype(np.float32)
    # real speech from the reference's committed fixture
    from expressive_speech_translation_tpu.media.wavio import read_wav as _rw
    from expressive_speech_translation_tpu import ops as _ops
    import jax.numpy as _jnp

    raw, sr = _rw(harvard_wav)
    mono = np.asarray(_ops.stereo_to_mono(_jnp.asarray(raw)))
    speech = np.asarray(_ops.resample(_jnp.asarray(mono), sr, 16000))[: 16000 * 3]
    m_conf = ap.detect_background_music(music)["confidence"]
    s_conf = ap.detect_background_music(speech)["confidence"]
    assert m_conf > s_conf


def test_spectral_enhancement_language_params():
    ap = AudioProcessor()
    x = speech_like(1.0)
    fra = ap.apply_spectral_enhancement(x, "fra")
    default = ap.apply_spectral_enhancement(x, "xxx")
    assert fra.shape == default.shape == x.shape
    assert not np.allclose(fra, default)  # language EQ changed the signal


# ------------------------------------------------------------- temporal mapper


def test_timing_profile_from_words_extracts_pauses():
    tm = TemporalMapper()
    words = [
        {"word": "a", "start": 0.5, "end": 0.8},
        {"word": "b", "start": 0.9, "end": 1.2},   # gap 0.1 -> no pause
        {"word": "c", "start": 1.7, "end": 2.0},   # gap 0.5 -> pause
    ]
    prof = tm.timing_profile(np.zeros(16000 * 3, np.float32), words)
    assert prof.speech_onset == 0.5
    assert prof.speech_offset == 2.0
    assert len(prof.pauses) == 1
    assert abs(prof.pauses[0]["duration"] - 0.5) < 1e-6


def test_apply_temporal_guidance_matches_source_duration():
    tm = TemporalMapper()
    source = np.concatenate([np.zeros(8000, np.float32), speech_like(2.0), np.zeros(8000, np.float32)])
    translated = speech_like(1.5, seed=2)
    out = tm.apply_temporal_guidance(translated, source)
    assert abs(len(out) - len(source)) <= 1
    # leading portion should be quiet (onset alignment)
    assert np.abs(out[:4000]).mean() < np.abs(out[10000:20000]).mean()


def test_apply_temporal_guidance_never_truncates_long_translations():
    """A verbose translation longer than the source even at MAX_STRETCH keeps
    its full content (the reference returns the adjusted audio at natural
    length — no cut to source duration)."""
    tm = TemporalMapper()
    source = np.concatenate([np.zeros(4000, np.float32), speech_like(4.0),
                             np.zeros(4000, np.float32)])   # 5.5 s
    translated = speech_like(20.0, seed=3)                  # ~3.6x longer
    out = tm.apply_temporal_guidance(translated, source)
    # even fully compressed at MAX_STRETCH=1.5, 20 s cannot fit 5.5 s:
    # the output must be longer than the source, not chopped to it
    assert len(out) > len(source)
    assert len(out) >= int(20.0 / 1.5 * 16000) - 16000


# -------------------------------------------------------- visual mapper/detector


def _talking_frames(n=100, h=64, w=64, speak_range=(30, 70)):
    g = np.random.default_rng(0)
    frames = []
    for i in range(n):
        f = np.full((h, w), 100.0)
        if speak_range[0] <= i < speak_range[1]:
            # mouth region variance wiggles while "speaking" (varies per frame)
            f[40:54, 20:44] = 100 + 80 * g.standard_normal((14, 24)) * g.uniform(0.3, 1.0)
        frames.append(f)
    return frames


def test_visual_speech_detector_finds_segment():
    det = VisualSpeechDetector(fps=25.0)
    segs = det.detect_speech_segments(_talking_frames())
    assert len(segs) >= 1
    s = segs[0]
    assert 0.8 < s.start < 1.6      # speaking starts at frame 30 = 1.2s
    assert 2.2 < s.end < 3.4        # ends at frame 70 = 2.8s


def test_visual_mapper_places_audio_in_segment():
    vm = VisualTemporalMapper()
    vm.initialize()
    translated = speech_like(1.0, seed=3)
    segs = [SpeechSegment(1.0, 3.0)]
    out = vm.distribute_audio(translated, segs, total_duration=4.0)
    assert len(out) >= 4 * 16000
    # energy concentrated after segment start
    assert np.abs(out[: 12000]).mean() < 0.1 * np.abs(out[16000: 40000]).mean() + 1e-5


def test_visual_mapper_multi_segment():
    vm = VisualTemporalMapper()
    translated = speech_like(2.0, seed=4)
    segs = [SpeechSegment(0.5, 1.5), SpeechSegment(2.5, 3.5)]
    out = vm.distribute_audio(translated, segs, total_duration=4.0)
    mid_quiet = np.abs(out[int(1.8 * 16000): int(2.3 * 16000)]).mean()
    seg1 = np.abs(out[int(0.6 * 16000): int(1.3 * 16000)]).mean()
    assert mid_quiet < 0.2 * seg1 + 1e-5


# ------------------------------------------------------------- cascaded backend


def test_cascaded_backend_end_to_end_fake():
    backend = CascadedBackend(fake_engines("bonjour le monde"))
    backend.initialize()
    audio = speech_like(3.0)
    out = backend.translate_speech(audio, "eng", "fra")
    assert out["audio"].shape[0] == 1
    assert out["audio"].dtype == np.float32
    assert out["transcripts"]["source"] == "bonjour le monde"
    assert out["transcripts"]["target"].startswith("[fra_Latn]")
    assert len(out["process_id"]) == 8
    assert "asr" in out["stage_summary"]
    # loudness normalized toward -23 LUFS proxy
    rms_db = 20 * np.log10(np.sqrt((out["audio"] ** 2).mean()) + 1e-12)
    assert -30 < rms_db < -16


def test_cascaded_backend_rejects_unknown_language():
    backend = CascadedBackend(fake_engines())
    with pytest.raises(ValidationError):
        backend.translate_speech(speech_like(1.0), "eng", "xx_unknown")


def test_supported_languages_table():
    langs = supported_languages()
    assert "fra" in langs and "ell" in langs and "eng" in langs
    assert len(langs) == 18


# ------------------------------------------------------------------ watermark


def test_watermark_roundtrip(tmp_path):
    path = tmp_path / "out.wav"
    write_wav(path, speech_like(0.5), 16000)
    payload = make_payload("abcd1234")
    WaterMark.add_watermark(path, payload)
    got = WaterMark.extract_watermark(path)
    assert got is not None
    assert got["req_id"] == "abcd1234"
    assert WaterMark.verify(path)
    # audio still readable and intact
    audio, sr = read_wav(path)
    assert sr == 16000
    assert abs(len(audio) - 8000) <= 1


def test_wav_roundtrip_formats(tmp_path):
    x = speech_like(0.3)
    for bits in (16, 32):
        p = tmp_path / f"t{bits}.wav"
        write_wav(p, x, 16000, bits=bits)
        y, sr = read_wav(p)
        assert sr == 16000
        tol = 1e-4 if bits == 16 else 1e-6
        np.testing.assert_allclose(y, x, atol=tol)
    # stereo
    st = np.stack([x, -x])
    p = tmp_path / "stereo.wav"
    write_wav(p, st, 16000)
    y, sr = read_wav(p)
    assert y.shape == st.shape
    np.testing.assert_allclose(y, st, atol=1e-4)


def test_translate_speech_streaming_events():
    """Streaming S2ST: transcripts header first, then 16 kHz audio chunks;
    falls back to one offline chunk for engines without streaming."""
    import numpy as np

    from expressive_speech_translation_tpu.pipeline.cascaded import CascadedBackend
    from expressive_speech_translation_tpu.pipeline.engines import fake_engines

    backend = CascadedBackend(fake_engines("hello streaming world"))
    backend.initialize()
    audio = (0.2 * np.sin(2 * np.pi * 220 * np.arange(32000) / 16000)).astype(np.float32)
    events = list(backend.translate_speech_streaming(audio, "eng", "fra"))
    assert events[0]["type"] == "transcripts"
    assert events[0]["source"] == "hello streaming world"
    assert "[fra_Latn]" in events[0]["target"]
    chunks = [e for e in events[1:] if e["type"] == "audio"]
    assert chunks and all(e["sample_rate"] == 16_000 for e in chunks)
    wav = np.concatenate([e["chunk"] for e in chunks])
    assert np.isfinite(wav).all() and len(wav) > 16_000 // 2
    # offline parity: same total duration as the batch path (FakeTts is
    # deterministic and streaming is a pure chunking of it)
    offline = backend.translate_speech(audio, "eng", "fra")
    assert abs(len(wav) - offline["audio"].shape[1]) / 16_000 < 0.6


def test_pipelined_streaming_cascade_interleaves_windows():
    """With a streaming-capable ASR, the cascade pipelines per window:
    window-1 audio is yielded BEFORE window-2 even transcribes (TTFA is one
    window, not the utterance), and transcripts events carry accumulated
    text with the final one complete."""
    import numpy as np

    from expressive_speech_translation_tpu.pipeline.cascaded import CascadedBackend
    from expressive_speech_translation_tpu.pipeline.engines import (
        Engines, FakeNmt, FakeTts,
    )

    class StreamingFakeAsr:
        """Two 2 s windows; records when each window decodes so the test can
        prove downstream work interleaved."""

        def __init__(self):
            self.decoded: list = []

        def transcribe(self, audio_16k, language=None):
            segs = list(self.transcribe_streaming(audio_16k, language))
            return {"text": " ".join(s["text"] for s in segs),
                    "language": language or "eng",
                    "words": [w for s in segs for w in s["words"]]}

        def transcribe_streaming(self, audio_16k, language=None):
            for i, text in enumerate(["hello one", "hello two"]):
                self.decoded.append(i)
                yield {"text": text, "words": [], "start": 2.0 * i,
                       "end": 2.0 * (i + 1), "language": language or "eng"}

    asr = StreamingFakeAsr()
    backend = CascadedBackend(Engines(asr=asr, nmt=FakeNmt(), tts=FakeTts()))
    backend.initialize()
    asr.decoded.clear()   # initialize()'s warmup transcribe consumed one pass
    audio = (0.2 * np.sin(np.arange(64_000) * 0.05)).astype(np.float32)

    kinds, first_audio_before_w2 = [], None
    transcripts = []
    for ev in backend.translate_speech_streaming(audio, "eng", "fra"):
        kinds.append(ev["type"])
        if ev["type"] == "audio" and first_audio_before_w2 is None:
            first_audio_before_w2 = len(asr.decoded) < 2
        if ev["type"] == "transcripts":
            transcripts.append(ev)
    assert first_audio_before_w2 is True, "window-1 audio must precede window-2 ASR"
    assert len(transcripts) == 2
    assert transcripts[0]["source"] == "hello one"
    assert transcripts[1]["source"] == "hello one hello two"
    assert transcripts[0]["window"] == [0.0, 2.0]
    assert "[fra_Latn]" in transcripts[1]["target"]
    # target accumulates one translation per window
    assert transcripts[1]["target"].count("[fra_Latn]") == 2
    # audio chunks for window 1 appear between the two transcripts events
    i1 = kinds.index("transcripts")
    i2 = len(kinds) - 1 - kinds[::-1].index("transcripts")
    assert "audio" in kinds[i1 + 1:i2]


def test_vad_host_features_match_jax_ops():
    """TemporalMapper's numpy VAD features must mirror the JAX ops."""
    import jax.numpy as jnp

    from expressive_speech_translation_tpu import ops
    from expressive_speech_translation_tpu.pipeline.temporal_mapper import (
        TemporalMapper,
    )

    g = np.random.default_rng(3)
    t = np.arange(16000 * 2) / 16000
    x = (0.3 * np.sin(2 * np.pi * 220 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 2 * t) ** 2)
         + 0.01 * g.standard_normal(len(t))).astype(np.float32)

    tm = TemporalMapper()
    energy, centroid, rolloff = tm._vad_features_np(x)
    ref_e = np.asarray(ops.energy_envelope(jnp.asarray(x), tm.frame, tm.hop))
    ref_c, ref_r = ops.spectral_centroid_rolloff(jnp.asarray(x), sr=16000,
                                                 n_fft=1024, hop=tm.hop)
    np.testing.assert_allclose(energy, ref_e, atol=1e-5)
    np.testing.assert_allclose(centroid, np.asarray(ref_c), rtol=1e-4, atol=0.5)
    np.testing.assert_allclose(rolloff, np.asarray(ref_r), atol=16.0)


def test_process_audio_bucketed_denoise_matches_unpadded():
    """The bucket-padded jitted denoise must match an unpadded gate (the
    padded tail is masked out of the noise-profile estimate)."""
    import jax.numpy as jnp

    from expressive_speech_translation_tpu import ops
    from expressive_speech_translation_tpu.pipeline.audio_processor import (
        AudioProcessor,
    )

    g = np.random.default_rng(6)
    t = np.arange(int(16000 * 3.7)) / 16000  # off-bucket length
    x = (0.4 * np.sin(2 * np.pi * 220 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 2 * t) ** 2)
         + 0.02 * g.standard_normal(len(t))).astype(np.float32)

    ap = AudioProcessor()
    out = ap.process_audio(x, orig_sr=16000)
    ref = np.asarray(ops.spectral_noise_gate(
        jnp.asarray(x), sr=16000, n_fft=ap.config.denoise_n_fft,
        hop=ap.config.denoise_hop, speech_boost=1.2))
    assert out.shape == ref.shape
    # identical away from the final STFT window (the unpadded gate's last
    # frames sit on the COLA boundary; the padded one's are mid-stream)
    n_edge = ap.config.denoise_n_fft
    np.testing.assert_allclose(out[:-n_edge], ref[:-n_edge], atol=2e-4)

    # stereo + resample path still works end to end
    sx = np.stack([x, 0.8 * x])
    out2 = ap.process_audio(sx, orig_sr=16000)
    assert out2.ndim == 1 and len(out2) == len(x)


def test_empty_translation_raises_for_loaded_weights():
    """Reference parity (cascaded_backend.py:445): an empty translation is a
    hard failure when real weights serve; weightless mode keeps running."""
    from expressive_speech_translation_tpu.pipeline.cascaded import CascadedBackend
    from expressive_speech_translation_tpu.pipeline.engines import (
        Engines, FakeAsr, FakeTts,
    )

    class EmptyNmt:
        weightless = False  # "loaded" weights producing empty output

        def translate(self, text, s, t):
            return "   "

    class EmptyNmtWeightless(EmptyNmt):
        weightless = True

    audio = np.zeros(16000, np.float32)
    loaded = CascadedBackend(Engines(asr=FakeAsr(), nmt=EmptyNmt(), tts=FakeTts()))
    with pytest.raises(RuntimeError, match="Translation result was empty"):
        loaded.translate_speech(audio, "eng", "fra")

    weightless = CascadedBackend(
        Engines(asr=FakeAsr(), nmt=EmptyNmtWeightless(), tts=FakeTts()))
    out = weightless.translate_speech(audio, "eng", "fra")  # must not raise
    assert "audio" in out


def test_detected_whisper_short_code_keeps_its_language():
    """Language detection on audio outside the 19-language app table reports
    the whisper short code; the decode prompt must keep using THAT language
    instead of silently falling back to an English prompt (the app-code
    round-trip used to raise and substitute eng)."""
    from expressive_speech_translation_tpu.pipeline.languages import (
        whisper_lang_index, whisper_lang_token, whisper_token_to_app,
    )

    # "uk" (Ukrainian) is in the app table; "vi" (Vietnamese) is NOT
    assert whisper_token_to_app(50278) in ("vi",)  # 50259 + 19 = vi
    assert whisper_lang_index("vi") == 19
    assert whisper_lang_token("vi") == 50278
    # app codes still resolve
    assert whisper_lang_index("ukr") == whisper_lang_index("uk")
    # garbage still raises (the caller's except-fallback handles it)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        whisper_lang_index("xx")


def test_translate_speech_rejects_unknown_source_language():
    """A typo'd source must 400 like a bad target does — not silently decode
    with an English ASR prompt and untagged NMT."""
    from expressive_speech_translation_tpu.core.errors import ValidationError
    from expressive_speech_translation_tpu.pipeline.cascaded import CascadedBackend
    from expressive_speech_translation_tpu.pipeline.engines import fake_engines

    backend = CascadedBackend(fake_engines())
    with pytest.raises(ValidationError, match="source language"):
        backend.translate_speech(np.zeros(16000, np.float32), "fre", "deu")


def test_visual_detector_rebuilt_on_fps_mismatch():
    """A preset detector with the wrong frame clock must not scale segment
    times: mapping with video_fps=30 may not reuse a 25 fps detector."""
    from expressive_speech_translation_tpu.pipeline.cascaded import CascadedBackend
    from expressive_speech_translation_tpu.pipeline.engines import fake_engines
    from expressive_speech_translation_tpu.pipeline.visual_speech_detector import (
        VisualSpeechDetector,
    )

    backend = CascadedBackend(fake_engines())
    used = {}

    class SpyDetector(VisualSpeechDetector):
        def detect_speech_segments(self, frames):
            used["fps"] = self.fps
            return []

    backend.visual_mapper.detector = SpyDetector(fps=25.0)
    frames = [np.zeros((8, 8, 3), np.uint8)] * 12
    backend._apply_natural_temporal_mapping(
        np.zeros(1600, np.float32), np.zeros(16000, np.float32), [],
        original_video_frames=frames, video_fps=30.0)
    # mismatched preset replaced by a 30 fps detector (the spy never ran)
    assert "fps" not in used
    backend._apply_natural_temporal_mapping(
        np.zeros(1600, np.float32), np.zeros(16000, np.float32), [],
        original_video_frames=frames, video_fps=25.0)
    assert used["fps"] == 25.0


def test_initialize_warms_all_three_stages():
    from expressive_speech_translation_tpu.pipeline.cascaded import CascadedBackend
    from expressive_speech_translation_tpu.pipeline.engines import fake_engines

    engines = fake_engines()
    calls = []
    orig = engines.nmt.translate
    engines.nmt.translate = lambda *a, **k: (calls.append(a), orig(*a, **k))[1]
    backend = CascadedBackend(engines)
    backend.initialize()
    assert calls, "warm-up never touched the NMT stage"


def test_music_detection_handles_sub_frame_audio():
    from expressive_speech_translation_tpu.pipeline.audio_processor import AudioProcessor

    out = AudioProcessor().detect_background_music(np.zeros(300, np.float32))
    assert out["has_music"] is False and out["confidence"] == 0.0


def test_multichannel_downmix_keeps_center_dialog():
    """5.1 input: the center channel (dialogue) must survive the downmix —
    a front-L/R-only mix would nearly silence center-only speech."""
    from expressive_speech_translation_tpu.pipeline.audio_processor import AudioProcessor

    t = np.arange(16000) / 16000
    speech = (0.8 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    five_one = np.zeros((6, 16000), np.float32)
    five_one[2] = speech                      # center channel only
    out = AudioProcessor().process_audio(five_one, orig_sr=16000)
    assert float(np.sqrt(np.mean(out ** 2))) > 0.01
