"""Serving micro-batcher: coalescing, correctness, error fan-out, and the
batched TTS dispatch path (the reference serves one request per GPU pass —
Docker/cosyvoice_api.py:96; this is the TPU-native throughput answer)."""

import threading
import time

import numpy as np
import pytest

from expressive_speech_translation_tpu.serve.batching import (
    BatchedTts,
    MicroBatcher,
    bucket_batch,
)


def test_bucket_batch():
    # above the top bucket, keep doubling — callers size batch ARRAYS from
    # the return value, so it must never be < n (40 flattened ASR rows from
    # four 300 s uploads used to overflow a 32-row array)
    assert [bucket_batch(n) for n in (1, 2, 3, 5, 8, 9, 17, 40, 99)] == \
        [1, 2, 4, 8, 8, 16, 32, 64, 128]
    assert bucket_batch(40, (1, 2, 4, 8, 16, 32)) == 64


def test_microbatcher_coalesces_and_preserves_mapping():
    calls = []

    def run(items):
        calls.append(len(items))
        time.sleep(0.05)  # force queue build-up behind the first batch
        return [x * 10 for x in items]

    mb = MicroBatcher(run, max_batch=8, max_wait_ms=30)
    futs = [mb.submit(i) for i in range(16)]
    results = [f.result(timeout=10) for f in futs]
    mb.shutdown()
    assert results == [i * 10 for i in range(16)]
    assert sum(calls) == 16
    assert len(calls) < 16, f"no coalescing happened: {calls}"
    assert mb.n_items == 16 and mb.n_batches == len(calls)


def test_microbatcher_error_fans_out_and_recovers():
    def run(items):
        if any(x < 0 for x in items):
            raise ValueError("bad item")
        return items

    mb = MicroBatcher(run, max_batch=4, max_wait_ms=5)
    bad = mb.submit(-1)
    with pytest.raises(ValueError):
        bad.result(timeout=10)
    # the batcher must keep serving after a failed batch
    assert mb.submit(7).result(timeout=10) == 7
    mb.shutdown()
    with pytest.raises(RuntimeError):
        mb.submit(1)


def test_microbatcher_concurrent_callers():
    mb = MicroBatcher(lambda xs: [x + 1 for x in xs], max_batch=8, max_wait_ms=10)
    out = {}

    def call(i):
        out[i] = mb(i)

    threads = [threading.Thread(target=call, args=(i,)) for i in range(12)]
    [t.start() for t in threads]
    [t.join() for t in threads]
    mb.shutdown()
    assert out == {i: i + 1 for i in range(12)}


class _FakeBatchTts:
    sample_rate = 24_000

    def __init__(self):
        self.batch_sizes = []

    def synthesize_batch(self, requests):
        self.batch_sizes.append(len(requests))
        return [np.full(100 + len(r["text"]), 0.1, np.float32) for r in requests]


def test_batched_tts_facade():
    inner = _FakeBatchTts()
    tts = BatchedTts(inner, max_batch=4, max_wait_ms=20)
    results = {}

    def call(i):
        results[i] = tts.synthesize("x" * i)

    threads = [threading.Thread(target=call, args=(i,)) for i in range(8)]
    [t.start() for t in threads]
    [t.join() for t in threads]
    tts.shutdown()
    for i in range(8):
        assert len(results[i]) == 100 + i
    assert tts.stats["items"] == 8
    assert max(inner.batch_sizes) > 1, "facade never batched concurrent calls"
    with pytest.raises(TypeError):
        BatchedTts(object())


def test_jax_tts_synthesize_batch_mixed_conditioning():
    """Batched engine path: mixed with/without-reference requests through ONE
    dispatch; every output is a finite waveform of whole-token length."""
    import jax.numpy as jnp

    from expressive_speech_translation_tpu.models import cosyvoice as cvm
    from expressive_speech_translation_tpu.models import qwen2 as q2
    from expressive_speech_translation_tpu.pipeline.jax_engines import JaxCosyVoiceTts

    cfg = cvm.CosyVoiceConfig(
        lm=cvm.SpeechLMConfig(
            backbone=q2.Qwen2Config(hidden=32, layers=1, heads=4, kv_heads=2,
                                    ffn_dim=64, max_positions=512),
            text_vocab=128, speech_token_size=61),
        flow=cvm.FlowConfig(token_vocab=64, dim=32, layers=1, heads=4, n_steps=2),
        vocoder=cvm.VocoderConfig(base_channels=32, upsample_rates=(8, 6, 10),
                                  upsample_kernels=(16, 12, 20)),
    )
    tts = JaxCosyVoiceTts(cfg, dtype=jnp.float32, seconds_per_char=0.02)
    ref = (0.3 * np.sin(2 * np.pi * 180 * np.arange(32000) / 16000)).astype(np.float32)
    reqs = [
        {"text": "hello batched world"},
        {"text": "short"},
        {"text": "a cloned voice request", "reference_audio_16k": ref},
    ]
    outs = tts.synthesize_batch(reqs)
    assert len(outs) == 3
    spt = cfg.flow.token_mel_ratio * cfg.vocoder.hop
    for w in outs:
        assert w.dtype == np.float32 and np.isfinite(w).all()
        assert len(w) % spt == 0 and len(w) > 0
    assert tts.synthesize_batch([]) == []


def test_cosyvoice_service_with_batching_enabled():
    """Service facade wires BatchedTts and reports stats on /health."""
    from werkzeug.test import Client

    from expressive_speech_translation_tpu.serve.model_services import CosyVoiceService

    class _Batchable:
        sample_rate = 24_000

        def synthesize_batch(self, requests):
            return [np.zeros(240, np.float32) for _ in requests]

        def synthesize(self, text, **kw):  # bypassed when wrapped
            raise AssertionError("wrapped model's synthesize must not be called")

    svc = CosyVoiceService({"default": _Batchable}, batching=True, max_batch=4,
                           batch_wait_ms=5)
    client = Client(svc)
    resp = client.post("/generate-speech/", data={"text": "hi"})
    assert resp.status_code == 200 and resp.data[:4] == b"RIFF"
    health = client.get("/health").get_json()
    assert health["batching"]["default"] == {"items": 1, "batches": 1}


def test_jax_asr_transcribe_batch_matches_single():
    """Batched ASR must produce the same transcripts/word times as the
    single-request path (greedy decode is deterministic)."""
    import jax.numpy as jnp

    from expressive_speech_translation_tpu.models import whisper as wjm
    from expressive_speech_translation_tpu.pipeline.jax_engines import JaxWhisperAsr
    from expressive_speech_translation_tpu.serve.batching import BatchedAsr

    cfg = wjm.WhisperConfig(
        n_mels=80, d_model=64, encoder_layers=1, decoder_layers=1, heads=4,
        vocab_size=51865, max_source_positions=1500, max_target_positions=448,
    )
    asr = JaxWhisperAsr(cfg, dtype=jnp.float32, max_new_tokens=8)
    g = np.random.default_rng(0)
    a1 = (0.2 * g.standard_normal(16000 * 2)).astype(np.float32)
    a2 = (0.2 * np.sin(2 * np.pi * 300 * np.arange(16000 * 35) / 16000)).astype(np.float32)

    single = [asr.transcribe(a1), asr.transcribe(a2, language="fra")]
    batched = asr.transcribe_batch([
        {"audio_16k": a1}, {"audio_16k": a2, "language": "fra"},
    ])
    for s, b in zip(single, batched):
        assert b["text"] == s["text"]
        assert b["language"] == s["language"]
        assert b["words"] == s["words"]

    facade = BatchedAsr(asr, max_batch=4, max_wait_ms=5)
    out = facade.transcribe(a1)
    facade.shutdown()
    assert out["text"] == single[0]["text"]
    with pytest.raises(TypeError):
        BatchedAsr(object())


def test_jax_nmt_translate_batch_matches_single():
    """Batched NMT (grouped by target language) must match the single path
    token-for-token (beam/greedy decode is deterministic)."""
    from expressive_speech_translation_tpu.pipeline.jax_engines import JaxNllbNmt
    from expressive_speech_translation_tpu.serve.batching import BatchedNmt

    nmt = JaxNllbNmt(max_new_tokens=12)
    reqs = [
        {"text": "hello world", "source_lang": "eng", "target_lang": "fra"},
        {"text": "good morning", "source_lang": "eng", "target_lang": "deu"},
        {"text": "a longer sentence to translate now", "source_lang": "eng",
         "target_lang": "fra"},
    ]
    single = [nmt.translate(r["text"], r["source_lang"], r["target_lang"]) for r in reqs]
    batched = nmt.translate_batch(reqs)
    assert batched == single
    assert nmt.translate_batch([]) == []

    facade = BatchedNmt(nmt, max_batch=4, max_wait_ms=5)
    assert facade.translate(**reqs[0]) == single[0]
    facade.shutdown()
    with pytest.raises(TypeError):
        BatchedNmt(object())


def test_nmt_long_source_does_not_crash():
    """Sources longer than TEXT_BUCKETS[-1] ride a doubled bucket (clamped to
    max_positions) instead of crashing the padded-row assignment
    (regression: 259-token source raised a numpy broadcast ValueError)."""
    import jax.numpy as jnp

    from expressive_speech_translation_tpu.models import nllb as njm
    from expressive_speech_translation_tpu.pipeline.jax_engines import JaxNllbNmt

    ncfg = njm.NLLBConfig(d_model=32, encoder_layers=1, decoder_layers=1,
                          heads=4, ffn_dim=64, vocab_size=384)
    nmt = JaxNllbNmt(ncfg, dtype=jnp.float32, max_new_tokens=4)
    long_text = "a long transcript sentence " * 20   # >256 byte tokens
    assert len(nmt.tokenizer.encode(long_text)) > 256
    out = nmt.translate(long_text, "eng", "fra")
    assert isinstance(out, str)
    outs = nmt.translate_batch([
        {"text": long_text, "source_lang": "eng", "target_lang": "fra"},
        {"text": "short", "source_lang": "eng", "target_lang": "fra"},
    ])
    assert len(outs) == 2 and all(isinstance(t, str) for t in outs)
    # bucket clamps to the encoder's positional capacity
    assert nmt._src_bucket(10_000) == ncfg.max_positions


def test_tts_single_path_trims_budget_tail():
    """synthesize() must cut the waveform at the EOS-determined token length
    like synthesize_batch does — post-EOS frames are vocoded from zeroed
    tokens (regression: the single path returned the full decode budget)."""
    import jax.numpy as jnp

    from expressive_speech_translation_tpu.models import cosyvoice as cvm
    from expressive_speech_translation_tpu.models import qwen2 as q2
    from expressive_speech_translation_tpu.pipeline.jax_engines import JaxCosyVoiceTts

    cfg = cvm.CosyVoiceConfig(
        lm=cvm.SpeechLMConfig(
            backbone=q2.Qwen2Config(hidden=32, layers=1, heads=4, kv_heads=2,
                                    ffn_dim=64, max_positions=512),
            text_vocab=128, speech_token_size=61),
        flow=cvm.FlowConfig(token_vocab=64, dim=32, layers=1, heads=4, n_steps=2),
        vocoder=cvm.VocoderConfig(base_channels=32),
    )
    tts = JaxCosyVoiceTts(cfg, dtype=jnp.float32, seconds_per_char=0.02)
    captured = {}
    orig = tts._fn

    def spy(*a):
        audio, lengths = orig(*a)
        captured["len"] = int(np.asarray(lengths)[0])
        return audio, lengths

    tts._fn = spy
    audio = tts.synthesize("hello trimmed world")
    assert len(audio) == max(captured["len"], 1) * tts._samples_per_token()


def test_tts_style_prompt_rides_in_text_tokens():
    """With a cloning reference, the prompt transcription precedes the tts
    text in the LM's text tokens (inference_zero_shot contract); without a
    reference the prompt is ignored; tts text keeps priority for the budget."""
    import jax.numpy as jnp

    from expressive_speech_translation_tpu.models import cosyvoice as cvm
    from expressive_speech_translation_tpu.models import qwen2 as q2
    from expressive_speech_translation_tpu.pipeline.jax_engines import JaxCosyVoiceTts

    cfg = cvm.CosyVoiceConfig(
        lm=cvm.SpeechLMConfig(
            backbone=q2.Qwen2Config(hidden=32, layers=1, heads=4, kv_heads=2,
                                    ffn_dim=64, max_positions=512),
            text_vocab=128, speech_token_size=61),
        flow=cvm.FlowConfig(token_vocab=64, dim=32, layers=1, heads=4, n_steps=2),
        vocoder=cvm.VocoderConfig(base_channels=32),
    )
    tts = JaxCosyVoiceTts(cfg, dtype=jnp.float32)
    ref = np.ones(16_000, np.float32)
    enc = tts.tokenizer.encode
    assert tts._text_ids("hi there", "", ref) == enc("hi there")
    assert tts._text_ids("hi there", "the prompt", None) == enc("hi there")
    with_prompt = tts._text_ids("hi there", "the prompt", ref)
    assert with_prompt == enc("the prompt") + enc("hi there")
    # text priority: a full-budget text leaves no room for the prompt
    long = "x" * 300
    assert tts._text_ids(long, "the prompt", ref) == enc(long)[:256]
    # a reference too short to engage prompt-speech conditioning (≤0.1 s)
    # must not prepend the prompt TEXT either: prompt text without covering
    # prompt speech tokens makes the LM speak the style prompt aloud
    short_ref = np.ones(1600, np.float32)
    assert tts._text_ids("hi there", "the prompt", short_ref) == enc("hi there")


def test_asr_batch_language_detection_is_batched():
    """Language-less batch requests must NOT pay one serial detect dispatch
    per request — detection rides one batched program."""
    import jax.numpy as jnp

    from expressive_speech_translation_tpu.models import whisper as wj
    from expressive_speech_translation_tpu.pipeline.jax_engines import JaxWhisperAsr

    wcfg = wj.WhisperConfig(n_mels=80, d_model=64, encoder_layers=1,
                            decoder_layers=1, heads=4, ffn_dim=128,
                            vocab_size=51865)
    asr = JaxWhisperAsr(wcfg, dtype=jnp.float32, max_new_tokens=4,
                        context_buckets=(4,))

    def boom(*a):
        raise AssertionError("single-row detect used on the batch path")

    asr._detect_fn = boom
    g = np.random.default_rng(0)
    reqs = [{"audio_16k": (0.2 * g.standard_normal(16000 * 2)).astype(np.float32),
             "language": None} for _ in range(3)]
    out = asr.transcribe_batch(reqs)
    assert len(out) == 3 and all(isinstance(r["language"], str) and r["language"]
                                 for r in out)


def test_quantized_asr_nmt_engines_run():
    """quantize=True engines (int8 decoder weights) produce results of the
    same shape/type as float engines."""
    import jax.numpy as jnp

    from expressive_speech_translation_tpu.models import nllb as njm
    from expressive_speech_translation_tpu.models import whisper as wjm
    from expressive_speech_translation_tpu.pipeline.jax_engines import (
        JaxNllbNmt,
        JaxWhisperAsr,
    )

    wcfg = wjm.WhisperConfig(d_model=64, encoder_layers=1, decoder_layers=1,
                             heads=4, ffn_dim=128)
    asr = JaxWhisperAsr(wcfg, dtype=jnp.float32, max_new_tokens=4, quantize=True)
    assert asr.params["decoder"]["embed_q"]["q"].dtype == jnp.int8
    out = asr.transcribe(np.zeros(16000, np.float32), language="eng")
    assert set(out) == {"text", "language", "words"}

    ncfg = njm.NLLBConfig(d_model=64, encoder_layers=1, decoder_layers=1,
                          heads=4, ffn_dim=128, vocab_size=512)
    nmt = JaxNllbNmt(ncfg, dtype=jnp.float32, max_new_tokens=6, quantize=True)
    assert nmt.params["embed_q"]["q"].dtype == jnp.int8
    assert isinstance(nmt.translate("hello", "eng", "fra"), str)


def test_asr_context_buckets():
    """Bucketed encoder context: identical results whenever the utterance
    lands in the same bucket, valid output for smaller buckets, and host-side
    padding so every bucket is one compiled shape (VERDICT r1 #4)."""
    import jax.numpy as jnp

    from expressive_speech_translation_tpu.models import whisper as wjm
    from expressive_speech_translation_tpu.pipeline.jax_engines import JaxWhisperAsr

    cfg = wjm.WhisperConfig(
        n_mels=80, d_model=64, encoder_layers=1, decoder_layers=1, heads=4,
        vocab_size=51865, max_source_positions=1500, max_target_positions=448,
    )
    g = np.random.default_rng(1)
    a3 = (0.2 * g.standard_normal(16000 * 3)).astype(np.float32)

    full = JaxWhisperAsr(cfg, dtype=jnp.float32, max_new_tokens=8,
                         context_buckets=(4,))
    bucketed = JaxWhisperAsr(cfg, dtype=jnp.float32, max_new_tokens=8,
                             context_buckets=(2, 4))
    # 3 s audio lands in the 4 s bucket either way → identical output
    assert bucketed.transcribe(a3, language="eng") == full.transcribe(a3, language="eng")

    # 1.5 s audio uses the 2 s context: different window, still valid words
    a15 = a3[: 16000 * 3 // 2]
    out = bucketed.transcribe(a15, language="eng")
    assert all(0.0 <= w["start"] <= w["end"] <= 1.6 for w in out["words"])

    # batch path shares one window bucket per dispatch and matches single
    single = bucketed.transcribe(a15, language="eng")
    batch = bucketed.transcribe_batch([{"audio_16k": a15, "language": "eng"}])
    assert batch[0]["text"] == single["text"]
    assert batch[0]["words"] == single["words"]

    with pytest.raises(ValueError, match="even seconds"):
        JaxWhisperAsr(cfg, context_buckets=(3,))


def test_pallas_mel_chunk_samples():
    from expressive_speech_translation_tpu.ops import whisper_log_mel
    from expressive_speech_translation_tpu.ops.pallas_mel import (
        whisper_log_mel_pallas,
    )

    g = np.random.default_rng(2)
    x = (0.3 * g.standard_normal(16000 * 7)).astype(np.float32)
    # 10 s context window → 1000 frames; matches the jnp mel on the same window
    ref = np.asarray(whisper_log_mel(x, chunk_samples=16000 * 10))
    got = np.asarray(whisper_log_mel_pallas(x, interpret=True,
                                            chunk_samples=16000 * 10))
    assert got.shape == ref.shape == (80, 1000)
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)

    with pytest.raises(ValueError, match="multiple"):
        whisper_log_mel_pallas(x, interpret=True, chunk_samples=16000 * 5)


def test_whisper_temperature_fallback_ladder():
    """whisper.transcribe parity: rejected rungs escalate temperature; the
    last rung is accepted unconditionally; passing gates stop the ladder."""
    import jax.numpy as jnp

    from expressive_speech_translation_tpu.models import whisper as wjm
    from expressive_speech_translation_tpu.pipeline.jax_engines import JaxWhisperAsr

    cfg = wjm.WhisperConfig(
        n_mels=80, d_model=64, encoder_layers=1, decoder_layers=1, heads=4,
        vocab_size=51865, max_source_positions=1500, max_target_positions=448,
    )
    g = np.random.default_rng(5)
    audio = (0.2 * g.standard_normal(16000 * 2)).astype(np.float32)

    # impossible gate → every rung runs; call counter proves the ladder
    asr = JaxWhisperAsr(cfg, dtype=jnp.float32, max_new_tokens=6,
                        context_buckets=(2,), temperatures=(0.0, 0.5, 1.0),
                        logprob_threshold=1.0)  # avg_logprob can never reach +1
    calls = []
    inner = asr._fn
    asr._fn = lambda *a: (calls.append(float(a[3])) or inner(*a))
    asr.transcribe(audio, language="eng")
    assert calls == [0.0, 0.5, 1.0]

    # permissive gates → greedy accepted immediately
    asr2 = JaxWhisperAsr(cfg, dtype=jnp.float32, max_new_tokens=6,
                         context_buckets=(2,), temperatures=(0.0, 0.5, 1.0),
                         logprob_threshold=-1e9,
                         compression_ratio_threshold=1e9)
    calls2 = []
    inner2 = asr2._fn
    asr2._fn = lambda *a: (calls2.append(float(a[3])) or inner2(*a))
    out_fallback_off = asr2.transcribe(audio, language="eng")
    assert calls2 == [0.0]

    # weightless default: greedy-only (no 6x cost on random weights)
    asr3 = JaxWhisperAsr(cfg, dtype=jnp.float32, max_new_tokens=6,
                         context_buckets=(2,))
    assert asr3.temperatures == (0.0,)
    # and greedy ladder output equals the plain greedy decode
    assert asr3.transcribe(audio, language="eng")["text"] == out_fallback_off["text"]


def test_decode_with_alignment_temperature_semantics():
    """temperature=0 equals greedy; >0 is deterministic per key and returns
    finite logprobs with a correct generated-token count."""
    import jax
    import jax.numpy as jnp

    from expressive_speech_translation_tpu.models import whisper as wjm

    cfg = wjm.WhisperConfig(
        n_mels=80, d_model=32, encoder_layers=1, decoder_layers=1, heads=4,
        vocab_size=1024, bos_token=998, eos_token=999, task_transcribe=1000,
        no_timestamps=1001, lang_token_start=1002, n_langs=4,
    )
    params = wjm.init_whisper(jax.random.PRNGKey(0), cfg)
    g = np.random.default_rng(0)
    mel = jnp.asarray(g.standard_normal((1, 80, 200)), jnp.float32)
    prompt = jnp.asarray([[998]], jnp.int32)

    t0, a0 = wjm.greedy_decode_with_alignment(params, cfg, mel, prompt,
                                              max_new_tokens=8)
    t1, a1, slp, ngen, nsp = wjm.decode_with_alignment(
        params, cfg, mel, prompt, max_new_tokens=8,
        temperature=jnp.float32(0.0), key=jax.random.PRNGKey(3))
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    assert np.isfinite(float(slp[0]))
    assert 1 <= int(ngen[0]) <= 8
    assert 0.0 <= float(nsp[0]) <= 1.0

    s1, _, _, _, _ = wjm.decode_with_alignment(
        params, cfg, mel, prompt, max_new_tokens=8,
        temperature=jnp.float32(2.0), key=jax.random.PRNGKey(3))
    s2, _, _, _, _ = wjm.decode_with_alignment(
        params, cfg, mel, prompt, max_new_tokens=8,
        temperature=jnp.float32(2.0), key=jax.random.PRNGKey(3))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))  # per-key det.


def test_whisper_no_speech_gate():
    """Silent-chunk suppression (whisper no_speech_threshold semantics):
    gate fires only when P(nospeech) is high AND confidence is low."""
    import jax.numpy as jnp

    from expressive_speech_translation_tpu.models import whisper as wjm
    from expressive_speech_translation_tpu.pipeline.jax_engines import JaxWhisperAsr

    cfg = wjm.WhisperConfig(
        n_mels=80, d_model=64, encoder_layers=1, decoder_layers=1, heads=4,
        vocab_size=51865, max_source_positions=1500, max_target_positions=448,
    )
    g = np.random.default_rng(6)
    audio = (0.2 * g.standard_normal(16000 * 2)).astype(np.float32)

    # force the gate: any nospeech prob passes, any logprob counts as low
    gated = JaxWhisperAsr(cfg, dtype=jnp.float32, max_new_tokens=6,
                          context_buckets=(2,), no_speech_threshold=-1.0,
                          logprob_threshold=1e9)
    assert gated.transcribe(audio, language="eng")["text"] == ""
    assert gated.transcribe(audio, language="eng")["words"] == []

    # gate off: output unchanged vs a plain engine
    open_ = JaxWhisperAsr(cfg, dtype=jnp.float32, max_new_tokens=6,
                          context_buckets=(2,), no_speech_threshold=1.1)
    plain = JaxWhisperAsr(cfg, dtype=jnp.float32, max_new_tokens=6,
                          context_buckets=(2,))
    assert open_.transcribe(audio, language="eng")["text"] == \
        plain.transcribe(audio, language="eng")["text"]


def test_whisper_token_suppression():
    """SuppressTokens/SuppressBlank mechanisms: suppressed ids never appear;
    first-token-only suppression applies only at the first generated step."""
    import jax
    import jax.numpy as jnp

    from expressive_speech_translation_tpu.models import whisper as wjm

    cfg = wjm.WhisperConfig(
        n_mels=80, d_model=32, encoder_layers=1, decoder_layers=1, heads=4,
        vocab_size=64, bos_token=60, eos_token=61, task_transcribe=62,
        no_timestamps=63, lang_token_start=50, n_langs=4, no_speech_token=59,
    )
    params = wjm.init_whisper(jax.random.PRNGKey(1), cfg)
    g = np.random.default_rng(1)
    mel = jnp.asarray(g.standard_normal((1, 80, 200)), jnp.float32)
    prompt = jnp.asarray([[60]], jnp.int32)

    base, _, _, _, _ = wjm.decode_with_alignment(
        params, cfg, mel, prompt, max_new_tokens=10, min_new_tokens=10)
    gen = np.asarray(base)[0, 1:]
    banned = tuple(int(t) for t in np.unique(gen) if t != 61)[:2]
    assert banned  # the tiny model emitted something suppressible

    sup, _, _, _, _ = wjm.decode_with_alignment(
        params, cfg, mel, prompt, max_new_tokens=10, min_new_tokens=10,
        suppress_tokens=banned)
    assert not set(banned) & set(np.asarray(sup)[0, 1:].tolist())

    # first-token suppression: the first generated id changes, later steps may
    # still use it
    first_id = int(np.asarray(base)[0, 1])
    sup1, _, _, _, _ = wjm.decode_with_alignment(
        params, cfg, mel, prompt, max_new_tokens=10, min_new_tokens=10,
        suppress_first_tokens=(first_id,))
    assert int(np.asarray(sup1)[0, 1]) != first_id


# --------------------------------------------------------------------------
# Composed serving configuration: CascadedBackend + all three Batched*
# wrappers — the exact shape EST_SERVE__TTS_BATCHING=1 production (and
# bench.py's 8-way burst) runs. Round-2 regression: the empty-translation
# hard-fail (cascaded.py) mis-classified batched engines as weights-loaded
# because the wrappers didn't forward `weightless`.


class _BatchableFakeAsr:
    def __init__(self, weightless):
        self.weightless = weightless

    def _one(self, audio, language):
        dur = len(np.asarray(audio).reshape(-1)) / 16_000.0
        return {"text": "hello world", "language": language or "eng",
                "words": [{"word": "hello", "start": 0.0, "end": dur / 2},
                          {"word": "world", "start": dur / 2, "end": dur}]}

    def transcribe_batch(self, requests):
        return [self._one(r["audio_16k"], r["language"]) for r in requests]


class _BatchableFakeNmt:
    def __init__(self, weightless, empty=False):
        self.weightless = weightless
        self.empty = empty

    def translate_batch(self, requests):
        return ["" if self.empty else f"[{r['target_lang']}] {r['text']}"
                for r in requests]


class _BatchableFakeTts:
    sample_rate = 24_000

    def __init__(self, weightless):
        self.weightless = weightless

    def synthesize_batch(self, requests):
        return [np.zeros(12_000, np.float32) + 0.1 for _ in requests]


def _batched_cascade(*, weightless, empty_nmt=False):
    from expressive_speech_translation_tpu.pipeline.cascaded import CascadedBackend
    from expressive_speech_translation_tpu.pipeline.engines import Engines
    from expressive_speech_translation_tpu.serve.batching import (
        BatchedAsr, BatchedNmt, BatchedTts,
    )

    return CascadedBackend(Engines(
        asr=BatchedAsr(_BatchableFakeAsr(weightless)),
        nmt=BatchedNmt(_BatchableFakeNmt(weightless, empty=empty_nmt)),
        tts=BatchedTts(_BatchableFakeTts(weightless)),
    ))


@pytest.mark.parametrize("weightless", [True, False])
def test_cascade_with_all_batched_wrappers_concurrent(weightless):
    """8 concurrent requests through the fully-batched cascade must all
    succeed in both weightless and weights-loaded modes (round-2 bench
    killer: weightless runs raised 'Translation result was empty')."""
    backend = _batched_cascade(weightless=weightless)
    audio = np.sin(np.arange(16_000) * 0.05).astype(np.float32) * 0.3

    results, errors = [None] * 8, []

    def worker(i):
        try:
            results[i] = backend.translate_speech(audio, "eng", "fra")
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert not errors, f"concurrent batched cascade failed: {errors[:1]}"
    assert all(r is not None and "audio" in r for r in results)
    assert all(r["transcripts"]["target"].startswith("[fra") for r in results)


def test_cascade_batched_empty_translation_gate():
    """The hard-fail gate must see through Batched* wrappers: loaded weights +
    empty translation raises; weightless + empty translation keeps running."""
    audio = np.zeros(16_000, np.float32)

    loaded = _batched_cascade(weightless=False, empty_nmt=True)
    with pytest.raises(RuntimeError, match="Translation result was empty"):
        loaded.translate_speech(audio, "eng", "fra")

    structural = _batched_cascade(weightless=True, empty_nmt=True)
    out = structural.translate_speech(audio, "eng", "fra")
    assert "audio" in out


def test_batched_tts_with_mtp_engine():
    """MTP decode under the serving micro-batcher (the combination
    EST_ENGINES__TTS_MTP=2 + EST_SERVE__TTS_BATCHING=1 runs): a 3-way burst
    coalesces into the batched K-token-per-pass program and every request
    gets trimmed, finite audio."""
    import threading

    import jax.numpy as jnp

    from expressive_speech_translation_tpu.models import cosyvoice as cvm
    from expressive_speech_translation_tpu.models import qwen2 as q2
    from expressive_speech_translation_tpu.pipeline.jax_engines import JaxCosyVoiceTts
    from expressive_speech_translation_tpu.serve.batching import BatchedTts

    cfg = cvm.CosyVoiceConfig(
        lm=cvm.SpeechLMConfig(
            backbone=q2.Qwen2Config(hidden=32, layers=1, heads=4, kv_heads=2,
                                    ffn_dim=64, max_positions=512),
            text_vocab=128, speech_token_size=61),
        flow=cvm.FlowConfig(token_vocab=64, dim=32, layers=1, heads=4, n_steps=2),
        vocoder=cvm.VocoderConfig(base_channels=32),
    )
    tts = BatchedTts(JaxCosyVoiceTts(cfg, dtype=jnp.float32,
                                     seconds_per_char=0.02, mtp=2),
                     max_batch=4, max_wait_ms=200.0)
    assert tts.engine.cfg.lm.mtp == 2

    results, errors = [None] * 3, []

    def worker(i):
        try:
            results[i] = tts.synthesize(f"mtp burst request {i}")
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors, f"batched MTP synth failed: {errors[:1]}"
    assert all(r is not None and np.isfinite(r).all() and len(r) > 0
               for r in results)


def test_batched_wrappers_forward_weightless_and_weights_info():
    from expressive_speech_translation_tpu.pipeline.engines import Engines
    from expressive_speech_translation_tpu.serve.batching import (
        BatchedAsr, BatchedNmt, BatchedTts,
    )

    eng = Engines(
        asr=BatchedAsr(_BatchableFakeAsr(False)),
        nmt=BatchedNmt(_BatchableFakeNmt(False)),
        tts=BatchedTts(_BatchableFakeTts(False)),
    )
    assert eng.asr.weightless is False
    assert eng.nmt.weightless is False
    assert eng.tts.weightless is False
    assert eng.weights_info() == "loaded"

    eng_wl = Engines(
        asr=BatchedAsr(_BatchableFakeAsr(True)),
        nmt=BatchedNmt(_BatchableFakeNmt(True)),
        tts=BatchedTts(_BatchableFakeTts(True)),
    )
    assert eng_wl.nmt.weightless is True
    assert eng_wl.weights_info() == "random"


def test_asr_batch_rows_are_bounded_per_dispatch():
    """An oversized burst (one long file alone can flatten to >32 chunk
    rows) is split into bounded dispatches instead of allocating one
    arbitrarily large device batch — and every chunk's text still lands on
    the right request."""
    import jax.numpy as jnp

    from expressive_speech_translation_tpu.models import whisper as wj
    from expressive_speech_translation_tpu.pipeline.jax_engines import JaxWhisperAsr

    wcfg = wj.WhisperConfig(n_mels=80, d_model=64, encoder_layers=1,
                            decoder_layers=1, heads=4, ffn_dim=128,
                            vocab_size=51865)
    asr = JaxWhisperAsr(wcfg, dtype=jnp.float32, max_new_tokens=4,
                        context_buckets=(4,))
    g = np.random.default_rng(0)
    # 33 four-second chunks across two requests: 120 s + 12 s
    reqs = [
        {"audio_16k": (0.2 * g.standard_normal(16000 * 120)).astype(np.float32),
         "language": "eng"},
        {"audio_16k": (0.2 * g.standard_normal(16000 * 12)).astype(np.float32),
         "language": "eng"},
    ]
    # sentinel decode: tag each chunk with its (offset, seconds) so the
    # routing of rows→requests across the 32-row slice boundary is observable
    def fake_decode(tokens, aligns, p_len, offset, seconds, window_seconds):
        return f"c{offset:g}", [{"t": offset}], 0.0

    asr._decode_chunk_host = fake_decode
    out = asr.transcribe_batch(reqs)
    assert len(out) == 2
    assert all(r["language"] == "eng" for r in out)
    # request 0: 30 four-second chunks at offsets 0,4,...,116;
    # request 1: 3 chunks at 0,4,8 — row 33 crosses into the second dispatch
    assert out[0]["text"].split() == [f"c{4 * k:g}" for k in range(30)]
    assert out[1]["text"].split() == ["c0", "c4", "c8"]
    assert [w["t"] for w in out[1]["words"]] == [0, 4, 8]
