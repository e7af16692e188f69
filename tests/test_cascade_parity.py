"""End-to-end cascade parity: CascadedBackend.translate_speech vs a torch
reference cascade on SHARED tiny random weights and a SHARED trained tokenizer.

This is the strongest available proxy for the BLEU ≤ 0.5 gate (BASELINE.md)
while no real checkpoints exist in this environment: the torch side rebuilds
the reference's pipeline semantics (whisper greedy temp-0 transcribe →
NLLB forced-BOS generate, services/cascaded_backend.py:397-483) from the SAME
state dicts the JAX engines consume through models/loaders converters, and the
transcripts must be TOKEN-EXACT through the whole pipeline — mel frontend,
encoder, KV-cached greedy decode, tokenizer round-trips, language-token
resolution.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from expressive_speech_translation_tpu.models import nllb as nj
from expressive_speech_translation_tpu.models import whisper as wj
from expressive_speech_translation_tpu.pipeline.backend import TranslationManager
from expressive_speech_translation_tpu.pipeline.cascaded import CascadedBackend
from expressive_speech_translation_tpu.pipeline.engines import Engines, FakeTts
from expressive_speech_translation_tpu.pipeline.jax_engines import (
    JaxNllbNmt, JaxWhisperAsr,
)
from expressive_speech_translation_tpu.pipeline.languages import (
    NLLB_LANGUAGES, whisper_lang_index,
)
from expressive_speech_translation_tpu.pipeline.tokenizer import (
    nllb_lang_ids, train_bpe_tokenizer,
)

torch = pytest.importorskip("torch")

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "hello world this is a speech translation test",
    "please call stella ask her to bring these things",
    "le renard brun saute par dessus le chien paresseux",
] * 10

MAX_ASR_TOKENS = 16
MAX_NMT_TOKENS = 16


@pytest.fixture(scope="module")
def tok():
    return train_bpe_tokenizer(
        CORPUS, vocab_size=512, lang_codes=sorted(set(NLLB_LANGUAGES.values()))
    )


@pytest.fixture(scope="module")
def whisper_pair(tok):
    """Tiny whisper with the REAL multilingual special-token layout scaled to
    a small vocab: content = tokenizer ids, specials stacked on top (eos, bos,
    99 language tokens, tasks, notimestamps) — exactly whisper's convention."""
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperForConditionalGeneration

    v = tok.vocab_size
    cfg = wj.WhisperConfig(
        d_model=64, encoder_layers=2, decoder_layers=2, heads=4, ffn_dim=128,
        vocab_size=v + 105, max_source_positions=1500, max_target_positions=64,
        eos_token=v, bos_token=v + 1, lang_token_start=v + 2,
        task_translate=v + 101, task_transcribe=v + 102, no_timestamps=v + 103,
        sop_token=v + 104,
    )
    hf_cfg = HFConfig(
        vocab_size=cfg.vocab_size, num_mel_bins=80,
        encoder_layers=2, encoder_attention_heads=4,
        decoder_layers=2, decoder_attention_heads=4,
        d_model=64, encoder_ffn_dim=128, decoder_ffn_dim=128,
        max_source_positions=1500, max_target_positions=64,
        eos_token_id=cfg.eos_token, bos_token_id=cfg.bos_token,
        pad_token_id=cfg.eos_token, decoder_start_token_id=cfg.bos_token,
    )
    torch.manual_seed(0)
    model = WhisperForConditionalGeneration(hf_cfg).eval()
    # Damp the special-token rows of the tied embedding (BEFORE conversion, so
    # both sides share it): in a 200-ish-token toy vocab the 104 specials
    # would otherwise dominate random-weight greedy argmax and transcripts
    # would be empty, making parity vacuous.
    with torch.no_grad():
        model.model.decoder.embed_tokens.weight[v:] *= 0.05
    params = wj.from_hf_state_dict(model.state_dict(), cfg)
    return model, cfg, params


@pytest.fixture(scope="module")
def nllb_pair(tok):
    from transformers import M2M100Config, M2M100ForConditionalGeneration

    cfg = nj.NLLBConfig(d_model=64, encoder_layers=2, decoder_layers=2,
                        heads=4, ffn_dim=128, vocab_size=tok.vocab_size,
                        max_positions=64)
    hf_cfg = M2M100Config(
        vocab_size=cfg.vocab_size, d_model=64,
        encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=128, decoder_ffn_dim=128,
        max_position_embeddings=64,
        pad_token_id=1, bos_token_id=0, eos_token_id=2,
        decoder_start_token_id=2,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        scale_embedding=True,
    )
    torch.manual_seed(1)
    model = M2M100ForConditionalGeneration(hf_cfg).eval()
    # Same special-row damping (see whisper_pair): keep eos/pad/lang rows from
    # dominating greedy argmax so translations carry real content tokens.
    lang_rows = sorted(nllb_lang_ids(tok).values())
    with torch.no_grad():
        w = model.model.decoder.embed_tokens.weight
        w[:4] *= 0.05
        w[torch.tensor(lang_rows)] *= 0.05
    params = nj.from_hf_state_dict(model.state_dict(), cfg)
    return model, cfg, params


@pytest.fixture(scope="module")
def audio():
    g = np.random.default_rng(7)
    return (0.1 * g.standard_normal(16_000 * 5)).astype(np.float32)


# ------------------------------------------------------- torch reference side


def torch_whisper_transcribe(model, cfg, tok, audio, language="eng"):
    """The reference's ASR stage: HF feature extractor → greedy temp-0 decode
    from [<|sot|>, <|lang|>, <|transcribe|>, <|notimestamps|>]."""
    from transformers import WhisperFeatureExtractor

    fe = WhisperFeatureExtractor()
    mel = fe(audio, sampling_rate=16_000, return_tensors="np")["input_features"]
    prompt = [cfg.bos_token, cfg.lang_token_start + whisper_lang_index(language),
              cfg.task_transcribe, cfg.no_timestamps]
    ids = torch.tensor([prompt])
    mel_t = torch.from_numpy(mel)
    with torch.no_grad():
        for _ in range(MAX_ASR_TOKENS):
            logits = model(input_features=mel_t, decoder_input_ids=ids).logits
            nxt = int(logits[0, -1].argmax())
            ids = torch.cat([ids, torch.tensor([[nxt]])], dim=1)
            if nxt == cfg.eos_token:
                break
    floor = min(cfg.eos_token, cfg.bos_token, cfg.lang_token_start)
    gen = [int(t) for t in ids[0, len(prompt):] if t != cfg.eos_token and t < floor]
    return gen, tok.decode(gen).strip()


def torch_nllb_translate(model, cfg, tok, lang_ids, text, src_lang, tgt_lang):
    """The reference's NMT stage: NLLB tokenize ([src_lang] X [eos]) →
    generate with forced target-language BOS (cascaded_backend.py:434-443)."""
    src = [lang_ids[src_lang]] + tok.encode(text)[: cfg.max_positions - 2] + [cfg.eos_token]
    input_ids = torch.tensor([src])
    with torch.no_grad():
        out = model.generate(
            input_ids=input_ids,
            attention_mask=torch.ones_like(input_ids),
            forced_bos_token_id=lang_ids[tgt_lang],
            max_new_tokens=MAX_NMT_TOKENS, num_beams=1, do_sample=False,
        ).numpy()[0]
    content = [int(t) for t in out[2:] if t not in (cfg.eos_token, cfg.pad_token)]
    return content, tok.decode(content)


# ------------------------------------------------------------------ the tests


@pytest.fixture(scope="module")
def jax_backend(tok, whisper_pair, nllb_pair):
    _, wcfg, wparams = whisper_pair
    _, ncfg, nparams = nllb_pair
    # temperatures=(0.0,): the torch side of this harness decodes pure greedy,
    # so whisper's temperature-fallback ladder must not trigger (random-ish
    # tiny weights emit repetitive text that trips the compression gate)
    asr = JaxWhisperAsr(wcfg, wparams, tok, dtype=jnp.float32,
                        max_new_tokens=MAX_ASR_TOKENS, temperatures=(0.0,),
                        suppress_blank=False)  # torch side is unsuppressed greedy
    nmt = JaxNllbNmt(ncfg, nparams, tok, dtype=jnp.float32,
                     max_new_tokens=MAX_NMT_TOKENS)
    backend = CascadedBackend(Engines(asr=asr, nmt=nmt, tts=FakeTts()))
    manager = TranslationManager()
    manager.register_backend("cascaded", backend, is_default=True)
    return backend


def test_asr_stage_token_exact(whisper_pair, tok, audio, jax_backend):
    model, cfg, _ = whisper_pair
    ref_ids, ref_text = torch_whisper_transcribe(model, cfg, tok, audio)
    got = jax_backend.engines.asr.transcribe(audio, language="eng")
    got_ids = tok.encode(got["text"]) if got["text"] else []
    assert got["text"] == ref_text
    # transcripts must carry REAL content for the parity to be meaningful
    assert len(ref_ids) > 0, "seed produced an empty transcript — change seed"
    assert got_ids == tok.encode(ref_text)


def test_nmt_stage_token_exact(nllb_pair, tok):
    model, cfg, nparams = nllb_pair
    lang_ids = nllb_lang_ids(tok)
    eng = JaxNllbNmt(cfg, nparams, tok, dtype=jnp.float32,
                     max_new_tokens=MAX_NMT_TOKENS)
    text = "hello world this is a test"
    ref_ids, ref_text = torch_nllb_translate(
        model, cfg, tok, lang_ids, text, "eng_Latn", "fra_Latn")
    got = eng.translate(text, "eng_Latn", "fra_Latn")
    assert got == ref_text
    assert len(ref_ids) > 0, "seed produced an empty translation — change seed"


def test_full_cascade_transcript_parity(whisper_pair, nllb_pair, tok, audio, jax_backend):
    """The pipeline-level gate: transcripts out of translate_speech equal the
    torch cascade's, token for token."""
    wmodel, wcfg, _ = whisper_pair
    nmodel, ncfg, _ = nllb_pair
    lang_ids = nllb_lang_ids(tok)

    _, ref_source = torch_whisper_transcribe(wmodel, wcfg, tok, audio)
    _, ref_target = torch_nllb_translate(
        nmodel, ncfg, tok, lang_ids, ref_source, "eng_Latn", "fra_Latn")

    result = jax_backend.translate_speech(audio, "eng", "fra")
    assert result["transcripts"]["source"] == ref_source
    assert result["transcripts"]["target"] == ref_target
    assert result["audio"].shape[0] == 1 and result["audio"].shape[1] > 0
    assert jax_backend.weights_info() == "fake"  # TTS stage is the fake


def test_cascade_parity_second_utterance(whisper_pair, nllb_pair, tok, jax_backend):
    """Different audio → different transcript, still token-exact (guards
    against both sides agreeing only on degenerate output)."""
    g = np.random.default_rng(23)
    audio2 = (0.2 * np.sin(2 * np.pi * 220 * np.arange(16_000 * 3) / 16_000)
              + 0.05 * g.standard_normal(16_000 * 3)).astype(np.float32)
    wmodel, wcfg, _ = whisper_pair
    nmodel, ncfg, _ = nllb_pair
    lang_ids = nllb_lang_ids(tok)
    _, ref_source = torch_whisper_transcribe(wmodel, wcfg, tok, audio2)
    _, ref_target = torch_nllb_translate(
        nmodel, ncfg, tok, lang_ids, ref_source, "eng_Latn", "deu_Latn")
    result = jax_backend.translate_speech(audio2, "eng", "deu")
    assert result["transcripts"]["source"] == ref_source
    assert result["transcripts"]["target"] == ref_target


def torch_whisper_transcribe_conditioned(model, cfg, tok, audio, asr,
                                         language="eng"):
    """Torch mirror of the engine's condition_on_previous_text chunk loop
    (whisper.transcribe semantics: [<|startofprev|>] + previous tokens +
    standard prompt, context truncated to the engine's static buckets)."""
    from transformers import WhisperFeatureExtractor

    fe = WhisperFeatureExtractor()
    chunk = 16_000 * 30
    prev: list = []
    out_tokens = []
    for start in range(0, len(audio), chunk):
        seg = audio[start:start + chunk]
        mel = fe(seg, sampling_rate=16_000, return_tensors="np")["input_features"]
        base = [cfg.bos_token, cfg.lang_token_start + whisper_lang_index(language),
                cfg.task_transcribe, cfg.no_timestamps]
        ctx_bucket = max((b for b in asr.PREV_CTX_BUCKETS if b <= len(prev)),
                         default=0)
        prompt = ([cfg.sop_token] + prev[-ctx_bucket:] + base) if ctx_bucket else base
        ids = torch.tensor([prompt])
        mel_t = torch.from_numpy(mel)
        with torch.no_grad():
            for _ in range(MAX_ASR_TOKENS):
                logits = model(input_features=mel_t, decoder_input_ids=ids).logits
                nxt = int(logits[0, -1].argmax())
                ids = torch.cat([ids, torch.tensor([[nxt]])], dim=1)
                if nxt == cfg.eos_token:
                    break
        floor = min(cfg.eos_token, cfg.bos_token, cfg.lang_token_start)
        gen = [int(t) for t in ids[0, len(prompt):]
               if t != cfg.eos_token and t < floor]
        prev = prev + gen
        out_tokens.append(gen)
    return out_tokens


def test_conditioned_multichunk_parity(whisper_pair, tok):
    """condition_on_previous_text across chunks must be token-exact vs the
    torch mirror — chunk 2's prompt carries chunk 1's tokens through
    <|startofprev|> with the same context-bucket truncation."""
    model, cfg, params = whisper_pair
    g = np.random.default_rng(11)
    audio35 = (0.1 * g.standard_normal(16_000 * 35)).astype(np.float32)

    asr = JaxWhisperAsr(cfg, params, tok, dtype=jnp.float32,
                        max_new_tokens=MAX_ASR_TOKENS, temperatures=(0.0,),
                        suppress_blank=False)
    ref_chunks = torch_whisper_transcribe_conditioned(model, cfg, tok, audio35, asr)
    assert sum(len(c) for c in ref_chunks) > 0  # non-vacuous
    assert len(ref_chunks) == 2

    got = asr.transcribe(audio35, language="eng")
    ref_text = " ".join(t for t in (tok.decode(c).strip() for c in ref_chunks) if t)
    assert got["text"] == ref_text

    # and with conditioning off, chunk 2 decodes differently (the context
    # genuinely flows into the prompt) — unless the model ignores it, which
    # the tiny random weights here do not
    bare = JaxWhisperAsr(cfg, params, tok, dtype=jnp.float32,
                         max_new_tokens=MAX_ASR_TOKENS, temperatures=(0.0,),
                         suppress_blank=False, condition_on_previous_text=False)
    assert bare.transcribe(audio35, language="eng")["text"] != got["text"]
