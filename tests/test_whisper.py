"""Whisper-JAX architecture parity vs a random-weight torch HF model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from expressive_speech_translation_tpu.models import whisper as wj

torch = pytest.importorskip("torch")


TINY = dict(
    d_model=64, encoder_layers=2, decoder_layers=2, heads=4, ffn_dim=128,
    vocab_size=1000, max_source_positions=150, max_target_positions=64,
    n_mels=80,
)


@pytest.fixture(scope="module")
def hf_pair():
    from transformers import WhisperConfig as HFConfig, WhisperForConditionalGeneration

    hf_cfg = HFConfig(
        vocab_size=TINY["vocab_size"],
        num_mel_bins=TINY["n_mels"],
        encoder_layers=TINY["encoder_layers"],
        encoder_attention_heads=TINY["heads"],
        decoder_layers=TINY["decoder_layers"],
        decoder_attention_heads=TINY["heads"],
        d_model=TINY["d_model"],
        encoder_ffn_dim=TINY["ffn_dim"],
        decoder_ffn_dim=TINY["ffn_dim"],
        max_source_positions=TINY["max_source_positions"],
        max_target_positions=TINY["max_target_positions"],
        eos_token_id=999, bos_token_id=998, pad_token_id=999,
        decoder_start_token_id=998,
    )
    torch.manual_seed(0)
    model = WhisperForConditionalGeneration(hf_cfg).eval()
    cfg = wj.WhisperConfig(
        **{k: v for k, v in TINY.items()},
        bos_token=998, eos_token=999, task_transcribe=0, task_translate=0, no_timestamps=0,
    )
    params = wj.from_hf_state_dict(model.state_dict(), cfg)
    return model, cfg, params


@pytest.fixture(scope="module")
def mel(hf_pair):
    g = np.random.default_rng(0)
    # mel input length = 2 * max_source_positions (conv stride 2)
    return g.standard_normal((2, TINY["n_mels"], 2 * TINY["max_source_positions"])).astype(np.float32)


def test_encoder_parity(hf_pair, mel):
    model, cfg, params = hf_pair
    with torch.no_grad():
        ref = model.model.encoder(torch.from_numpy(mel)).last_hidden_state.numpy()
    got = np.asarray(wj.encode(params, cfg, jnp.asarray(mel)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def test_decoder_teacher_forced_parity(hf_pair, mel):
    model, cfg, params = hf_pair
    g = np.random.default_rng(1)
    tokens = g.integers(0, 900, size=(2, 7)).astype(np.int64)
    with torch.no_grad():
        ref = model(
            input_features=torch.from_numpy(mel),
            decoder_input_ids=torch.from_numpy(tokens),
        ).logits.numpy()
    enc = wj.encode(params, cfg, jnp.asarray(mel))
    got = np.asarray(wj.decode_full(params, cfg, jnp.asarray(tokens), enc))
    np.testing.assert_allclose(got, ref, atol=3e-3, rtol=1e-3)


def test_incremental_decode_matches_teacher_forced(hf_pair, mel):
    _, cfg, params = hf_pair
    g = np.random.default_rng(2)
    tokens = jnp.asarray(g.integers(0, 900, size=(2, 9)), jnp.int32)
    enc = wj.encode(params, cfg, jnp.asarray(mel))
    full = wj.decode_full(params, cfg, tokens, enc)

    cross_kv = wj.precompute_cross_kv(params, cfg, enc)
    cache = wj.init_kv_cache(cfg, 2)
    step_logits = []
    for i in range(tokens.shape[1]):
        logits, cache = wj.decode_step(
            params, cfg, tokens[:, i], jnp.asarray(i, jnp.int32), cache, cross_kv
        )
        step_logits.append(np.asarray(logits))
    got = np.stack(step_logits, axis=1)
    np.testing.assert_allclose(got, np.asarray(full), atol=2e-3, rtol=1e-3)


def test_greedy_decode_matches_hf_generate(hf_pair, mel):
    model, cfg, params = hf_pair
    prompt = jnp.asarray([[998], [998]], jnp.int32)
    got = np.asarray(
        wj.greedy_decode(params, cfg, jnp.asarray(mel), prompt, max_new_tokens=12)
    )
    with torch.no_grad():
        ref = model.generate(
            input_features=torch.from_numpy(mel),
            decoder_input_ids=torch.tensor([[998], [998]]),
            max_new_tokens=12, do_sample=False, num_beams=1,
        ).numpy()
    # HF's output here excludes the prompt token; ours includes it. Align and
    # compare up to the shorter length (HF stops at EOS; ours pads with EOS).
    for b in range(2):
        ours = got[b, 1:] if ref[b, 0] != 998 else got[b]
        t = min(len(ref[b]), len(ours))
        np.testing.assert_array_equal(ours[:t], ref[b, :t])


def test_greedy_decode_jits_and_stops(hf_pair, mel):
    _, cfg, params = hf_pair
    fn = jax.jit(
        lambda p, m, pr: wj.greedy_decode(p, cfg, m, pr, max_new_tokens=8)
    )
    out = fn(params, jnp.asarray(mel), jnp.asarray([[998], [998]], jnp.int32))
    assert out.shape == (2, 9)
    assert out.dtype == jnp.int32


def test_init_whisper_shapes():
    cfg = wj.WhisperConfig.tiny()
    params = wj.init_whisper(jax.random.PRNGKey(0), cfg)
    assert params["decoder"]["embed"].shape == (cfg.vocab_size, cfg.d_model)
    assert len(params["encoder"]["layers"]) == cfg.encoder_layers
    mel = jnp.zeros((1, cfg.n_mels, 3000))
    out = wj.encode(params, cfg, mel)
    assert out.shape == (1, 1500, cfg.d_model)


def test_alignment_decode_and_dtw(hf_pair, mel):
    """Cross-attention alignment capture + DTW word timing."""
    _, cfg, params = hf_pair
    prompt = jnp.asarray([[998], [998]], jnp.int32)
    tokens, aligns = wj.greedy_decode_with_alignment(
        params, cfg, jnp.asarray(mel), prompt, max_new_tokens=6, min_new_tokens=6
    )
    # same tokens as the plain greedy path
    plain = wj.greedy_decode(params, cfg, jnp.asarray(mel), prompt,
                             max_new_tokens=6, min_new_tokens=6)
    np.testing.assert_array_equal(np.asarray(tokens), np.asarray(plain))
    a = np.asarray(aligns)
    assert a.shape == (2, 7, mel.shape[-1] // 2)
    # attention rows are distributions over encoder frames
    sums = a[:, :-1].sum(-1)
    np.testing.assert_allclose(sums, 1.0, atol=1e-3)

    # DTW on a synthetic diagonal alignment recovers monotonic times
    t_tok, t_enc = 5, 50
    synth = np.full((t_tok, t_enc), 1e-4)
    for i in range(t_tok):
        synth[i, i * 10: (i + 1) * 10] = 1.0
    times = wj.dtw_token_times(synth, t_tok, audio_seconds=5.0)
    assert times.shape == (t_tok,)
    assert (np.diff(times) >= 0).all()
    np.testing.assert_allclose(times, [0.0, 1.0, 2.0, 3.0, 4.0], atol=0.31)


def test_detect_language_range_and_engine_autodetect():
    """detect_language returns a token inside the 99-language block and the
    engine resolves it to an app code when language=None."""
    import jax.numpy as jnp

    from expressive_speech_translation_tpu.models import whisper as wj
    from expressive_speech_translation_tpu.ops import whisper_log_mel
    from expressive_speech_translation_tpu.pipeline.jax_engines import JaxWhisperAsr
    from expressive_speech_translation_tpu.pipeline.languages import (
        WHISPER_LANG_TOKENS,
        whisper_token_to_app,
    )

    cfg = wj.WhisperConfig(d_model=64, encoder_layers=1, decoder_layers=1,
                           heads=4, ffn_dim=128)
    params = wj.init_whisper(jax.random.PRNGKey(0), cfg)
    g = np.random.default_rng(0)
    audio = jnp.asarray(0.1 * g.standard_normal((2, 16000)), jnp.float32)
    mel = whisper_log_mel(audio)
    ids, probs = wj.detect_language(params, cfg, mel)
    assert ids.shape == (2,) and probs.shape == (2, cfg.n_langs)
    lo = cfg.lang_token_start
    assert ((np.asarray(ids) >= lo) & (np.asarray(ids) < lo + cfg.n_langs)).all()
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, rtol=1e-5)
    # deterministic
    ids2, _ = wj.detect_language(params, cfg, mel)
    assert (np.asarray(ids) == np.asarray(ids2)).all()
    assert whisper_token_to_app(WHISPER_LANG_TOKENS["el"]) == "ell"

    asr = JaxWhisperAsr(cfg, dtype=jnp.float32, max_new_tokens=4)
    out = asr.transcribe(np.asarray(audio[0]))
    assert isinstance(out["language"], str) and len(out["language"]) >= 2
    assert out["language"] == asr.detect_language(np.asarray(audio[0]))


def test_transcribe_streaming_windows_and_aggregation():
    """transcribe_streaming yields one dict per context window with correct
    spans and sequential conditioning; transcribe is exactly its
    aggregation (shared loop — the streaming and offline paths cannot
    diverge)."""
    import jax.numpy as jnp

    from expressive_speech_translation_tpu.models import whisper as wj
    from expressive_speech_translation_tpu.pipeline.jax_engines import JaxWhisperAsr

    cfg = wj.WhisperConfig(d_model=64, encoder_layers=1, decoder_layers=1,
                           heads=4, ffn_dim=128)
    asr = JaxWhisperAsr(cfg, dtype=jnp.float32, max_new_tokens=4,
                        context_buckets=(2,))
    g = np.random.default_rng(1)
    audio = (0.1 * g.standard_normal(16_000 * 5)).astype(np.float32)  # 5 s

    segs = list(asr.transcribe_streaming(audio, language="eng"))
    assert [(s["start"], s["end"]) for s in segs] == [
        (0.0, 2.0), (2.0, 4.0), (4.0, 5.0)]
    assert all(s["language"] == "eng" for s in segs)

    out = asr.transcribe(audio, language="eng")
    assert out["text"] == " ".join(s["text"] for s in segs if s["text"])
    assert out["words"] == [w for s in segs for w in s["words"]]


def test_dtw_vectorized_matches_bruteforce():
    """The O(m) vector row recurrence must equal the literal three-move DP
    (openai-whisper timing.dtw: diagonal, vertical — several tokens on one
    frame — and horizontal moves; regression: the vertical move was missing,
    forcing every token onto a distinct frame)."""
    from expressive_speech_translation_tpu.models.whisper import dtw_token_times

    def brute(alignment, n_tokens, audio_seconds):
        a = np.asarray(alignment[:n_tokens], np.float64)
        a = a / np.maximum(a.sum(axis=-1, keepdims=True), 1e-9)
        cost = -np.log(np.maximum(a, 1e-9))
        n, m = cost.shape
        acc = np.full((n + 1, m + 1), np.inf)
        acc[0, 0] = 0.0
        for i in range(1, n + 1):
            for j in range(1, m + 1):
                acc[i, j] = cost[i - 1, j - 1] + min(
                    acc[i - 1, j - 1], acc[i - 1, j], acc[i, j - 1])
        j, i = m, n
        first = np.full(n, j - 1)
        while i > 0 and j > 0:
            first[i - 1] = j - 1
            move = int(np.argmin(
                [acc[i - 1, j - 1], acc[i - 1, j], acc[i, j - 1]]))
            if move == 0:
                i -= 1
                j -= 1
            elif move == 1:
                i -= 1
            else:
                j -= 1
        return first / (m / audio_seconds)

    g = np.random.default_rng(9)
    align = g.random((12, 40)) ** 3  # peaky attention-like rows
    np.testing.assert_allclose(
        dtw_token_times(align, 12, 4.0), brute(align, 12, 4.0))

    # more tokens than frames REQUIRES the vertical move (two-move DTW can
    # only advance the token index diagonally, so n > m had no valid path)
    dense = np.full((5, 3), 1e-3)
    dense[0, 0] = dense[1, 0] = dense[2, 1] = dense[3, 2] = dense[4, 2] = 1.0
    times = dtw_token_times(dense, 5, 3.0)
    np.testing.assert_allclose(times, brute(dense, 5, 3.0))
    assert np.isfinite(times).all()
    assert (np.diff(times) >= 0).all()          # monotonic
    assert len(set(times.tolist())) < len(times)  # some tokens share a frame


def test_budget_exhausted_final_alignment_row_written(hf_pair, mel):
    """When max_new_tokens is exhausted without EOT, the FINAL generated
    token's cross-attention row must still be captured (regression: the loop
    exited before consuming the last position, leaving an all-zero row and a
    DTW-artifact timestamp for the last word)."""
    _, cfg, params = hf_pair
    prompt = jnp.asarray([[998]], jnp.int32)
    n_new = 5
    tokens, aligns, slp, ngen, nsp = wj.decode_with_alignment(
        params, cfg, jnp.asarray(mel[:1]), prompt,
        max_new_tokens=n_new, min_new_tokens=n_new,  # EOS suppressed: budget exhausts
    )
    total = prompt.shape[1] + n_new
    assert float(jnp.abs(aligns[0, total - 1]).sum()) > 0.0
    assert int(ngen[0]) == n_new  # the alignment-only extra step adds no count


def test_suppress_ids_out_of_range_are_dropped(hf_pair, mel):
    """A standard whisper suppress list (ids up to 50362) against a smaller
    vocab must DROP out-of-range ids, not wrap them onto legitimate tokens
    (regression: modulo remap permanently banned unrelated content ids)."""
    _, cfg, params = hf_pair
    prompt = jnp.asarray([[998]], jnp.int32)
    base, *_ = wj.decode_with_alignment(
        params, cfg, jnp.asarray(mel[:1]), prompt, max_new_tokens=6)
    # 50362 % 1024 == 186 — wrapping would suppress token 186
    supp, *_ = wj.decode_with_alignment(
        params, cfg, jnp.asarray(mel[:1]), prompt, max_new_tokens=6,
        suppress_tokens=(50_362,))
    np.testing.assert_array_equal(np.asarray(base), np.asarray(supp))


def test_decode_budget_over_position_ceiling_raises(hf_pair, mel):
    _, cfg, params = hf_pair
    prompt = jnp.asarray([[998]], jnp.int32)
    with pytest.raises(ValueError, match="max_target_positions"):
        wj.decode_with_alignment(
            params, cfg, jnp.asarray(mel[:1]), prompt,
            max_new_tokens=cfg.max_target_positions)


def test_greedy_decode_budget_over_position_ceiling_raises(hf_pair, mel):
    """greedy_decode must refuse over-budget calls like decode_with_alignment
    does (regression: it silently decoded with a clamped — frozen — position
    embedding past the ceiling)."""
    _, cfg, params = hf_pair
    prompt = jnp.asarray([[998]], jnp.int32)
    with pytest.raises(ValueError, match="max_target_positions"):
        wj.greedy_decode(params, cfg, jnp.asarray(mel[:1]), prompt,
                         max_new_tokens=cfg.max_target_positions)


def test_load_whisper_large_v3_layout_shift(tmp_path):
    """large-v3 (vocab 51866) adds one language token, shifting every special
    id after the language block by +1 — with v2 defaults the prompt's
    'transcribe' slot would be v3's <|translate|> (silent wrong task) and the
    no-speech gate would read <|startofprev|>."""
    import torch
    from transformers import WhisperConfig as HFConfig, WhisperModel

    from expressive_speech_translation_tpu.models import loaders

    hf = HFConfig(vocab_size=51_866, num_mel_bins=128, encoder_layers=1,
                  decoder_layers=1, encoder_attention_heads=2,
                  decoder_attention_heads=2, d_model=32, encoder_ffn_dim=64,
                  decoder_ffn_dim=64, max_source_positions=50,
                  max_target_positions=48)
    torch.manual_seed(0)
    model = WhisperModel(hf)
    torch.save(model.state_dict(), tmp_path / "pytorch_model.bin")
    (tmp_path / "config.json").write_text(hf.to_json_string())
    _, cfg = loaders.load_whisper(tmp_path)
    assert cfg.n_langs == 100
    assert cfg.task_transcribe == 50_360
    assert cfg.task_translate == 50_359
    assert cfg.sop_token == 50_362
    assert cfg.no_speech_token == 50_363
    assert cfg.no_timestamps == 50_364


def test_load_whisper_rejects_english_only_layout(tmp_path):
    """English-only (.en) checkpoints carry a different special-token layout;
    the loader must refuse instead of decoding garbage via clamped ids."""
    import json as _json

    from expressive_speech_translation_tpu.models import loaders

    (tmp_path / "config.json").write_text(_json.dumps({
        "num_mel_bins": 80, "d_model": 64, "encoder_layers": 1,
        "decoder_layers": 1, "encoder_attention_heads": 4,
        "encoder_ffn_dim": 128, "vocab_size": 51_864,
    }))
    with pytest.raises(loaders.WeightsNotFoundError, match="English-only"):
        loaders.load_whisper(tmp_path)
