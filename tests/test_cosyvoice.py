"""CosyVoice-JAX structural/behavioural tests (no reference weights exist —
large blobs are stripped from the reference repo, SURVEY.md repo-health notes —
so these validate shapes, sampling behaviour, solver math, and jit-ability)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from expressive_speech_translation_tpu.models import cosyvoice as cv
from expressive_speech_translation_tpu.models import qwen2 as q2


TINY_LM = cv.SpeechLMConfig(
    backbone=q2.Qwen2Config(hidden=64, layers=2, heads=4, kv_heads=2, ffn_dim=128, max_positions=512),
    text_vocab=500, speech_token_size=97, max_tokens=128,
)
TINY_FLOW = cv.FlowConfig(token_vocab=100, dim=64, layers=2, heads=4, n_steps=4)
TINY_VOC = cv.VocoderConfig(base_channels=64, upsample_rates=(8, 6, 10), upsample_kernels=(16, 12, 20))
TINY = cv.CosyVoiceConfig(lm=TINY_LM, flow=TINY_FLOW, vocoder=TINY_VOC)


@pytest.fixture(scope="module")
def params():
    return cv.init_cosyvoice(jax.random.PRNGKey(0), TINY)


def _prompt(b=2, tt=6, ts=4):
    g = np.random.default_rng(0)
    text = jnp.asarray(g.integers(0, 500, (b, tt)), jnp.int32)
    tmask = jnp.ones((b, tt), bool)
    sp = jnp.asarray(g.integers(0, 97, (b, ts)), jnp.int32)
    smask = jnp.ones((b, ts), bool)
    return text, tmask, sp, smask


def test_generate_speech_tokens_shapes(params):
    text, tmask, sp, smask = _prompt()
    tokens, lengths = cv.generate_speech_tokens(
        params["lm"], TINY_LM, jax.random.PRNGKey(1), text, tmask, sp, smask,
        max_new_tokens=16,
    )
    assert tokens.shape == (2, 16)
    assert tokens.dtype == jnp.int32
    assert (np.asarray(lengths) <= 16).all()
    t = np.asarray(tokens)
    # tokens are in the speech vocab or EOS; control tokens never emitted
    assert (t <= TINY_LM.eos_speech).all()
    # after EOS everything is EOS padding
    for row, ln in zip(t, np.asarray(lengths)):
        assert (row[ln:] == TINY_LM.eos_speech).all()


def test_generate_invariant_to_text_bucket_padding(params):
    """Decode must not change when the SAME text rides a wider (padded) text
    bucket: build_prompt_embeddings compacts valid slots to a contiguous
    prefix, so last-position gathers, attention keep-masks, and RoPE
    distances are pad-independent (regression: mid-sequence text padding
    attended pad K/V and dropped the task/speech-prompt tail)."""
    text, tmask, sp, smask = _prompt(tt=6)
    tok_a, len_a = cv.generate_speech_tokens(
        params["lm"], TINY_LM, jax.random.PRNGKey(9), text, tmask, sp, smask,
        max_new_tokens=12,
    )
    # same content padded into a 16-wide bucket
    pad = 10
    text_p = jnp.pad(text, ((0, 0), (0, pad)))
    tmask_p = jnp.pad(tmask, ((0, 0), (0, pad)))
    tok_b, len_b = cv.generate_speech_tokens(
        params["lm"], TINY_LM, jax.random.PRNGKey(9), text_p, tmask_p, sp, smask,
        max_new_tokens=12,
    )
    np.testing.assert_array_equal(np.asarray(tok_a), np.asarray(tok_b))
    np.testing.assert_array_equal(np.asarray(len_a), np.asarray(len_b))


def test_build_prompt_embeddings_compacts_valid_prefix(params):
    """With padded text, the returned mask must be a contiguous prefix and
    the embedding order [sos, text…, task, speech…] preserved."""
    text, tmask, sp, smask = _prompt(b=1, tt=4)
    text_p = jnp.pad(text, ((0, 0), (0, 5)))
    tmask_p = jnp.pad(tmask, ((0, 0), (0, 5)))
    emb_p, mask_p = cv.build_prompt_embeddings(
        params["lm"], TINY_LM, text_p, tmask_p, sp, smask)
    m = np.asarray(mask_p[0])
    n_valid = int(m.sum())
    assert m[:n_valid].all() and not m[n_valid:].any()
    # valid prefix equals the unpadded assembly
    emb_u, mask_u = cv.build_prompt_embeddings(
        params["lm"], TINY_LM, text, tmask, sp, smask)
    np.testing.assert_allclose(np.asarray(emb_p[0, :n_valid]),
                               np.asarray(emb_u[0, :n_valid]), atol=0)


def test_llm_converter_rejects_mtp_config():
    """An official llm.pt carries no MTP heads — the converter must fail
    with a config error, not a KeyError at trace time."""
    import torch

    cfg1 = cv.SpeechLMConfig(
        backbone=q2.Qwen2Config(hidden=16, layers=1, heads=2, kv_heads=1,
                                ffn_dim=32, max_positions=64),
        text_vocab=32, speech_token_size=13)
    p = cv.init_speech_lm(jax.random.PRNGKey(0), cfg1)
    # minimal official-naming state dict via our own emit helper if present;
    # otherwise synthesize the few tensors the converter reads before the gate
    state = {"llm_embedding.weight": torch.zeros(2, 16),
             "speech_embedding.weight": torch.zeros(16, 16),
             "llm_decoder.weight": torch.zeros(16, 16)}
    cfg_mtp = dataclasses.replace(cfg1, mtp=2)
    with pytest.raises(ValueError, match="MTP"):
        cv.from_cosyvoice_llm_state_dict(state, cfg_mtp)
    del p


def test_flow_matching_loss_frame_count_off_by_one():
    """STFT framing can yield token_mel_ratio·T ± 1 frames; the loss must
    pad/slice the token conditioning instead of broadcast-crashing."""
    cfg = TINY_FLOW
    params = cv.init_flow(jax.random.PRNGKey(4), cfg)
    g = np.random.default_rng(0)
    for t_frames in (cfg.token_mel_ratio * 4 + 1, cfg.token_mel_ratio * 4 - 1):
        mel = jnp.asarray(g.standard_normal((2, t_frames, cfg.n_mels)), jnp.float32)
        tokens = jnp.asarray(g.integers(0, 90, (2, 4)), jnp.int32)
        mask = jnp.ones((2, 4), bool)
        spk = jnp.asarray(g.standard_normal((2, cfg.spk_embed_dim)), jnp.float32)
        loss = cv.flow_matching_loss(
            params, cfg, jax.random.PRNGKey(5), mel, tokens, mask, spk)
        assert np.isfinite(float(loss))


def test_streaming_accepts_typed_prng_keys(params):
    """synthesize_streaming must work with new-style typed keys
    (jax.random.key), which have no numpy buffer protocol."""
    text, tmask, sp, smask = _prompt(b=1, tt=4)
    spk = jnp.zeros((1, TINY_FLOW.spk_embed_dim))
    pm = jnp.zeros((1, 4, TINY_FLOW.n_mels))
    pmm = jnp.ones((1, 4), bool)
    chunks = list(cv.synthesize_streaming(
        params, TINY, jax.random.key(3), text, tmask, sp, smask, spk, pm, pmm,
        max_new_tokens=cv.StreamConfig().chunk_tokens,
    ))
    assert chunks and all(np.isfinite(c).all() for c in chunks)


def test_ras_sampling_reduces_repetition():
    """RAS must resample when the trailing window is dominated by one token."""
    key = jax.random.PRNGKey(0)
    cfg = TINY_LM
    b, v = 256, cfg.speech_token_size + 3
    # Strongly peaked logits on token 7, window already full of 7s
    # peak prob ≈0.95 → top-p 0.8 nucleus keeps ONLY token 7
    logits = jnp.full((b, v), -10.0).at[:, 7].set(6.0).at[:, 11].set(3.0)
    window_rep = jnp.full((b, cfg.win_size), 7, jnp.int32)
    window_clean = jnp.full((b, cfg.win_size), -1, jnp.int32)
    from expressive_speech_translation_tpu.models.cosyvoice import _ras_sample

    out_rep = np.asarray(_ras_sample(key, logits, window_rep, cfg))
    out_clean = np.asarray(_ras_sample(key, logits, window_clean, cfg))
    # without repetition: nucleus keeps the peak → nearly all 7s
    assert (out_clean == 7).mean() > 0.9
    # with repetition: resampled from full top-k → diversity appears
    assert (out_rep == 7).mean() < (out_clean == 7).mean()
    assert len(np.unique(out_rep)) > len(np.unique(out_clean))


def test_flow_euler_matches_closed_form():
    """With a constant estimator v≡c, Euler integration must give x0 + c."""
    cfg = TINY_FLOW
    b, t_tok = 1, 5
    key = jax.random.PRNGKey(2)
    params = cv.init_flow(jax.random.PRNGKey(3), cfg)

    # zero all estimator outputs except a constant bias on out_proj
    c = 0.37
    params = jax.tree_util.tree_map(jnp.zeros_like, params)
    params["out_proj"]["bias"] = params["out_proj"]["bias"] + c

    tokens = jnp.zeros((b, t_tok), jnp.int32)
    mask = jnp.ones((b, t_tok), bool)
    spk = jnp.zeros((b, cfg.spk_embed_dim))
    pm = jnp.zeros((b, 0, cfg.n_mels))
    pmm = jnp.zeros((b, 0), bool)
    mel, fmask = cv.tokens_to_mel(params, cfg, key, tokens, mask, spk, pm, pmm)
    x0 = jax.random.normal(key, mel.shape, mel.dtype)
    expected = x0 + c  # CFG: (1+w)c - w·c = c
    np.testing.assert_allclose(np.asarray(mel), np.asarray(expected), atol=1e-5)
    assert mel.shape == (b, cfg.token_mel_ratio * t_tok, cfg.n_mels)


@pytest.mark.slow


def test_flow_matching_loss_finite_and_differentiable():
    cfg = TINY_FLOW
    params = cv.init_flow(jax.random.PRNGKey(4), cfg)
    g = np.random.default_rng(0)
    mel = jnp.asarray(g.standard_normal((2, 8, cfg.n_mels)), jnp.float32)
    tokens = jnp.asarray(g.integers(0, 90, (2, 4)), jnp.int32)
    mask = jnp.ones((2, 4), bool)
    spk = jnp.asarray(g.standard_normal((2, cfg.spk_embed_dim)), jnp.float32)

    loss, grads = jax.value_and_grad(
        lambda p: cv.flow_matching_loss(p, cfg, jax.random.PRNGKey(5), mel, tokens, mask, spk)
    )(params)
    assert np.isfinite(float(loss))
    gnorm = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.sum(jnp.abs(x))), grads, 0.0
    )
    assert gnorm > 0


def test_vocoder_upsample_ratio(params):
    mel = jnp.zeros((1, 12, TINY_VOC.n_mels))
    audio = cv.vocode(params["vocoder"], TINY_VOC, mel)
    assert TINY_VOC.hop == 480
    assert audio.shape == (1, 12 * 480)
    assert (np.abs(np.asarray(audio)) <= 1.0).all()  # tanh bounded


def test_synthesize_end_to_end_jitted(params):
    text, tmask, sp, smask = _prompt()
    spk = jnp.zeros((2, TINY_FLOW.spk_embed_dim))
    pm = jnp.zeros((2, 4, TINY_FLOW.n_mels))
    pmm = jnp.ones((2, 4), bool)

    fn = jax.jit(
        lambda p, k: cv.synthesize(
            p, TINY, k, text, tmask, sp, smask, spk, pm, pmm, max_new_tokens=12
        )
    )
    out = fn(params, jax.random.PRNGKey(7))
    audio = np.asarray(out["audio"])
    assert audio.shape == (2, 24 * 480)  # 12 tokens × ratio 2 frames × hop 480
    assert np.isfinite(audio).all()
    assert out["speech_tokens"].shape == (2, 12)


@pytest.mark.slow


def test_speech_tokenizer_fsq():
    import jax
    import jax.numpy as jnp
    from expressive_speech_translation_tpu.models import speech_tokenizer as st

    cfg = st.SpeechTokenizerConfig(dim=64, layers=2, heads=4)
    assert cfg.vocab_size == 6561  # 3^8, greek_sft.yaml:24
    params = st.init_speech_tokenizer(jax.random.PRNGKey(0), cfg)
    g = np.random.default_rng(0)
    mel = jnp.asarray(g.standard_normal((2, 40, 80)), jnp.float32)
    mask = jnp.ones((2, 40), bool)
    ids, tok_mask = st.encode(params, cfg, mel, mask)
    assert ids.shape == (2, 20)  # 50 Hz -> 25 Hz
    assert int(ids.max()) < 6561 and int(ids.min()) >= 0
    # deterministic
    ids2, _ = st.encode(params, cfg, mel, mask)
    assert (np.asarray(ids) == np.asarray(ids2)).all()
    # different audio -> different tokens
    ids3, _ = st.encode(params, cfg, mel + 1.0, mask)
    assert (np.asarray(ids) != np.asarray(ids3)).mean() > 0.3
    # id <-> code roundtrip
    codes = st.ids_to_codes(ids, levels=3, dims=8)
    back = st.codes_to_ids(((np.asarray(codes) + 1) * 1).astype(np.int32), 3)
    assert back.shape == ids.shape
    # STE gradients flow through the training path
    def loss(p):
        _, _, feats = st.encode_with_codes(p, cfg, mel, mask)
        return jnp.mean(feats**2)
    grads = jax.grad(loss)(params)
    gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree_util.tree_leaves(grads))
    assert gnorm > 0


def test_loaders_missing_and_tiny_roundtrip(tmp_path):
    import torch
    from expressive_speech_translation_tpu.models.loaders import (
        WeightsNotFoundError, load_state_dict, load_whisper,
    )

    with pytest.raises(WeightsNotFoundError):
        load_state_dict(tmp_path / "nope")
    # tiny whisper: save torch state dict + config.json, load through converter
    from transformers import WhisperConfig as HFConfig, WhisperModel

    hf = HFConfig(vocab_size=200, num_mel_bins=80, encoder_layers=1, decoder_layers=1,
                  encoder_attention_heads=2, decoder_attention_heads=2, d_model=32,
                  encoder_ffn_dim=64, decoder_ffn_dim=64,
                  max_source_positions=50, max_target_positions=32,
                  pad_token_id=0, bos_token_id=1, eos_token_id=2,
                  decoder_start_token_id=1)
    torch.manual_seed(0)
    model = WhisperModel(hf)
    d = tmp_path / "whisper"
    d.mkdir()
    torch.save(model.state_dict(), d / "pytorch_model.bin")
    (d / "config.json").write_text(hf.to_json_string())
    params, cfg = load_whisper(d)
    assert cfg.d_model == 32
    assert params["decoder"]["embed"].shape == (200, 32)


@pytest.mark.slow


def test_mtp_generation_and_decode_span():
    """Multi-token prediction: K tokens per backbone pass; decode_span matches
    sequential decode_steps."""
    from expressive_speech_translation_tpu.models import cosyvoice as cvm
    from expressive_speech_translation_tpu.models import qwen2 as q2m

    # decode_span parity vs step-by-step
    qcfg = q2m.Qwen2Config(hidden=32, layers=2, heads=4, kv_heads=2, ffn_dim=64,
                           max_positions=64)
    qp = q2m.init_qwen2(jax.random.PRNGKey(0), qcfg)
    g = np.random.default_rng(0)
    xs = jnp.asarray(g.standard_normal((1, 6, 32)), jnp.float32)
    cache_a = q2m.init_kv_cache(qcfg, 1, 16)
    pre, cache_a = q2m.prefill(qp, qcfg, xs[:, :2], cache_a)
    span_h, cache_a = q2m.decode_span(qp, qcfg, xs[:, 2:6], jnp.asarray(2, jnp.int32), cache_a)

    cache_b = q2m.init_kv_cache(qcfg, 1, 16)
    _, cache_b = q2m.prefill(qp, qcfg, xs[:, :2], cache_b)
    outs = []
    for i in range(2, 6):
        h, cache_b = q2m.decode_step(qp, qcfg, xs[:, i:i+1], jnp.asarray(i, jnp.int32), cache_b)
        outs.append(np.asarray(h))
    seq_h = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(span_h), seq_h, atol=2e-4, rtol=1e-3)

    # MTP end-to-end generation
    lm_cfg = cvm.SpeechLMConfig(
        backbone=q2m.Qwen2Config(hidden=32, layers=2, heads=4, kv_heads=2,
                                 ffn_dim=64, max_positions=256),
        text_vocab=50, speech_token_size=20, mtp=4,
    )
    params = cvm.init_speech_lm(jax.random.PRNGKey(1), lm_cfg)
    assert len(params["mtp_heads"]) == 3
    text = jnp.asarray(g.integers(0, 50, (2, 4)), jnp.int32)
    tmask = jnp.ones((2, 4), bool)
    sp = jnp.asarray(g.integers(0, 20, (2, 3)), jnp.int32)
    smask = jnp.ones((2, 3), bool)
    tokens, lengths = cvm.generate_speech_tokens_mtp(
        params, lm_cfg, jax.random.PRNGKey(2), text, tmask, sp, smask,
        max_new_tokens=16, min_new_tokens=4,
    )
    assert tokens.shape == (2, 16)
    t = np.asarray(tokens)
    assert (t <= lm_cfg.eos_speech).all()
    for row, ln in zip(t, np.asarray(lengths)):
        assert (row[ln:] == lm_cfg.eos_speech).all()  # eos padding after stop
    # jits as one program
    fn = jax.jit(lambda p, k: cvm.generate_speech_tokens_mtp(
        p, lm_cfg, k, text, tmask, sp, smask, max_new_tokens=8))
    toks2, _ = fn(params, jax.random.PRNGKey(3))
    assert toks2.shape == (2, 8)


def test_streaming_synthesis_matches_token_budget(params):
    """synthesize_streaming: chunked emission conserves samples exactly
    (sum of yielded chunks == r * emitted_tokens * hop) and joins are finite."""
    text, tmask, sp, smask = _prompt(b=1)
    spk = jnp.zeros((1, TINY_FLOW.spk_embed_dim))
    pm = jnp.asarray(np.random.default_rng(1).standard_normal((1, 6, TINY_FLOW.n_mels)), jnp.float32)
    pmm = jnp.ones((1, 6), bool)
    stream = cv.StreamConfig(chunk_tokens=8, flow_context=6, vocoder_context=4,
                             fade_samples=256)
    chunks = list(cv.synthesize_streaming(
        params, TINY, jax.random.PRNGKey(7), text, tmask, sp, smask, spk, pm, pmm,
        stream=stream, max_new_tokens=24, min_new_tokens=4,
    ))
    assert chunks, "stream yielded nothing"
    wav = np.concatenate(chunks)
    assert np.isfinite(wav).all()
    hop = TINY_VOC.hop
    r = TINY_FLOW.token_mel_ratio
    # total samples must be an exact multiple of one token's worth of audio
    assert len(wav) % (r * hop) == 0
    n_tok = len(wav) // (r * hop)
    assert 4 <= n_tok <= 24
    # batch > 1 is rejected
    text2, tmask2, sp2, smask2 = _prompt(b=2)
    with pytest.raises(ValueError):
        next(cv.synthesize_streaming(
            params, TINY, jax.random.PRNGKey(8), text2, tmask2, sp2, smask2,
            jnp.zeros((2, TINY_FLOW.spk_embed_dim)),
            jnp.zeros((2, 6, TINY_FLOW.n_mels)), jnp.ones((2, 6), bool),
        ))


def test_streaming_never_exceeds_max_new_tokens(params):
    """A budget not divisible by chunk_tokens must be honored exactly
    (regression: the last chunk used to run to its full width, emitting up
    to chunk_tokens-1 tokens beyond max_new_tokens — more audio than
    synthesize() with the same budget)."""
    text, tmask, sp, smask = _prompt(b=1)
    spk = jnp.zeros((1, TINY_FLOW.spk_embed_dim))
    pm = jnp.zeros((1, 6, TINY_FLOW.n_mels), jnp.float32)
    pmm = jnp.ones((1, 6), bool)
    stream = cv.StreamConfig(chunk_tokens=8, flow_context=6, vocoder_context=4,
                             fade_samples=128)
    # min_new_tokens above the budget: EOS can never fire, every chunk is
    # full — without the cap the stream emits ceil(11/8)*8 = 16 tokens
    chunks = list(cv.synthesize_streaming(
        params, TINY, jax.random.PRNGKey(9), text, tmask, sp, smask, spk,
        pm, pmm, stream=stream, max_new_tokens=11, min_new_tokens=64,
    ))
    wav = np.concatenate(chunks)
    assert len(wav) == 11 * TINY_FLOW.token_mel_ratio * TINY_VOC.hop


def test_flow_estimator_is_order_sensitive():
    """RoPE gives the DiT temporal order: permuting the frames (and every
    per-frame conditioning) must NOT merely permute the output (regression:
    with no positional signal anywhere the estimator was permutation-
    equivariant — structurally unable to represent frame order)."""
    cfg = TINY_FLOW
    key = jax.random.PRNGKey(0)
    p = cv.init_flow(key, cfg)
    # adaLN-Zero gates start at 0 (identity blocks) — open them so the
    # attention branch actually contributes
    for i, blk in enumerate(p["blocks"]):
        blk["ada"] = {
            "kernel": jax.random.normal(jax.random.PRNGKey(10 + i),
                                        blk["ada"]["kernel"].shape) * 0.05,
            "bias": jnp.zeros_like(blk["ada"]["bias"]),
        }
    b, t = 1, 8
    g = np.random.default_rng(0)
    x = jnp.asarray(g.standard_normal((b, t, cfg.n_mels)), jnp.float32)
    tok = jnp.asarray(g.standard_normal((b, t, cfg.dim)), jnp.float32)
    mel_c = jnp.zeros((b, t, cfg.n_mels), jnp.float32)
    spk = jnp.zeros((b, cfg.spk_embed_dim), jnp.float32)
    mask = jnp.ones((b, t), bool)
    tt = jnp.asarray([0.5], jnp.float32)
    out = cv.flow_estimator(p, cfg, x, tt, tok, spk, mel_c, mask)
    perm = np.arange(t)[::-1].copy()
    out_p = cv.flow_estimator(
        p, cfg, x[:, perm], tt, tok[:, perm], spk, mel_c[:, perm], mask)
    # an equivariant estimator would give out_p == out[:, perm] exactly
    assert not np.allclose(np.asarray(out_p), np.asarray(out)[:, perm],
                           atol=1e-5)


def test_dit_blocks_init_as_identity():
    """adaLN-Zero: the modulation projections start at zero, so every
    residual branch is disabled at init (the DiT stability recipe)."""
    p = cv.init_flow(jax.random.PRNGKey(0), TINY_FLOW)
    for blk in p["blocks"]:
        assert float(jnp.abs(blk["ada"]["kernel"]).max()) == 0.0
        assert float(jnp.abs(blk["ada"]["bias"]).max()) == 0.0


def test_tokens_to_mel_prompt_tokens_condition_prompt_frames(params):
    """Supplying the prompt's speech tokens changes the synthesized mel: the
    prompt frames' conditioning then matches training, where exposed mel
    always pairs with its token encodings (official MaskedDiffWithXvec
    semantics); omitting them keeps the legacy zero conditioning."""
    g = np.random.default_rng(2)
    tokens = jnp.asarray(g.integers(0, 97, (1, 6)), jnp.int32)
    tmask = jnp.ones((1, 6), bool)
    spk = jnp.zeros((1, TINY_FLOW.spk_embed_dim))
    pm = jnp.asarray(g.standard_normal((1, 8, TINY_FLOW.n_mels)), jnp.float32)
    pmm = jnp.ones((1, 8), bool)
    ptok = jnp.asarray(g.integers(0, 97, (1, 4)), jnp.int32)
    ptm = jnp.ones((1, 4), bool)
    key = jax.random.PRNGKey(3)
    mel_no, _ = cv.tokens_to_mel(
        params["flow"], TINY_FLOW, key, tokens, tmask, spk, pm, pmm)
    mel_with, _ = cv.tokens_to_mel(
        params["flow"], TINY_FLOW, key, tokens, tmask, spk, pm, pmm,
        prompt_tokens=ptok, prompt_token_mask=ptm)
    assert mel_no.shape == mel_with.shape
    assert np.isfinite(np.asarray(mel_with)).all()
    assert not np.allclose(np.asarray(mel_no), np.asarray(mel_with), atol=1e-6)


def test_int8_weight_only_quantization(params):
    """Quantized dense ≈ float dense (per-channel int8, <1% rel error on
    random weights) and the quantized LM still generates valid tokens."""
    from expressive_speech_translation_tpu.models.common import dense, quantize_dense

    g = np.random.default_rng(0)
    p = {"kernel": jnp.asarray(g.standard_normal((64, 48)), jnp.float32),
         "bias": jnp.asarray(g.standard_normal(48), jnp.float32)}
    x = jnp.asarray(g.standard_normal((4, 64)), jnp.float32)
    ref = np.asarray(dense(p, x))
    got = np.asarray(dense(quantize_dense(p), x))
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 0.02, f"int8 relative error {rel}"

    qlm = cv.quantize_speech_lm(params["lm"])
    assert qlm["backbone"]["layers"][0]["q"]["kernel_q"].dtype == jnp.int8
    assert "kernel" not in qlm["head"] and qlm["head"]["kernel_q"].dtype == jnp.int8
    text, tmask, sp, smask = _prompt()
    tokens, lengths = jax.jit(lambda p, k: cv.generate_speech_tokens(
        p, TINY_LM, k, text, tmask, sp, smask, max_new_tokens=12))(
        qlm, jax.random.PRNGKey(3))
    t = np.asarray(tokens)
    assert t.shape == (2, 12) and (t <= TINY_LM.eos_speech).all()


def test_tts_engine_quantized():
    from expressive_speech_translation_tpu.models import qwen2 as q2m
    from expressive_speech_translation_tpu.pipeline.jax_engines import JaxCosyVoiceTts

    cfg = cv.CosyVoiceConfig(
        lm=cv.SpeechLMConfig(
            backbone=q2m.Qwen2Config(hidden=32, layers=1, heads=4, kv_heads=2,
                                     ffn_dim=64, max_positions=512),
            text_vocab=128, speech_token_size=61),
        flow=cv.FlowConfig(token_vocab=64, dim=32, layers=1, heads=4, n_steps=2),
        vocoder=cv.VocoderConfig(base_channels=32, upsample_rates=(8, 6, 10),
                                 upsample_kernels=(16, 12, 20)),
    )
    tts = JaxCosyVoiceTts(cfg, dtype=jnp.float32, seconds_per_char=0.02, quantize=True)
    wave = tts.synthesize("int8 hello")
    assert np.isfinite(wave).all() and len(wave) > 0


def test_tts_engine_mtp_forced():
    """tts_mtp=K on random weights (EngineConfig.tts_mtp / EST_BENCH_MTP):
    the engine initializes MTP heads and synthesize dispatches to the
    K-token-per-pass decode."""
    from expressive_speech_translation_tpu.models import qwen2 as q2m
    from expressive_speech_translation_tpu.pipeline.jax_engines import JaxCosyVoiceTts

    cfg = cv.CosyVoiceConfig(
        lm=cv.SpeechLMConfig(
            backbone=q2m.Qwen2Config(hidden=32, layers=1, heads=4, kv_heads=2,
                                     ffn_dim=64, max_positions=512),
            text_vocab=128, speech_token_size=61),
        flow=cv.FlowConfig(token_vocab=64, dim=32, layers=1, heads=4, n_steps=2),
        vocoder=cv.VocoderConfig(base_channels=32, upsample_rates=(8, 6, 10),
                                 upsample_kernels=(16, 12, 20)),
    )
    tts = JaxCosyVoiceTts(cfg, dtype=jnp.float32, seconds_per_char=0.02, mtp=2)
    assert tts.cfg.lm.mtp == 2
    assert len(tts.params["lm"]["mtp_heads"]) == 1
    wave = tts.synthesize("two tokens per pass")
    assert np.isfinite(wave).all() and len(wave) > 0

    # supplied params WITHOUT heads: the force downgrades instead of crashing
    plain = host_init_params(cfg)
    tts1 = JaxCosyVoiceTts(cfg, plain, dtype=jnp.float32,
                           seconds_per_char=0.02, mtp=2)
    assert tts1.cfg.lm.mtp == 1
    wave1 = tts1.synthesize("single token decode")
    assert np.isfinite(wave1).all() and len(wave1) > 0

    # an MTP checkpoint served through the STREAMING route still works (the
    # chunked LM path decodes single-token off params["head"]; the extra
    # heads ride along unused)
    chunks = list(tts.synthesize_streaming("stream with mtp heads"))
    assert len(chunks) >= 1 and all(np.isfinite(c).all() for c in chunks)

    # forced mtp=1 is an EXPLICIT pin to single-token decode, honored even
    # when the config/checkpoint is MTP-capable (0 = defer to the config)
    cfg_m2 = dataclasses.replace(cfg, lm=dataclasses.replace(cfg.lm, mtp=2))
    tts_pin = JaxCosyVoiceTts(cfg_m2, dtype=jnp.float32,
                              seconds_per_char=0.02, mtp=1)
    assert tts_pin.cfg.lm.mtp == 1

    # composition: MTP × weight-only int8 (quantize_speech_lm covers the
    # extra heads; dense() dispatches on kernel_q inside sample_k)
    tts_q = JaxCosyVoiceTts(cfg, dtype=jnp.float32, seconds_per_char=0.02,
                            mtp=2, quantize=True)
    assert tts_q.params["lm"]["mtp_heads"][0]["kernel_q"].dtype == jnp.int8
    wave_q = tts_q.synthesize("int8 mtp decode")
    assert np.isfinite(wave_q).all() and len(wave_q) > 0


def test_tts_engine_spec_lossless_vs_k1(caplog):
    """tts_spec=True (EngineConfig.tts_spec): B=1 synthesis routes through the
    verified speculative decoder and must produce the SAME waveform as the
    single-token engine — the heads only change how many backbone passes it
    takes. (Shared init parts are seed-identical across mtp widths: heads
    draw from their own key.)"""
    from expressive_speech_translation_tpu.models import qwen2 as q2m
    from expressive_speech_translation_tpu.pipeline.jax_engines import JaxCosyVoiceTts

    cfg = cv.CosyVoiceConfig(
        lm=cv.SpeechLMConfig(
            backbone=q2m.Qwen2Config(hidden=32, layers=1, heads=4, kv_heads=2,
                                     ffn_dim=64, max_positions=512),
            text_vocab=128, speech_token_size=61),
        flow=cv.FlowConfig(token_vocab=64, dim=32, layers=1, heads=4, n_steps=2),
        vocoder=cv.VocoderConfig(base_channels=32, upsample_rates=(8, 6, 10),
                                 upsample_kernels=(16, 12, 20)),
    )
    tts_spec = JaxCosyVoiceTts(cfg, dtype=jnp.float32, seconds_per_char=0.02,
                               mtp=2, spec=True)
    assert tts_spec.cfg.lm.spec_decode and tts_spec.cfg.lm.mtp == 2
    tts_k1 = JaxCosyVoiceTts(cfg, dtype=jnp.float32, seconds_per_char=0.02)
    w_spec = tts_spec.synthesize("lossless speculative decode")
    w_k1 = tts_k1.synthesize("lossless speculative decode")
    assert np.isfinite(w_spec).all() and len(w_spec) == len(w_k1)
    np.testing.assert_allclose(w_spec, w_k1, atol=1e-5, rtol=1e-5)

    # spec without heads downgrades with the mtp path (never crashes) — and
    # LOUDLY, so an operator can see EST_ENGINES__TTS_SPEC=1 was not honored
    plain = host_init_params(cfg)
    import logging
    with caplog.at_level(logging.WARNING):
        tts_dg = JaxCosyVoiceTts(cfg, plain, dtype=jnp.float32,
                                 seconds_per_char=0.02, mtp=2, spec=True)
    assert tts_dg.cfg.lm.mtp == 1 and not tts_dg.cfg.lm.spec_decode
    assert any("tts_spec" in r.getMessage() for r in caplog.records)

    # spec=False defers to a config that carries spec_decode=True (like
    # mtp=0 defers to the config width) instead of force-disabling it
    cfg_spec = dataclasses.replace(
        cfg, lm=dataclasses.replace(cfg.lm, mtp=2, spec_decode=True))
    tts_cfg = JaxCosyVoiceTts(cfg_spec, dtype=jnp.float32, seconds_per_char=0.02)
    assert tts_cfg.cfg.lm.spec_decode and tts_cfg.cfg.lm.mtp == 2

    # the operator surface names the active decode mode (/health/model)
    from expressive_speech_translation_tpu.pipeline.engines import (
        Engines, FakeAsr, FakeNmt,
    )

    info = Engines(asr=FakeAsr(), nmt=FakeNmt(), tts=tts_spec).decode_info()
    assert info["tts"] == "specK2" and info["asr"] == "default"
    info_cfg = Engines(asr=FakeAsr(), nmt=FakeNmt(), tts=tts_k1).decode_info()
    assert info_cfg["tts"] == "default"

    # composition: spec × weight-only int8 — the batched verifier logits
    # ([1,K,H] @ int8 head) and the draft heads all dispatch through the
    # quantized dense path
    tts_q = JaxCosyVoiceTts(cfg, dtype=jnp.float32, seconds_per_char=0.02,
                            mtp=2, spec=True, quantize=True)
    assert tts_q.params["lm"]["head"]["kernel_q"].dtype == jnp.int8
    w_q = tts_q.synthesize("int8 spec decode")
    assert np.isfinite(w_q).all() and len(w_q) > 0
    from expressive_speech_translation_tpu.pipeline.engines import Engines as _E
    assert _E(asr=FakeAsr(), nmt=FakeNmt(), tts=tts_q).decode_info()["tts"] == \
        "int8,specK2"


def test_tts_engine_mtp_width_mismatch_downgrades():
    """A forced/config MTP width that disagrees with the checkpoint's head
    count must downgrade to the checkpoint's own width (heads+1), not index
    past the heads list at decode time."""
    from expressive_speech_translation_tpu.models import qwen2 as q2m
    from expressive_speech_translation_tpu.pipeline.jax_engines import JaxCosyVoiceTts

    cfg = cv.CosyVoiceConfig(
        lm=cv.SpeechLMConfig(
            backbone=q2m.Qwen2Config(hidden=32, layers=1, heads=4, kv_heads=2,
                                     ffn_dim=64, max_positions=512),
            text_vocab=128, speech_token_size=61, mtp=2),
        flow=cv.FlowConfig(token_vocab=64, dim=32, layers=1, heads=4, n_steps=2),
        vocoder=cv.VocoderConfig(base_channels=32, upsample_rates=(8, 6, 10),
                                 upsample_kernels=(16, 12, 20)),
    )
    params = host_init_params(cfg)   # carries exactly 1 MTP head (width 2)
    assert len(params["lm"]["mtp_heads"]) == 1

    # force a wider decode than the checkpoint supports → downgrade to 2
    tts = JaxCosyVoiceTts(cfg, params, dtype=jnp.float32,
                          seconds_per_char=0.02, mtp=3)
    assert tts.cfg.lm.mtp == 2
    wave = tts.synthesize("downgraded to checkpoint width")
    assert np.isfinite(wave).all() and len(wave) > 0

    # config narrower than the checkpoint (mtp=1 cfg, 1-head params is NOT
    # a mismatch the engine can detect without cfg.mtp>1 — but a cfg that
    # says 3 while params carry 1 head must also land on 2)
    cfg3 = dataclasses.replace(
        cfg, lm=dataclasses.replace(cfg.lm, mtp=3))
    tts3 = JaxCosyVoiceTts(cfg3, params, dtype=jnp.float32,
                           seconds_per_char=0.02)
    assert tts3.cfg.lm.mtp == 2
    wave3 = tts3.synthesize("config width reconciled")
    assert np.isfinite(wave3).all() and len(wave3) > 0


def host_init_params(cfg):
    return cv.init_cosyvoice(jax.random.PRNGKey(9), cfg)


def test_fsq_even_levels_use_full_grid():
    """Even FSQ level counts live on a half-integer grid: round() must land
    on it and every level must be reachable (L=4 previously collapsed to 3
    levels and the top code was unreachable)."""
    from expressive_speech_translation_tpu.models import speech_tokenizer as st

    z = jnp.asarray(np.linspace(-4, 4, 4001, dtype=np.float32)[:, None])
    codes, ints = st._fsq(z, 4)
    vals = np.unique(np.asarray(ints))
    assert list(vals) == [0, 1, 2, 3]
    # codes sit exactly on the normalized half-integer grid
    grid = np.unique(np.round(np.asarray(codes), 6))
    np.testing.assert_allclose(grid, [-1.0, -1/3, 1/3, 1.0], atol=1e-6)
    # odd levels unchanged
    _, ints3 = st._fsq(z, 3)
    assert list(np.unique(np.asarray(ints3))) == [0, 1, 2]


def test_stream_config_rejects_misaligned_flow_context():
    from expressive_speech_translation_tpu.models import qwen2 as q2m

    cfg = cv.CosyVoiceConfig(
        lm=cv.SpeechLMConfig(
            backbone=q2m.Qwen2Config(hidden=32, layers=1, heads=4, kv_heads=2,
                                     ffn_dim=64, max_positions=512),
            text_vocab=64, speech_token_size=61),
        flow=cv.FlowConfig(token_vocab=64, dim=32, layers=1, heads=4, n_steps=2),
        vocoder=cv.VocoderConfig(base_channels=32, upsample_rates=(8, 6, 10),
                                 upsample_kernels=(16, 12, 20)),
    )
    params = host_init_params(cfg)
    gen = cv.synthesize_streaming(
        params, cfg, jax.random.PRNGKey(0),
        jnp.zeros((1, 3), jnp.int32), jnp.ones((1, 3), bool),
        jnp.zeros((1, 2), jnp.int32), jnp.ones((1, 2), bool),
        jnp.zeros((1, cfg.flow.spk_embed_dim)),
        jnp.zeros((1, 4, cfg.flow.n_mels)), jnp.ones((1, 4), bool),
        stream=cv.StreamConfig(flow_context=15), max_new_tokens=8)
    with pytest.raises(ValueError, match="multiple of"):
        next(iter(gen))
