"""Lossless speculative decode (generate_speech_tokens_spec) correctness.

The contract under test: with MTP heads present, spec decode emits a token
stream IDENTICAL to the K=1 sampler (generate_speech_tokens) — the drafts
only change how many backbone passes it takes, never what comes out. This is
exactly what accept-all MTP (generate_speech_tokens_mtp) does NOT promise.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from expressive_speech_translation_tpu.models import cosyvoice as cv, qwen2 as q2

pytestmark = pytest.mark.quick

V = 48

CFG = cv.SpeechLMConfig(
    backbone=q2.Qwen2Config(hidden=64, layers=2, heads=4, kv_heads=2,
                            ffn_dim=128, max_positions=512),
    text_vocab=16, speech_token_size=V, mtp=3, spec_decode=True,
)


def _inputs(seed, tt=5, ts=7):
    ks = jax.random.split(jax.random.PRNGKey(seed), 2)
    text = jax.random.randint(ks[0], (1, tt), 0, CFG.text_vocab)
    speech = jax.random.randint(ks[1], (1, ts), 0, V)
    return text, jnp.ones((1, tt), bool), speech, jnp.ones((1, ts), bool)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_spec_matches_k1_token_exact(seed):
    params = cv.init_speech_lm(jax.random.PRNGKey(seed + 10), CFG)
    key = jax.random.PRNGKey(seed + 100)
    args = _inputs(seed)
    tok1, len1 = jax.jit(
        lambda p, k: cv.generate_speech_tokens(p, CFG, k, *args, max_new_tokens=40)
    )(params, key)
    toks, lens, stats = jax.jit(
        lambda p, k: cv.generate_speech_tokens_spec(
            p, CFG, k, *args, max_new_tokens=40, with_stats=True)
    )(params, key)
    assert toks.shape == tok1.shape
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(tok1))
    np.testing.assert_array_equal(np.asarray(lens), np.asarray(len1))
    # progress guarantee: >=1 token per pass
    assert int(stats["backbone_passes"]) <= max(int(stats["emitted"]) - 1, 1)


@pytest.mark.parametrize("max_new", [1, 2, 5])
def test_spec_matches_k1_at_block_boundaries(max_new):
    """Budgets that cut a speculative block mid-way (max_new not a multiple
    of K, or smaller than one block) must still truncate to exactly the K=1
    stream."""
    params = cv.init_speech_lm(jax.random.PRNGKey(30), CFG)
    key = jax.random.PRNGKey(31)
    args = _inputs(12)
    tok1, len1 = cv.generate_speech_tokens(
        params, CFG, key, *args, max_new_tokens=max_new)
    toks, lens = cv.generate_speech_tokens_spec(
        params, CFG, key, *args, max_new_tokens=max_new)
    assert toks.shape == (1, max_new)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(tok1))
    np.testing.assert_array_equal(np.asarray(lens), np.asarray(len1))


def test_spec_respects_min_new_tokens():
    params = cv.init_speech_lm(jax.random.PRNGKey(5), CFG)
    toks, lens = cv.generate_speech_tokens_spec(
        params, CFG, jax.random.PRNGKey(6), *_inputs(3),
        max_new_tokens=24, min_new_tokens=6)
    assert int(lens[0]) >= 6
    # control tokens can never be emitted
    assert not np.isin(np.asarray(toks), [CFG.sos_index, CFG.task_index]).any()


def test_spec_rejects_batches():
    params = cv.init_speech_lm(jax.random.PRNGKey(7), CFG)
    text = jnp.zeros((2, 3), jnp.int32)
    with pytest.raises(ValueError, match="B=1"):
        cv.generate_speech_tokens_spec(
            params, CFG, jax.random.PRNGKey(0), text, jnp.ones((2, 3), bool),
            jnp.zeros((2, 4), jnp.int32), jnp.ones((2, 4), bool))


def test_spec_accepts_full_blocks_when_logits_agree():
    """Acceptance is driven by common random numbers: when draft and verifier
    LOGITS agree at a position, the same key must yield the same token and the
    whole block is accepted. Constant heads (zero kernel, shared bias) make
    the logits position-state-independent, so every pass must accept all K
    tokens: passes == ceil((emitted - 1) / K)."""
    params = cv.init_speech_lm(jax.random.PRNGKey(11), CFG)
    h = CFG.backbone.hidden
    vocab = CFG.speech_token_size + 3
    bias = jax.random.normal(jax.random.PRNGKey(13), (vocab,)) * 2.0
    const_head = {"kernel": jnp.zeros((h, vocab)), "bias": bias}
    params["head"] = const_head
    params["mtp_heads"] = [const_head, const_head]
    args = _inputs(9)
    toks, lens, stats = jax.jit(
        lambda p, k: cv.generate_speech_tokens_spec(
            p, CFG, k, *args, max_new_tokens=30, with_stats=True)
    )(params, jax.random.PRNGKey(12))
    emitted = int(stats["emitted"])
    passes = int(stats["backbone_passes"])
    assert emitted >= 2
    # t0 is sampled before the loop; each pass then emits a full K block
    # (the last may be cut by EOS/max_new)
    assert passes <= -(-(emitted - 1) // CFG.mtp) + 1
    # and the stream still equals the K=1 sampler's
    tok1, _ = jax.jit(
        lambda p, k: cv.generate_speech_tokens(p, CFG, k, *args, max_new_tokens=30)
    )(params, jax.random.PRNGKey(12))
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(tok1))


def test_spec_tokens_match_k1_under_mtp_dispatch():
    """synthesize() must route B=1 + spec_decode to the lossless path: its
    speech tokens equal the K=1 generator's for the same key split."""
    cfg = cv.CosyVoiceConfig(
        lm=CFG,
        flow=cv.FlowConfig(token_vocab=V + 3, dim=64, layers=1, heads=4,
                           n_mels=8, token_mel_ratio=2, spk_embed_dim=16,
                           n_steps=2),
        vocoder=cv.VocoderConfig(n_mels=8, base_channels=32,
                                 upsample_rates=(4, 4), upsample_kernels=(8, 8),
                                 resblock_kernels=(3,), resblock_dilations=((1, 2),)),
    )
    params = cv.init_cosyvoice(jax.random.PRNGKey(21), cfg)
    text, tmask, speech, smask = _inputs(15, tt=4, ts=6)
    key = jax.random.PRNGKey(22)
    k_lm, _ = jax.random.split(key)
    out = cv.synthesize(
        params, cfg, key, text, tmask, speech, smask,
        jnp.zeros((1, cfg.flow.spk_embed_dim)),
        jnp.zeros((1, 4, cfg.flow.n_mels)), jnp.ones((1, 4), bool),
        max_new_tokens=16)
    ref_toks, ref_lens = cv.generate_speech_tokens(
        params["lm"], cfg.lm, k_lm, text, tmask, speech, smask,
        max_new_tokens=16)
    np.testing.assert_array_equal(
        np.asarray(out["speech_tokens"]), np.asarray(ref_toks))
