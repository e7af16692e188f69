"""MTP decode QUALITY, not just plumbing (VERDICT r3 weak #3 / next #6).

Multi-token-prediction serving (generate_speech_tokens_mtp: K tokens per
backbone pass, models/cosyvoice.py) only preserves quality when the extra
heads are trained. This test trains K=2 heads with the production SFT loss
(train/sft.py lm_loss) on a deterministic successor task until the MTP
head's teacher-forced accuracy is within tolerance of the main head's, then
asserts K=2 generation agrees with K=1 generation on ≥95% of emitted tokens.

Task: speech token sequences walk the cycle v → v+1 and stop at V−1 (then
EOS). Both heads' targets are exact functions of the input token (head 0:
v+1; head 1: v+2), so a converged model makes generation deterministic and
the K=1/K=2 agreement measures exactly the MTP conditioning gap.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from expressive_speech_translation_tpu.models import cosyvoice as cv, qwen2 as q2
from expressive_speech_translation_tpu.train import sft

pytestmark = pytest.mark.slow

V = 48          # successor-cycle size == speech vocab
TS = V          # speech bucket holds the longest walk

MTP_LM = cv.SpeechLMConfig(
    backbone=q2.Qwen2Config(hidden=64, layers=2, heads=4, kv_heads=2,
                            ffn_dim=128, max_positions=256),
    text_vocab=16, speech_token_size=V, mtp=2,
)


def _walk_batch(rng: np.random.Generator, b: int) -> sft.SFTBatch:
    """[s, s+1, …, V−1] walks from random starts (≥4 tokens each)."""
    starts = rng.integers(0, V - 4, size=b)
    speech = np.zeros((b, TS), np.int32)
    mask = np.zeros((b, TS), bool)
    for i, s in enumerate(starts):
        n = V - s
        speech[i, :n] = np.arange(s, V)
        mask[i, :n] = True
    text = np.full((b, 1), 7, np.int32)
    return sft.SFTBatch(jnp.asarray(text), jnp.ones((b, 1), bool),
                        jnp.asarray(speech), jnp.asarray(mask))


def _head_accuracies(params, cfg, batch: sft.SFTBatch):
    """Teacher-forced accuracy of the main head and each MTP head, measured
    exactly where lm_loss trains them (same gather, argmax vs target)."""
    emb, mask = cv.build_prompt_embeddings(
        params, cfg, batch.text_tokens, batch.text_mask,
        batch.speech_tokens, batch.speech_mask)
    causal = np.tril(np.ones((emb.shape[1],) * 2, bool))[None, None]
    hidden = q2.forward(params["backbone"], cfg.backbone, emb,
                        attn_mask=jnp.asarray(causal) & mask[:, None, None, :])
    b, ts = batch.speech_tokens.shape
    n_t = jnp.sum(batch.text_mask.astype(jnp.int32), axis=1)
    pred_pos = (1 + n_t)[:, None] + jnp.arange(ts + 1)[None, :]
    h = jnp.take_along_axis(hidden, pred_pos[..., None], axis=1)
    lengths = jnp.sum(batch.speech_mask.astype(jnp.int32), axis=1)
    idx = jnp.arange(ts + 1)[None, :]
    tgt_mask = idx <= lengths[:, None]
    # Hidden position 0 is the last text slot: every head's target there is a
    # function of the random walk start, unpredictable from text alone.
    not_first = idx > 0
    targets = jnp.concatenate(
        [batch.speech_tokens, jnp.full((b, 1), cfg.eos_speech, jnp.int32)], 1)
    targets = jnp.where(idx == lengths[:, None], cfg.eos_speech, targets)

    def acc(logits, t, m):
        return float(jnp.sum((jnp.argmax(logits, -1) == t) & m) /
                     jnp.maximum(jnp.sum(m), 1))

    logits0 = h @ params["head"]["kernel"] + params["head"]["bias"]
    accs = [acc(logits0, targets, tgt_mask & not_first)]
    for j, head in enumerate(params["mtp_heads"]):
        shift = j + 1
        n = ts + 1 - shift
        lj = h[:, :n, :] @ head["kernel"] + head["bias"]
        accs.append(acc(lj, targets[:, shift:], tgt_mask[:, shift:] & not_first[:, :n]))
    return accs


@pytest.fixture(scope="module")
def trained():
    opt = sft.make_optimizer(5e-3)
    state = sft.init_train_state(jax.random.PRNGKey(0), MTP_LM, opt)
    step = sft.make_train_step(MTP_LM, opt, accum_grad=1,
                               compute_dtype=jnp.float32)
    rng = np.random.default_rng(0)
    for i in range(1200):
        batch = jax.tree.map(lambda x: x[None], _walk_batch(rng, 16))
        state, metrics = step(state, batch)
        if i >= 200 and i % 50 == 0:
            accs = _head_accuracies(state.params, MTP_LM, _walk_batch(rng, 32))
            if min(accs) > 0.995:
                break
    accs = _head_accuracies(state.params, MTP_LM, _walk_batch(rng, 64))
    return state.params, accs


def test_mtp_head_accuracy_matches_main_head(trained):
    _, accs = trained
    main, mtp = accs[0], accs[1]
    assert main > 0.99, f"main head failed to learn the task (acc={main:.3f})"
    assert mtp > main - 0.02, (
        f"MTP head accuracy {mtp:.3f} not within tolerance of main {main:.3f}")


def test_mtp_generation_agrees_with_k1(trained):
    params, _ = trained
    text = jnp.full((1, 1), 7, jnp.int32)
    tmask = jnp.ones((1, 1), bool)
    s0 = 5
    prompt = jnp.asarray([[s0, s0 + 1, s0 + 2]], jnp.int32)
    pmask = jnp.ones((1, 3), bool)
    kw = dict(max_new_tokens=TS, min_new_tokens=2)

    tok1, len1 = cv.generate_speech_tokens(
        params, MTP_LM, jax.random.PRNGKey(11), text, tmask, prompt, pmask, **kw)
    tok2, len2 = cv.generate_speech_tokens_mtp(
        params, MTP_LM, jax.random.PRNGKey(11), text, tmask, prompt, pmask, **kw)

    t1, t2 = np.asarray(tok1[0]), np.asarray(tok2[0])
    agree = float(np.mean(t1 == t2))
    assert agree >= 0.95, (
        f"K=2 agreed with K=1 on only {agree:.1%} of tokens\n{t1}\n{t2}")
    # and both walked the cycle: continue s0+3 … V−1 then EOS
    expect = np.arange(s0 + 3, V)
    n = len(expect)
    assert (t1[:n] == expect).mean() >= 0.95
    assert int(len1[0]) == pytest.approx(n, abs=2)
    assert int(len2[0]) == pytest.approx(n, abs=2)


def test_spec_decode_acceptance_with_trained_heads(trained):
    """The LOSSLESS mode on trained heads: the stream must equal K=1 exactly
    (not just 95% like accept-all) AND the measured tokens-per-pass must
    approach K — the trained-head acceptance number the serving speedup
    rides on (generate_speech_tokens_spec)."""
    params, _ = trained
    # generate_speech_tokens_spec only needs cfg.mtp > 1; the spec_decode
    # flag is read by synthesize()'s routing, not by the function itself
    cfg = MTP_LM
    text = jnp.full((1, 1), 7, jnp.int32)
    tmask = jnp.ones((1, 1), bool)
    prompt = jnp.asarray([[5, 6, 7]], jnp.int32)
    pmask = jnp.ones((1, 3), bool)
    kw = dict(max_new_tokens=TS, min_new_tokens=2)

    tok1, len1 = cv.generate_speech_tokens(
        params, cfg, jax.random.PRNGKey(11), text, tmask, prompt, pmask, **kw)
    toks, lens, stats = cv.generate_speech_tokens_spec(
        params, cfg, jax.random.PRNGKey(11), text, tmask, prompt, pmask,
        with_stats=True, **kw)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(tok1))
    np.testing.assert_array_equal(np.asarray(lens), np.asarray(len1))
    emitted = int(stats["emitted"])
    passes = int(stats["backbone_passes"])
    tpp = (emitted - 1) / max(passes, 1)   # t0 is sampled pre-loop
    assert emitted > 10
    # K=2: perfect acceptance → 2 tokens/pass; trained heads must land close
    assert tpp >= 1.7, (
        f"trained-head spec decode averaged {tpp:.2f} tokens/pass "
        f"({passes} passes for {emitted} tokens)")
