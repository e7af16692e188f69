"""CosyVoice2-style zero-shot expressive TTS, TPU-first.

Replaces the reference's Dockerised ``CosyVoice2-0.5B`` service
(Docker/cosyvoice_api.py:96-153 → ``inference_zero_shot(text, style_prompt,
prompt_speech_16k)``) with three in-process jit-compiled submodels:

1. **Speech-token LM** — Qwen2-0.5B backbone (models/qwen2.py; dims match
   greek_sft.yaml:13-16 ``llm_input/output_size=896``) with a speech-token
   embedding/head of size ``speech_token_size+3`` (6561 tokens at 25 Hz,
   greek_sft.yaml:24-37) and RAS sampling (top-p 0.8 / top-k 25 / win 10 /
   τ_r 0.1, greek_sft.yaml:33-37) inside one ``lax.while_loop``.
   Zero-shot prompt layout: ``[sos] text… [task] prompt-speech-tokens…`` then
   autoregressive speech tokens until EOS (= speech_token_size).
2. **Conditional flow matching** — speech tokens → 80-bin mel at 50 Hz
   (token_mel_ratio 2, greek_sft.yaml:17). TPU-first redesign: a DiT-style
   transformer estimator with AdaLN time conditioning instead of the
   reference's conv U-Net (same conditioning signals: upsampled token
   encodings, 192-d speaker embedding, prompt mel), integrated with a fixed
   Euler solver + classifier-free guidance — every step is the same fused
   graph, no dynamic control flow.
3. **Vocoder** — HiFi-GAN generator (transposed-conv upsample 8×6×10 = hop 480
   at 24 kHz, mel config parity with greek_sft.yaml:55-63) with
   multi-receptive-field ResBlocks; pure conv → XLA maps it onto the MXU.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .common import Params, dense, init_dense, init_layer_norm, layer_norm, init_mlp, mlp
from . import qwen2 as q2


# ======================================================================== LM


@dataclasses.dataclass(frozen=True)
class SpeechLMConfig:
    backbone: q2.Qwen2Config = dataclasses.field(default_factory=q2.Qwen2Config.qwen2_05b)
    text_vocab: int = 151_936           # Qwen2 tokenizer vocab
    speech_token_size: int = 6561       # greek_sft.yaml:24
    # +3 control embeddings appended to the speech table: eos, sos, task
    top_p: float = 0.8                  # greek_sft.yaml RAS sampling
    top_k: int = 25
    win_size: int = 10
    tau_r: float = 0.1
    max_tokens: int = 2048              # ≈82 s of speech at 25 Hz
    # multi-token prediction: extra heads predicting t+2..t+K per step
    # (FlashTTS-style MTP; 1 = standard next-token decoding)
    mtp: int = 1
    # lossless speculative decoding over the MTP heads (B=1 only): drafts are
    # VERIFIED against the true-context sampler instead of accepted blindly,
    # so the emitted stream is token-identical to mtp=1 decoding while still
    # amortizing the weight stream over multiple positions per pass
    spec_decode: bool = False

    @property
    def eos_speech(self) -> int:
        return self.speech_token_size
    @property
    def sos_index(self) -> int:
        return self.speech_token_size + 1
    @property
    def task_index(self) -> int:
        return self.speech_token_size + 2


def init_speech_lm(key, cfg: SpeechLMConfig) -> Params:
    ks = jax.random.split(key, 5)
    h = cfg.backbone.hidden
    params: Params = {
        "backbone": q2.init_qwen2(ks[0], cfg.backbone),
        "text_embed": jax.random.normal(ks[1], (cfg.text_vocab, h)) * 0.02,
        "speech_embed": jax.random.normal(ks[2], (cfg.speech_token_size + 3, h)) * 0.02,
        "head": init_dense(ks[3], h, cfg.speech_token_size + 3),
    }
    if cfg.mtp > 1:
        # ks[4], NOT ks[3]: the main head already consumed ks[3]; deriving
        # the MTP-head keys from the same key would correlate their draws
        mtp_keys = jax.random.split(ks[4], cfg.mtp - 1)
        params["mtp_heads"] = [
            init_dense(k, h, cfg.speech_token_size + 3) for k in mtp_keys
        ]
    return params


def build_prompt_embeddings(
    params: Params,
    cfg: SpeechLMConfig,
    text_tokens: jnp.ndarray,          # [B, Tt] (right-padded with 0s + mask)
    text_mask: jnp.ndarray,            # [B, Tt] bool
    prompt_speech: jnp.ndarray,        # [B, Ts]
    prompt_speech_mask: jnp.ndarray,   # [B, Ts] bool
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Assemble ``[sos] text [task] prompt_speech`` embeddings, right-padded.

    Static shapes: output length = 2 + Tt + Ts. Valid entries are COMPACTED
    to a contiguous prefix per row (stable argsort on the mask): text shorter
    than its bucket would otherwise leave masked holes mid-sequence, breaking
    every downstream "last valid position = sum(mask)-1" gather, the decode
    steps' ``positions < prompt_len`` keep-mask, and RoPE distances across
    the hole — the official (unpadded, dynamic-length) concatenation has no
    holes, and after compaction neither does this one.
    """
    b = text_tokens.shape[0]
    sos = params["speech_embed"][cfg.sos_index][None, None, :].repeat(b, 0)
    task = params["speech_embed"][cfg.task_index][None, None, :].repeat(b, 0)
    text_e = params["text_embed"][text_tokens] * text_mask[..., None]
    sp_e = params["speech_embed"][prompt_speech] * prompt_speech_mask[..., None]
    emb = jnp.concatenate([sos, text_e, task, sp_e], axis=1)
    ones = jnp.ones((b, 1), bool)
    mask = jnp.concatenate([ones, text_mask, ones, prompt_speech_mask], axis=1)
    # stable sort: valid slots first, original order preserved within groups
    order = jnp.argsort(~mask, axis=1, stable=True)
    emb = jnp.take_along_axis(emb, order[..., None], axis=1)
    mask = jnp.take_along_axis(mask, order, axis=1)
    return emb, mask


def _ras_sample(
    key, logits: jnp.ndarray, recent: jnp.ndarray, cfg: SpeechLMConfig
) -> jnp.ndarray:
    """Repetition-aware sampling (CosyVoice2): nucleus (top-k ∩ top-p) sample;
    if the candidate token's share of the trailing ``win_size`` window is
    ≥ τ_r, resample from plain top-k (no top-p cut). logits [B, V];
    recent [B, win]."""
    k1, k2 = jax.random.split(key)
    k_eff = min(cfg.top_k, logits.shape[-1])  # tiny test vocabs
    topv, topi = jax.lax.top_k(logits, k_eff)                # [B, K]
    logp = jax.nn.log_softmax(topv, axis=-1)
    probs = jnp.exp(logp)
    csum = jnp.cumsum(probs, axis=-1)
    # top-p: keep tokens while cumulative prob (exclusive) < p
    keep = (csum - probs) < cfg.top_p
    nucleus_logits = jnp.where(keep, topv, -jnp.inf)
    cand_in_k = jax.random.categorical(k1, nucleus_logits, axis=-1)      # [B]
    cand = jnp.take_along_axis(topi, cand_in_k[:, None], axis=1)[:, 0]

    rep = jnp.mean((recent == cand[:, None]).astype(jnp.float32), axis=-1)
    resample_in_k = jax.random.categorical(k2, topv, axis=-1)
    resampled = jnp.take_along_axis(topi, resample_in_k[:, None], axis=1)[:, 0]
    return jnp.where(rep >= cfg.tau_r, resampled, cand).astype(jnp.int32)


def _mask_control_logits(logits: jnp.ndarray, cfg: SpeechLMConfig,
                         step, min_new_tokens: int) -> jnp.ndarray:
    """Forbid control tokens always; forbid EOS before ``min_new_tokens``.
    The ONE masking contract for every decode variant (batch, MTP, stream) —
    a forbidden token added here reaches all three."""
    neg = jnp.finfo(logits.dtype).min
    logits = logits.at[:, cfg.sos_index].set(neg).at[:, cfg.task_index].set(neg)
    return jnp.where(step < min_new_tokens,
                     logits.at[:, cfg.eos_speech].set(neg), logits)


def _sample_from_logits(cfg: SpeechLMConfig, sk, logits: jnp.ndarray,
                        recent: jnp.ndarray, done: jnp.ndarray, step,
                        min_new_tokens: int):
    """Sampling tail of the single-token decode given raw head logits [B, V]:
    control masking, min-new-tokens gate, RAS, EOS hold for finished rows,
    recent-window roll. Split from :func:`_sample_next` so the speculative
    verifier can batch the K head matmuls into one ([1,K,H] @ [H,V]) and
    still run this exact per-position computation on each row."""
    logits = _mask_control_logits(logits, cfg, step, min_new_tokens)
    nxt = _ras_sample(sk, logits, recent, cfg)
    nxt = jnp.where(done, cfg.eos_speech, nxt)
    recent = jnp.concatenate([recent[:, 1:], nxt[:, None]], axis=1)
    done = done | (nxt == cfg.eos_speech)
    return nxt, recent, done


def _sample_next(params: Params, cfg: SpeechLMConfig, sk, h: jnp.ndarray,
                 recent: jnp.ndarray, done: jnp.ndarray, step,
                 min_new_tokens: int):
    """One single-token decode sample, shared by the batch and streaming
    loops. h [B, 1, H] → (nxt [B], recent, done)."""
    return _sample_from_logits(
        cfg, sk, dense(params["head"], h[:, 0, :]), recent, done, step,
        min_new_tokens)


def generate_speech_tokens(
    params: Params,
    cfg: SpeechLMConfig,
    key,
    text_tokens: jnp.ndarray,
    text_mask: jnp.ndarray,
    prompt_speech: jnp.ndarray,
    prompt_speech_mask: jnp.ndarray,
    *,
    max_new_tokens: int = 512,
    min_new_tokens: int = 2,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Autoregressive speech-token generation with RAS sampling.

    Returns (tokens [B, max_new_tokens] int32 padded with eos, lengths [B]).

    Keys are POSITION-FOLDED (``fold_in(key, i)`` for generated index i) rather
    than split-chained: the sampling computation for index i then depends only
    on (key, i, prefix), which is what lets the lossless speculative mode
    (:func:`generate_speech_tokens_spec`) reproduce this loop's token stream
    exactly while drafting several positions per backbone pass.
    """
    emb, mask = build_prompt_embeddings(
        params, cfg, text_tokens, text_mask, prompt_speech, prompt_speech_mask
    )
    b, p_len, _ = emb.shape
    total = p_len + max_new_tokens
    cache = q2.init_kv_cache(cfg.backbone, b, total, emb.dtype)
    hidden, cache = q2.prefill(params["backbone"], cfg.backbone, emb, cache, length_mask=mask)

    # Last valid prompt position per row (gather its hidden state).
    last_idx = jnp.sum(mask.astype(jnp.int32), axis=1) - 1
    h_last = jnp.take_along_axis(hidden, last_idx[:, None, None], axis=1)  # [B,1,H]

    tokens0 = jnp.full((b, max_new_tokens), cfg.eos_speech, jnp.int32)
    recent0 = jnp.full((b, cfg.win_size), -1, jnp.int32)

    def cond(state):
        i, *_ , done = state
        return (i < max_new_tokens) & ~jnp.all(done)

    def body(state):
        i, h, cache, tokens, recent, done = state
        sk = jax.random.fold_in(key, i)
        nxt, recent, done = _sample_next(
            params, cfg, sk, h, recent, done, i, min_new_tokens)
        tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, i))
        # embed the sampled token and advance the backbone one step; the
        # cache slot is the shared p_len+i, but each row attends only to its
        # VALID prompt K/V and rotates at its true continuation position
        # (pad-slot attention / inflated RoPE distances otherwise degrade
        # shorter rows in a batch vs running them alone)
        x = params["speech_embed"][nxt][:, None, :]
        h, cache = q2.decode_step(
            params["backbone"], cfg.backbone, x, p_len + i, cache,
            rope_pos=last_idx + 1 + i, prompt_len=last_idx + 1,
            prompt_capacity=p_len,
        )
        return i + 1, h, cache, tokens, recent, done

    state = (
        jnp.asarray(0, jnp.int32), h_last, cache, tokens0, recent0,
        jnp.zeros((b,), bool),
    )
    _, _, _, tokens, _, _ = jax.lax.while_loop(cond, body, state)
    lengths = jnp.sum((tokens != cfg.eos_speech).astype(jnp.int32), axis=1)
    return tokens, lengths


def generate_speech_tokens_mtp(
    params: Params,
    cfg: SpeechLMConfig,
    key,
    text_tokens: jnp.ndarray,
    text_mask: jnp.ndarray,
    prompt_speech: jnp.ndarray,
    prompt_speech_mask: jnp.ndarray,
    *,
    max_new_tokens: int = 512,
    min_new_tokens: int = 2,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Multi-token-prediction decoding (cfg.mtp tokens per backbone pass).

    FlashTTS-style serving: per iteration, ingest the K tokens sampled last
    iteration in ONE multi-position pass (q2.decode_span — weights stream from
    HBM once), then emit K new tokens: the next-token head plus K−1 MTP heads,
    all read off the newest hidden state. Speech tokens tolerate the weaker
    conditioning of heads t+2..t+K (trained jointly; FlashTTS/Llasa+ show
    negligible quality loss at K≤4), so no verification pass is needed.
    """
    k_mtp = cfg.mtp
    assert k_mtp > 1, "use generate_speech_tokens for mtp == 1"
    emb, mask = build_prompt_embeddings(
        params, cfg, text_tokens, text_mask, prompt_speech, prompt_speech_mask
    )
    b, p_len, _ = emb.shape
    n_iters = -(-max_new_tokens // k_mtp)
    total = p_len + n_iters * k_mtp
    cache = q2.init_kv_cache(cfg.backbone, b, total, emb.dtype)
    hidden, cache = q2.prefill(params["backbone"], cfg.backbone, emb, cache, length_mask=mask)
    last_idx = jnp.sum(mask.astype(jnp.int32), axis=1) - 1
    h_last = jnp.take_along_axis(hidden, last_idx[:, None, None], axis=1)[:, 0, :]

    tokens0 = jnp.full((b, n_iters * k_mtp), cfg.eos_speech, jnp.int32)
    recent0 = jnp.full((b, cfg.win_size), -1, jnp.int32)

    def sample_k(key, h, recent, step_base):
        """K tokens from one hidden state: head 0 and every MTP head sample
        with RAS against a LOCALLY rolled window (head j sees heads <j's
        draws). The local window is conditioning only — the caller rebuilds
        the persistent window from the post-EOS-propagation tokens, so it
        never carries tokens that were never emitted."""
        keys = jax.random.split(key, k_mtp)
        toks = []
        for j in range(k_mtp):
            head = params["head"] if j == 0 else params["mtp_heads"][j - 1]
            logits = _mask_control_logits(
                dense(head, h).astype(jnp.float32), cfg,
                step_base + j, min_new_tokens)
            nxt = _ras_sample(keys[j], logits, recent, cfg)
            recent = jnp.concatenate([recent[:, 1:], nxt[:, None]], axis=1)
            toks.append(nxt)
        return jnp.stack(toks, axis=1)  # [B, K]

    def cond(state):
        i, *_, done = state
        return (i < n_iters) & ~jnp.all(done)

    def body(state):
        i, h, cache, tokens, recent, key, done = state
        key, sk = jax.random.split(key)
        new_toks = sample_k(sk, h, recent, i * k_mtp)
        # EOS propagation inside the block: everything after the first EOS pads
        is_eos = new_toks == cfg.eos_speech
        after_eos = jnp.cumsum(is_eos.astype(jnp.int32), axis=1) - is_eos.astype(jnp.int32) > 0
        new_toks = jnp.where(after_eos | done[:, None], cfg.eos_speech, new_toks)
        tokens = jax.lax.dynamic_update_slice(tokens, new_toks, (0, i * k_mtp))
        done = done | jnp.any(new_toks == cfg.eos_speech, axis=1)
        # persistent RAS window from the tokens actually EMITTED (post
        # propagation) — sample_k's local window may contain overwritten ones
        recent = jnp.concatenate([recent, new_toks], axis=1)[:, -cfg.win_size:]
        # ingest the K tokens in one multi-position pass (per-row RoPE +
        # pad-slot masking — see generate_speech_tokens)
        x = params["speech_embed"][new_toks]
        h_span, cache = q2.decode_span(
            params["backbone"], cfg.backbone, x, p_len + i * k_mtp, cache,
            rope_pos=last_idx + 1 + i * k_mtp, prompt_len=last_idx + 1,
            prompt_capacity=p_len,
        )
        return i + 1, h_span[:, -1, :], cache, tokens, recent, key, done

    state = (jnp.asarray(0, jnp.int32), h_last, cache, tokens0, recent0, key,
             jnp.zeros((b,), bool))
    _, _, _, tokens, _, _, _ = jax.lax.while_loop(cond, body, state)
    tokens = tokens[:, :max_new_tokens]
    lengths = jnp.sum((tokens != cfg.eos_speech).astype(jnp.int32), axis=1)
    return tokens, lengths


def generate_speech_tokens_spec(
    params: Params,
    cfg: SpeechLMConfig,
    key,
    text_tokens: jnp.ndarray,
    text_mask: jnp.ndarray,
    prompt_speech: jnp.ndarray,
    prompt_speech_mask: jnp.ndarray,
    *,
    max_new_tokens: int = 512,
    min_new_tokens: int = 2,
    with_stats: bool = False,
):
    """LOSSLESS speculative decoding over the MTP heads (B=1 latency path).

    Where :func:`generate_speech_tokens_mtp` accepts every MTP draft (K
    tokens per backbone pass, small trained-in quality cost), this variant
    emits a stream TOKEN-IDENTICAL to :func:`generate_speech_tokens` (K=1)
    while still amortizing the HBM weight stream — the binding constraint of
    B=1 decode — over up to K positions per pass. The mechanism is
    speculative sampling with common random numbers:

    - the verifier for generated index i runs EXACTLY the K=1 loop body
      (:func:`_sample_next`: control masking, min-new-tokens gate, RAS) on the
      true-context hidden state with the position-folded key ``fold_in(key,
      i)`` — so whatever it samples IS what K=1 would have emitted;
    - the draft for index i runs the SAME sampler (same key, same window
      evolution) on ``mtp_heads[j-1]``'s logits from one pass earlier. With
      identical Gumbel noise, draft == verifier sample whenever the two
      distributions agree around the mode — trained MTP heads
      (tests/test_mtp_quality.py) make this the common case;
    - per pass, ``decode_span`` ingests [pending, d_1..d_{K-1}] in one
      multi-position dispatch; verifier samples s_j are read off its hidden
      states; emission stops at the first s_j ≠ d_j (the mismatch position
      still emits s_j — the true sample, a free correction) or runs through
      a bonus K-th sample when every draft matched. ≥1 token per pass is
      guaranteed (s_1 is always computable), so progress never stalls.

    Cache discipline: accepted tokens land in consecutive slots, so the next
    pass's span write at ``p_len + n - 1`` overwrites exactly the slots of
    rejected drafts; ``decode_span``'s absolute-position causal mask never
    reads a stale slot.

    Exactness domain (same as any speculative-sampling implementation): the
    stream is BIT-identical to K=1 whenever ``decode_span``'s hidden states
    match ``decode_step``'s bitwise — true on CPU f32 (asserted across seeds
    in tests/test_spec_decode.py) and on TPU f32 under
    ``jax_default_matmul_precision=highest`` (verified on-chip; at default
    TPU precision the S=K vs S=1 matmul tilings differ in low-order bits).
    At serving precision (bf16) each emitted token still comes from the
    true-context K=1 sampler — the verifier IS that computation on the real
    prefix — so the output DISTRIBUTION is the K=1 sampler's even when a
    low-order-bit difference resamples a boundary token; contrast accept-all
    MTP, whose drafts come from the weaker t+j heads unverified.

    B=1 only: variable per-row acceptance would need per-row cache write
    offsets (scatter); batch throughput belongs to the accept-all MTP / dp
    paths anyway — this is the latency knob. Returns (tokens [1,
    max_new_tokens], lengths [1]); with ``with_stats`` adds
    {"backbone_passes", "emitted"} for tokens-per-pass accounting.
    """
    k_mtp = cfg.mtp
    assert k_mtp > 1, "spec decode needs MTP heads (cfg.mtp > 1)"
    if text_tokens.shape[0] != 1:
        raise ValueError(
            "generate_speech_tokens_spec is the B=1 latency path; use "
            "generate_speech_tokens(_mtp) for batched synthesis")
    b = 1
    emb, mask = build_prompt_embeddings(
        params, cfg, text_tokens, text_mask, prompt_speech, prompt_speech_mask
    )
    _, p_len, _ = emb.shape
    # Each pass writes K slots starting at p_len + n - 1 with n < max_new
    total = p_len + max_new_tokens + k_mtp
    cache = q2.init_kv_cache(cfg.backbone, b, total, emb.dtype)
    hidden, cache = q2.prefill(params["backbone"], cfg.backbone, emb, cache, length_mask=mask)
    last_idx = jnp.sum(mask.astype(jnp.int32), axis=1) - 1
    h0 = jnp.take_along_axis(hidden, last_idx[:, None, None], axis=1)  # [1,1,H]

    n_buf = max_new_tokens + k_mtp
    tokens0 = jnp.full((b, n_buf), cfg.eos_speech, jnp.int32)
    recent0 = jnp.full((b, cfg.win_size), -1, jnp.int32)

    # x_0 is sampled exactly as K=1's step 0 (true context, fold_in(key, 0))
    t0, recent1, done0 = _sample_next(
        params, cfg, jax.random.fold_in(key, 0), h0, recent0,
        jnp.zeros((b,), bool), jnp.asarray(0, jnp.int32), min_new_tokens)
    tokens1 = jax.lax.dynamic_update_slice(tokens0, t0[:, None], (0, 0))

    def cond(state):
        n, *_, done, passes = state
        return (n < max_new_tokens) & ~jnp.all(done)

    def body(state):
        n, t_pend, h, cache, tokens, recent, done, passes = state
        # ---- drafts: mtp_heads[j-1](h) proposes x_{n-1+j}; same sampler,
        # same position-folded key, same window evolution as the verifier
        recent_d = recent
        drafts = []
        for j in range(1, k_mtp):
            pos = n - 1 + j
            logits_d = _mask_control_logits(
                dense(params["mtp_heads"][j - 1], h[:, 0, :]), cfg,
                pos, min_new_tokens)
            d = _ras_sample(jax.random.fold_in(key, pos), logits_d, recent_d, cfg)
            recent_d = jnp.concatenate([recent_d[:, 1:], d[:, None]], axis=1)
            drafts.append(d)
        # ---- one multi-position pass ingests [pending, drafts]
        span = jnp.stack([t_pend] + drafts, axis=1)              # [1, K]
        x = params["speech_embed"][span]
        h_span, cache = q2.decode_span(
            params["backbone"], cfg.backbone, x, p_len + n - 1, cache,
            rope_pos=last_idx + n, prompt_len=last_idx + 1,
            prompt_capacity=p_len,
        )
        # ---- verify: s_j = the true K=1 sample for x_{n-1+j}; emit while
        # every earlier draft matched (plus the bonus K-th when all matched).
        # One [1,K,H] @ [H,V] matmul streams the main head ONCE per pass —
        # per-position dense() calls would re-read the head matrix K times
        # on exactly the HBM-bound path this decoder exists to relieve.
        verif_logits = dense(params["head"], h_span)            # [1, K, V]
        acc = ~done
        rec, dn = recent, done
        s_list, flags = [], []
        for j in range(1, k_mtp + 1):
            pos = n - 1 + j
            s, rec, dn = _sample_from_logits(
                cfg, jax.random.fold_in(key, pos),
                verif_logits[:, j - 1, :], rec, dn, pos, min_new_tokens)
            s_list.append(s)
            flags.append(acc)
            if j < k_mtp:
                acc = acc & (s == drafts[j - 1]) & (s != cfg.eos_speech)
        s_vec = jnp.stack(s_list, axis=1)                        # [1, K]
        flag_vec = jnp.stack(flags, axis=1)                      # [1, K] bool
        e = jnp.sum(flag_vec.astype(jnp.int32))                  # scalar ≥ 1
        s_masked = jnp.where(flag_vec, s_vec, cfg.eos_speech)
        tokens = jax.lax.dynamic_update_slice(tokens, s_masked, (0, n))
        done = done | jnp.any(flag_vec & (s_vec == cfg.eos_speech), axis=1)
        # window after the emitted prefix: last win of (recent ++ s_1..s_e)
        full = jnp.concatenate([recent, s_masked], axis=1)
        recent = jax.lax.dynamic_slice(full, (0, e), (b, cfg.win_size))
        t_pend = jax.lax.dynamic_slice(s_masked, (0, e - 1), (b, 1))[:, 0]
        h = jax.lax.dynamic_slice_in_dim(h_span, e - 1, 1, axis=1)
        return n + e, t_pend, h, cache, tokens, recent, done, passes + 1

    state = (jnp.asarray(1, jnp.int32), t0, h0, cache, tokens1, recent1,
             done0, jnp.asarray(0, jnp.int32))
    n_fin, _, _, _, tokens, _, _, passes = jax.lax.while_loop(cond, body, state)
    tokens = tokens[:, :max_new_tokens]
    lengths = jnp.sum((tokens != cfg.eos_speech).astype(jnp.int32), axis=1)
    if with_stats:
        return tokens, lengths, {"backbone_passes": passes,
                                 "emitted": jnp.minimum(n_fin, max_new_tokens)}
    return tokens, lengths


def select_generator(lm_cfg: SpeechLMConfig, batch_size: int):
    """THE routing rule from (config, batch size) to a decode function —
    shared by the native and official synthesis chains so a change here can
    never give them different decode behavior for the same config: lossless
    speculative for B=1 when opted in, accept-all MTP when heads exist,
    single-token otherwise."""
    if lm_cfg.mtp > 1 and lm_cfg.spec_decode and batch_size == 1:
        return generate_speech_tokens_spec
    if lm_cfg.mtp > 1:
        return generate_speech_tokens_mtp
    return generate_speech_tokens


# ============================================================ flow matching


@dataclasses.dataclass(frozen=True)
class FlowConfig:
    token_vocab: int = 6561 + 3
    dim: int = 512                     # estimator width
    layers: int = 6
    heads: int = 8
    n_mels: int = 80                   # greek_sft.yaml:57
    token_mel_ratio: int = 2           # greek_sft.yaml:17
    spk_embed_dim: int = 192           # greek_sft.yaml:14
    n_steps: int = 10                  # Euler steps
    cfg_rate: float = 0.7              # inference CFG strength
    sigma_min: float = 1e-6


def _init_dit_block(key, cfg: FlowConfig) -> Params:
    ks = jax.random.split(key, 4)
    from .common import AttnConfig, init_attention

    return {
        "ln1": init_layer_norm(cfg.dim),
        "attn": init_attention(ks[0], AttnConfig(cfg.dim, cfg.heads, k_bias=True)),
        "ln2": init_layer_norm(cfg.dim),
        "mlp": init_mlp(ks[1], cfg.dim, cfg.dim * 4),
        # AdaLN modulation: time embedding → 6 per-channel (scale, shift, gate)×2.
        # adaLN-Zero (DiT §3): zero-init so every gate starts at 0 and each
        # residual branch starts as identity — the documented requirement for
        # stable diffusion/flow-transformer training at depth
        "ada": {"kernel": jnp.zeros((cfg.dim, 6 * cfg.dim)),
                "bias": jnp.zeros((6 * cfg.dim,))},
    }


def init_flow(key, cfg: FlowConfig) -> Params:
    ks = jax.random.split(key, cfg.layers + 6)
    return {
        "token_embed": jax.random.normal(ks[0], (cfg.token_vocab, cfg.dim)) * 0.02,
        "spk_proj": init_dense(ks[1], cfg.spk_embed_dim, cfg.dim),
        "in_proj": init_dense(ks[2], cfg.n_mels * 2, cfg.dim),  # x_t ⊕ prompt-mel cond
        "time_mlp": init_mlp(ks[3], cfg.dim, cfg.dim),
        "blocks": [_init_dit_block(ks[4 + i], cfg) for i in range(cfg.layers)],
        "ln_out": init_layer_norm(cfg.dim),
        "out_proj": init_dense(ks[4 + cfg.layers], cfg.dim, cfg.n_mels),
    }


def _time_embedding(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Sinusoidal diffusion-time embedding. t [B] in [0,1] → [B, dim]."""
    half = dim // 2
    freqs = jnp.exp(-np.log(10000.0) * jnp.arange(half) / half)
    ang = t[:, None] * freqs[None, :] * 1000.0
    return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)


@functools.lru_cache(maxsize=16)
def _flow_rope_table(t_frames: int, head_dim: int):
    """cos/sin RoPE tables for the flow estimator's self-attention (host
    numpy, cached per static shape). Every other op in the estimator is
    per-frame, so without a positional signal the DiT would be permutation-
    equivariant over mel frames — unable to represent temporal order at all
    (the reference estimator gets position from convolution locality;
    Docker/api usage of matcha's conv U-Net). RoPE, being relative, also
    keeps streaming windows consistent: a window starting mid-utterance sees
    the same pairwise distances the full sequence would."""
    inv = 1.0 / (10_000.0 ** (np.arange(0, head_dim, 2) / head_dim))
    fr = np.outer(np.arange(t_frames), inv)
    emb = np.concatenate([fr, fr], axis=-1)
    return np.cos(emb).astype(np.float32), np.sin(emb).astype(np.float32)


def _flow_rope_mha(p: Params, heads: int, x: jnp.ndarray,
                   mask: jnp.ndarray) -> jnp.ndarray:
    """Self-attention with RoPE on q/k (the flow DiT's temporal signal)."""
    from .common import _merge_heads, _split_heads

    head_dim = x.shape[-1] // heads
    cos_np, sin_np = _flow_rope_table(x.shape[1], head_dim)
    cos = jnp.asarray(cos_np, x.dtype)
    sin = jnp.asarray(sin_np, x.dtype)
    q = q2.apply_rope(_split_heads(dense(p["q"], x), heads), cos, sin)
    k = q2.apply_rope(_split_heads(dense(p["k"], x), heads), cos, sin)
    v = _split_heads(dense(p["v"], x), heads)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * (head_dim ** -0.5), k)
    logits = jnp.where(mask, logits, jnp.finfo(logits.dtype).min)
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
    return dense(p["o"], _merge_heads(jnp.einsum("bhqk,bkhd->bqhd", w, v)))


def flow_estimator(
    params: Params,
    cfg: FlowConfig,
    x_t: jnp.ndarray,          # [B, T, n_mels] noisy mel at time t
    t: jnp.ndarray,            # [B] flow time
    token_cond: jnp.ndarray,   # [B, T, dim] upsampled token encodings
    spk: jnp.ndarray,          # [B, spk_embed_dim]
    mel_cond: jnp.ndarray,     # [B, T, n_mels] prompt mel (zeros beyond prompt)
    mask: jnp.ndarray,         # [B, T] valid frames
) -> jnp.ndarray:
    """DiT estimator: v(x_t, t | tokens, speaker, prompt-mel) → [B, T, n_mels].

    Temporal order enters through RoPE in the self-attention
    (:func:`_flow_rope_mha`); everything else is per-frame."""
    h = dense(params["in_proj"], jnp.concatenate([x_t, mel_cond], axis=-1))
    temb_dtype = h.dtype
    h = h + token_cond + dense(params["spk_proj"], spk)[:, None, :]
    temb = mlp(params["time_mlp"], _time_embedding(t, cfg.dim).astype(temb_dtype))  # [B, dim]
    attn_mask = mask[:, None, None, :]

    for blk in params["blocks"]:
        mod = dense(blk["ada"], jax.nn.silu(temb))[:, None, :]
        s1, b1, g1, s2, b2, g2 = jnp.split(mod, 6, axis=-1)
        a_in = layer_norm(blk["ln1"], h) * (1 + s1) + b1
        h = h + g1 * _flow_rope_mha(blk["attn"], cfg.heads, a_in, attn_mask)
        m_in = layer_norm(blk["ln2"], h) * (1 + s2) + b2
        h = h + g2 * mlp(blk["mlp"], m_in)
    return dense(params["out_proj"], layer_norm(params["ln_out"], h)) * mask[..., None]


def tokens_to_mel(
    params: Params,
    cfg: FlowConfig,
    key,
    speech_tokens: jnp.ndarray,   # [B, T_tok]
    token_mask: jnp.ndarray,      # [B, T_tok]
    spk_embedding: jnp.ndarray,   # [B, 192]
    prompt_mel: jnp.ndarray,      # [B, T_prompt, n_mels] (continuation prefix)
    prompt_mel_mask: jnp.ndarray, # [B, T_prompt]
    prompt_tokens: Optional[jnp.ndarray] = None,       # [B, T_ptok]
    prompt_token_mask: Optional[jnp.ndarray] = None,   # [B, T_ptok]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """OT-CFM inference: Euler-integrate dx/dt = v(x,t|c) from x_0 ~ N(0,I).

    The prompt mel occupies the first frames as teacher-forced conditioning
    (zero-shot continuation, as in CosyVoice's prompt mel concat). When the
    prompt's speech tokens are supplied they condition the prompt frames too
    — training (:func:`flow_matching_loss`, like the official
    MaskedDiffWithXvec.forward) always pairs exposed mel with its token
    encodings, so (mel_cond ≠ 0, token_cond = 0) on the prompt frames would
    be an out-of-distribution combination. Returns
    (mel [B, T_frames, n_mels], frame_mask) with
    T_frames = token_mel_ratio * T_tok + T_prompt.
    """
    b, t_tok = speech_tokens.shape
    r = cfg.token_mel_ratio
    tok = params["token_embed"][speech_tokens] * token_mask[..., None]
    up = jnp.repeat(tok, r, axis=1)                      # [B, r*T_tok, dim]
    up_mask = jnp.repeat(token_mask, r, axis=1)

    t_prompt = prompt_mel.shape[1]
    if prompt_tokens is not None:
        ptok = params["token_embed"][prompt_tokens] * prompt_token_mask[..., None]
        pup = jnp.repeat(ptok, r, axis=1)
        # align to the prompt-mel frame count (fbank framing need not give
        # exactly r frames per token) — pad or slice, then mask
        if pup.shape[1] < t_prompt:
            pup = jnp.pad(pup, ((0, 0), (0, t_prompt - pup.shape[1]), (0, 0)))
        else:
            pup = pup[:, :t_prompt]
        prompt_cond = pup * prompt_mel_mask[..., None]
    else:
        prompt_cond = jnp.zeros((b, t_prompt, cfg.dim), up.dtype)
    token_cond = jnp.concatenate([prompt_cond, up], axis=1)
    frame_mask = jnp.concatenate([prompt_mel_mask, up_mask], axis=1)
    total_frames = t_prompt + r * t_tok
    mel_cond = jnp.concatenate(
        [prompt_mel * prompt_mel_mask[..., None],
         jnp.zeros((b, r * t_tok, cfg.n_mels), prompt_mel.dtype)], axis=1
    )

    x = jax.random.normal(key, (b, total_frames, cfg.n_mels), prompt_mel.dtype)
    dt = 1.0 / cfg.n_steps

    # CFG batching: run conditional + unconditional through ONE estimator call
    # (batch 2B) — halves per-step dispatches and doubles MXU utilisation at
    # the tiny batch sizes typical of serving.
    if cfg.cfg_rate > 0:
        token_cond2 = jnp.concatenate([token_cond, jnp.zeros_like(token_cond)])
        spk2 = jnp.concatenate([spk_embedding, jnp.zeros_like(spk_embedding)])
        mel_cond2 = jnp.concatenate([mel_cond, jnp.zeros_like(mel_cond)])
        mask2 = jnp.concatenate([frame_mask, frame_mask])

    def euler_step(i, x):
        t = jnp.full((b,), i * dt, x.dtype)
        if cfg.cfg_rate > 0:
            v2 = flow_estimator(
                params, cfg, jnp.concatenate([x, x]), jnp.concatenate([t, t]),
                token_cond2, spk2, mel_cond2, mask2,
            )
            v_cond, v_unc = v2[:b], v2[b:]
            v = (1 + cfg.cfg_rate) * v_cond - cfg.cfg_rate * v_unc
        else:
            v = flow_estimator(params, cfg, x, t, token_cond, spk_embedding, mel_cond, frame_mask)
        return (x + dt * v).astype(x.dtype)

    x = jax.lax.fori_loop(0, cfg.n_steps, euler_step, x)
    return x * frame_mask[..., None], frame_mask


def flow_matching_loss(
    params: Params, cfg: FlowConfig, key,
    mel: jnp.ndarray, speech_tokens: jnp.ndarray, token_mask: jnp.ndarray,
    spk_embedding: jnp.ndarray,
) -> jnp.ndarray:
    """OT-CFM training loss: E_t ||v(x_t, t) − (x_1 − (1−σ_min) x_0)||².

    Conditioning parity with the official flow training
    (MaskedDiffWithXvec.forward): per row, with p=0.5, a random prefix
    (≤30 % of the valid frames) of the target mel is exposed as ``mel_cond``
    — so the prompt-mel pathway :func:`tokens_to_mel` uses at inference is
    actually trained; and all conditioning drops with the matcha
    ``training_cfg_rate`` (0.2) so the unconditional mode CFG extrapolates
    against exists."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    b, t_frames, _ = mel.shape
    x0 = jax.random.normal(k1, mel.shape, mel.dtype)
    t = jax.random.uniform(k2, (b,), mel.dtype)
    x_t = (1 - (1 - cfg.sigma_min) * t[:, None, None]) * x0 + t[:, None, None] * mel
    target = mel - (1 - cfg.sigma_min) * x0

    tok = params["token_embed"][speech_tokens] * token_mask[..., None]
    up = jnp.repeat(tok, cfg.token_mel_ratio, axis=1)
    up_mask = jnp.repeat(token_mask, cfg.token_mel_ratio, axis=1)
    # align to the mel frame count: STFT framing can yield a frame more or
    # less than token_mel_ratio·T_tok — pad or slice instead of relying on
    # slicing alone (which cannot lengthen and then broadcast-crashes)
    if up.shape[1] < t_frames:
        up = jnp.pad(up, ((0, 0), (0, t_frames - up.shape[1]), (0, 0)))
        up_mask = jnp.pad(up_mask, ((0, 0), (0, t_frames - up_mask.shape[1])))
    else:
        up = up[:, :t_frames]
        up_mask = up_mask[:, :t_frames]

    # official "conds": random target-prefix visible as the mel conditioning
    n_valid = jnp.sum(up_mask.astype(jnp.int32), axis=1)
    use_prompt = jax.random.uniform(k3, (b,)) < 0.5
    frac = jax.random.uniform(k4, (b,)) * 0.3
    prefix = (frac * n_valid).astype(jnp.int32) * use_prompt.astype(jnp.int32)
    pos = jnp.arange(t_frames)[None, :]
    mel_cond = jnp.where((pos < prefix[:, None])[..., None], mel, 0.0)
    # matcha training_cfg_rate=0.2: drop ALL conditioning on those rows
    keep = (jax.random.uniform(k5, (b,)) >= 0.2).astype(mel.dtype)
    v = flow_estimator(
        params, cfg, x_t, t,
        up * keep[:, None, None], spk_embedding * keep[:, None],
        mel_cond * keep[:, None, None], up_mask,
    )
    sq = jnp.sum((v - target) ** 2, axis=-1) * up_mask
    return jnp.sum(sq) / (jnp.sum(up_mask) * cfg.n_mels + 1e-8)


# ================================================================== vocoder


@dataclasses.dataclass(frozen=True)
class VocoderConfig:
    n_mels: int = 80
    base_channels: int = 512
    upsample_rates: Tuple[int, ...] = (8, 6, 10)     # 480 = 24 kHz / 50 Hz frames
    upsample_kernels: Tuple[int, ...] = (16, 12, 20)
    resblock_kernels: Tuple[int, ...] = (3, 7, 11)
    resblock_dilations: Tuple[Tuple[int, ...], ...] = ((1, 3, 5),) * 3

    @property
    def hop(self) -> int:
        out = 1
        for r in self.upsample_rates:
            out *= r
        return out


def _init_conv(key, width, in_ch, out_ch):
    scale = 1.0 / np.sqrt(in_ch * width)
    return {
        "kernel": jax.random.uniform(key, (width, in_ch, out_ch), jnp.float32, -scale, scale),
        "bias": jnp.zeros((out_ch,)),
    }


def _conv1d(p, x, *, stride=1, dilation=1):
    x = x.astype(p["kernel"].dtype)
    width = p["kernel"].shape[0]
    pad = dilation * (width - 1) // 2
    return jax.lax.conv_general_dilated(
        x, p["kernel"], (stride,), [(pad, pad)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
    ) + p["bias"]


def _conv_transpose1d(p, x, stride):
    """torch ConvTranspose1d(stride=s, padding=(k−s)//2) parity — implemented
    as a conv over the s-dilated input with a flipped kernel, so
    out_len = in_len × s exactly (HiFi-GAN's length contract)."""
    width = p["kernel"].shape[0]
    pad_torch = (width - stride) // 2
    pad = width - 1 - pad_torch
    y = jax.lax.conv_general_dilated(
        x, jnp.flip(p["kernel"], 0), (1,), [(pad, pad - (width - stride) % 2)],
        lhs_dilation=(stride,),
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    return y + p["bias"]


def init_vocoder(key, cfg: VocoderConfig) -> Params:
    keys = iter(jax.random.split(key, 256))
    ch = cfg.base_channels
    params: Params = {"conv_pre": _init_conv(next(keys), 7, cfg.n_mels, ch), "ups": [], "res": []}
    for i, (r, kw) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernels)):
        out_ch = ch // (2 ** (i + 1))
        params["ups"].append(_init_conv(next(keys), kw, ch // (2 ** i), out_ch))
        stage = []
        for k, dils in zip(cfg.resblock_kernels, cfg.resblock_dilations):
            block = [
                {
                    "c1": _init_conv(next(keys), k, out_ch, out_ch),
                    "c2": _init_conv(next(keys), k, out_ch, out_ch),
                }
                for _ in dils
            ]
            stage.append(block)
        params["res"].append(stage)
    final_ch = cfg.base_channels // (2 ** len(cfg.upsample_rates))
    params["conv_post"] = _init_conv(next(keys), 7, final_ch, 1)
    return params


def vocode(params: Params, cfg: VocoderConfig, mel: jnp.ndarray,
           *, fused: bool | None = None) -> jnp.ndarray:
    """mel [B, T, n_mels] → waveform [B, T * hop] at 24 kHz.

    ``fused``: use the Pallas resblock kernel for the narrow tail stages
    (default: on TPU). Pass ``False`` when the program is partitioned by
    GSPMD (see :func:`vocode_sp`) — pallas_call cannot be auto-sharded.

    Perf note (v5e, 10 s utterance): the narrow-channel (≤128) upsampled
    tail stages run ~10× off the bandwidth/MXU bound under XLA's conv
    lowering (NHC puts the 64-wide channel axis on the 128-lane dim and
    every conv re-streams HBM). Those stages now run through the fused
    blocked channel-time Pallas kernel (ops/pallas_vocoder.py): one HBM
    round-trip per stage, [C_out,C_in]@[C_in,T_tile] matmuls with time on
    the MXU's N axis — measured 5.1 ms vs 13.7 ms XLA for the C=64/T=240k
    stage (bf16, one v5e chip). Round-2 attempts that re-streamed per
    shifted view or im2col'd from HBM were slower than XLA; keeping every
    shift in VMEM is what wins.
    """
    lrelu = lambda x: jax.nn.leaky_relu(x, 0.1)
    use_fused = (jax.default_backend() == "tpu") if fused is None else fused
    x = _conv1d(params["conv_pre"], mel)
    for up, stage, rate in zip(params["ups"], params["res"], cfg.upsample_rates):
        x = _conv_transpose1d(up, lrelu(x), rate)
        ch = x.shape[-1]
        if use_fused and ch <= 128 and ch % 8 == 0:
            from ..ops import pallas_vocoder as pv

            x = pv.fused_resblock_stage(
                x, pv.stage_weights_flat(stage, cfg.resblock_kernels,
                                         cfg.resblock_dilations),
                kernels=tuple(cfg.resblock_kernels),
                dilations=tuple(tuple(d) for d in cfg.resblock_dilations))
            continue
        acc = None
        for block, dils in zip(stage, cfg.resblock_dilations):
            h = x
            for unit, d in zip(block, dils):
                y = _conv1d(unit["c1"], lrelu(h), dilation=d)
                y = _conv1d(unit["c2"], lrelu(y))
                h = h + y
            acc = h if acc is None else acc + h
        x = acc / len(stage)
    x = jnp.tanh(_conv1d(params["conv_post"], lrelu(x)))
    return x[..., 0]


def vocode_sp(params: Params, cfg: VocoderConfig, mel: jnp.ndarray,
              mesh, axis: str) -> jnp.ndarray:
    """Sequence-parallel vocoding: the mel TIME axis is sharded over
    ``mesh``'s ``axis`` and XLA's SPMD partitioner spatially partitions every
    conv/conv-transpose, inserting halo exchanges (collective-permute of the
    receptive-field borders) between neighbours.

    This is the long-audio path: a one-hour podcast episode is ~86 M output
    samples — 1500× the 10 s serving case — and the vocoder is the only
    cascade stage whose cost is a pure function of audio length. Sharding
    time over an 8-chip slice divides the stage ~8× (halos are a few hundred
    frames against millions). Numerically transparent: validated exact
    (~2e-9 f32) against single-device :func:`vocode` on the virtual mesh.

    The fused Pallas tail kernel is disabled here (pallas_call cannot be
    GSPMD-partitioned); per-chip XLA convs sharded 8 ways still beat one
    chip running fused kernels ~3×. No reference counterpart — the
    reference's HiFT runs single-GPU per request (Docker/cosyvoice_api.py).
    """
    n = mesh.shape[axis]
    t = mel.shape[1]
    pad = (-t) % n
    if pad:
        # SPMD needs equal time shards. Zero-padded frames bleed into the
        # final receptive field (≲64 frames × hop samples) of the trimmed
        # waveform through conv look-ahead; frame counts divisible by the
        # axis size are bit-comparable to single-device vocode. Long-audio
        # callers should round their mel length to the axis size.
        mel = jnp.pad(mel, ((0, 0), (0, pad), (0, 0)))
    wave = _vocode_sp_jit(cfg, mesh, axis)(params, mel)
    return wave[:, : t * cfg.hop] if pad else wave


@functools.lru_cache(maxsize=16)
def _vocode_sp_jit(cfg: VocoderConfig, mesh, axis: str):
    """Cached jit per (cfg, mesh, axis): building a fresh jit-wrapped lambda
    per call would recompile the 8-way GSPMD conv stack on every invocation
    even at identical shapes."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.jit(
        lambda p, m: vocode(p, cfg, m, fused=False),
        in_shardings=(NamedSharding(mesh, P()),
                      NamedSharding(mesh, P(None, axis, None))),
    )


# ============================================================== full model


@dataclasses.dataclass(frozen=True)
class CosyVoiceConfig:
    lm: SpeechLMConfig = dataclasses.field(default_factory=SpeechLMConfig)
    flow: FlowConfig = dataclasses.field(default_factory=FlowConfig)
    vocoder: VocoderConfig = dataclasses.field(default_factory=VocoderConfig)
    sample_rate: int = 24_000           # greek_sft.yaml:11


def init_cosyvoice(key, cfg: CosyVoiceConfig) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "lm": init_speech_lm(k1, cfg.lm),
        "flow": init_flow(k2, cfg.flow),
        "vocoder": init_vocoder(k3, cfg.vocoder),
    }


def synthesize(
    params: Params,
    cfg: CosyVoiceConfig,
    key,
    text_tokens: jnp.ndarray,
    text_mask: jnp.ndarray,
    prompt_speech_tokens: jnp.ndarray,
    prompt_speech_mask: jnp.ndarray,
    spk_embedding: jnp.ndarray,
    prompt_mel: jnp.ndarray,
    prompt_mel_mask: jnp.ndarray,
    *,
    max_new_tokens: int = 512,
    min_new_tokens: int = 2,
    vocode_fused: bool | None = None,
) -> Dict[str, jnp.ndarray]:
    """Zero-shot TTS: text + voice prompt → 24 kHz waveform.

    Mirrors ``CosyVoice2.inference_zero_shot`` (Docker/cosyvoice_api.py:128):
    the prompt transcription tokens ride in ``text_tokens``; the prompt's
    speech tokens and mel provide the cloning context. ``vocode_fused``
    forwards to :func:`vocode` — pass ``False`` when this program runs under
    a GSPMD mesh (pallas_call cannot be auto-partitioned).
    """
    k_lm, k_flow = jax.random.split(key)
    gen = select_generator(cfg.lm, text_tokens.shape[0])
    tokens, lengths = gen(
        params["lm"], cfg.lm, k_lm, text_tokens, text_mask,
        prompt_speech_tokens, prompt_speech_mask, max_new_tokens=max_new_tokens,
        min_new_tokens=min_new_tokens,
    )
    token_mask = jnp.arange(tokens.shape[1])[None, :] < lengths[:, None]
    safe_tokens = jnp.where(token_mask, tokens, 0)
    mel, frame_mask = tokens_to_mel(
        params["flow"], cfg.flow, k_flow, safe_tokens, token_mask,
        spk_embedding, prompt_mel, prompt_mel_mask,
        prompt_tokens=jnp.where(prompt_speech_mask, prompt_speech_tokens, 0),
        prompt_token_mask=prompt_speech_mask,
    )
    # Drop the prompt frames before vocoding (output = new speech only)
    t_prompt = prompt_mel.shape[1]
    gen_mel = mel[:, t_prompt:]
    audio = vocode(params["vocoder"], cfg.vocoder, gen_mel, fused=vocode_fused)
    return {
        "audio": audio,
        "mel": gen_mel,
        "speech_tokens": tokens,
        "token_lengths": lengths,
    }


# ========================================================= streaming synthesis
#
# The reference config carries CosyVoice2's streaming params (chunk_size 25,
# greek_sft.yaml:20-21) but its API consumes only the FIRST generator chunk
# (Docker/cosyvoice_api.py:129) — streaming capability without streaming
# delivery. Here it is rebuilt TPU-first: every per-chunk program has static
# shapes, so the whole stream reuses three compiled graphs (LM chunk, flow
# chunk, vocoder chunk) regardless of utterance length. Time-to-first-audio
# drops from O(utterance) to O(one chunk).


@dataclasses.dataclass(frozen=True)
class StreamConfig:
    chunk_tokens: int = 25       # greek_sft.yaml:20 chunk_size — 1 s @ 25 Hz
    flow_context: int = 16       # mel frames of left context re-fed to flow
    vocoder_context: int = 12    # mel frames re-vocoded for left-edge warm-up
    fade_samples: int = 1024     # crossfade window at chunk joins (~43 ms @24k)


def lm_stream_start(
    params: Params,
    cfg: SpeechLMConfig,
    text_tokens: jnp.ndarray,
    text_mask: jnp.ndarray,
    prompt_speech: jnp.ndarray,
    prompt_speech_mask: jnp.ndarray,
    *,
    max_new_tokens: int = 512,
) -> Dict[str, Any]:
    """Prefill the speech LM and return a resumable decode state pytree."""
    emb, mask = build_prompt_embeddings(
        params, cfg, text_tokens, text_mask, prompt_speech, prompt_speech_mask
    )
    b, p_len, _ = emb.shape
    cache = q2.init_kv_cache(cfg.backbone, b, p_len + max_new_tokens, emb.dtype)
    hidden, cache = q2.prefill(params["backbone"], cfg.backbone, emb, cache, length_mask=mask)
    last_idx = jnp.sum(mask.astype(jnp.int32), axis=1) - 1
    h_last = jnp.take_along_axis(hidden, last_idx[:, None, None], axis=1)
    return {
        "h": h_last,
        "cache": cache,
        "recent": jnp.full((b, cfg.win_size), -1, jnp.int32),
        "done": jnp.zeros((b,), bool),
        "step": jnp.asarray(0, jnp.int32),
        "last_idx": last_idx,
    }


def lm_stream_chunk(
    params: Params,
    cfg: SpeechLMConfig,
    key,
    state: Dict[str, Any],
    *,
    chunk_tokens: int,
    min_new_tokens: int,
    p_len: int,
) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """Decode ``chunk_tokens`` more speech tokens from a stream state.

    Fixed trip count (``fori_loop``) — rows already at EOS keep emitting EOS,
    so the compiled program is identical for every chunk of the stream.
    Returns (tokens [B, chunk_tokens], new_state).
    """
    b = state["recent"].shape[0]
    tokens0 = jnp.full((b, chunk_tokens), cfg.eos_speech, jnp.int32)
    last_idx = state["last_idx"]

    def body(j, carry):
        h, cache, tokens, recent, key, done, step = carry
        key, sk = jax.random.split(key)
        nxt, recent, done = _sample_next(
            params, cfg, sk, h, recent, done, step, min_new_tokens)
        tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, j))
        x = params["speech_embed"][nxt][:, None, :]
        h, cache = q2.decode_step(
            params["backbone"], cfg.backbone, x, p_len + step, cache,
            rope_pos=last_idx + 1 + step, prompt_len=last_idx + 1,
            prompt_capacity=p_len)
        return h, cache, tokens, recent, key, done, step + 1

    carry = (state["h"], state["cache"], tokens0, state["recent"], key,
             state["done"], state["step"])
    h, cache, tokens, recent, _, done, step = jax.lax.fori_loop(
        0, chunk_tokens, body, carry
    )
    return tokens, {"h": h, "cache": cache, "recent": recent, "done": done,
                    "step": step, "last_idx": last_idx}


def flow_vocode_chunk(
    params: Params,             # ONLY {"flow": …, "vocoder": …} — passing the
                                # full CosyVoice tree would flatten the 0.5B
                                # LM pytree into every chunk dispatch and
                                # retrace on unrelated LM structure changes
    flow_cfg: FlowConfig,
    voc_cfg: VocoderConfig,
    key,
    tokens: jnp.ndarray,        # [1, C] raw LM output (eos-padded)
    n_valid: jnp.ndarray,       # scalar int32 — tokens before eos
    spk: jnp.ndarray,
    ctx_mel: jnp.ndarray,       # [1, F, n_mels] flow left-context buffer
    ctx_mask: jnp.ndarray,      # [1, F]
    ctx_tok: jnp.ndarray,       # [1, F//r] tokens behind the context frames
    ctx_tok_mask: jnp.ndarray,  # [1, F//r]
    voc_hist: jnp.ndarray,      # [1, V, n_mels] vocoder warm-up frames
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One fused tokens→waveform streaming step (single dispatch per chunk:
    through a remote-relay TPU every eager op is an RPC, so the glue —
    masking, padding, concat — must live inside the compiled program)."""
    c = tokens.shape[1]
    # serving-dtype parity with the batch path: the host-side context
    # buffers arrive float32, which would promote the whole per-chunk flow
    # (10 Euler steps × CFG-doubled DiT, every chunk) to f32 under a bf16
    # serving policy — cast conditioning to the params' dtype at entry
    flow_leaves = [l for l in jax.tree_util.tree_leaves(params["flow"])
                   if jnp.issubdtype(l.dtype, jnp.floating)]
    pdtype = flow_leaves[0].dtype if flow_leaves else jnp.float32
    ctx_mel = ctx_mel.astype(pdtype)
    spk = spk.astype(pdtype)
    tok_mask = jnp.arange(c)[None, :] < n_valid
    safe = jnp.where(tok_mask, tokens, 0)
    mel, _ = tokens_to_mel(
        params["flow"], flow_cfg, key, safe, tok_mask, spk, ctx_mel, ctx_mask,
        prompt_tokens=ctx_tok, prompt_token_mask=ctx_tok_mask,
    )
    gen = mel[:, ctx_mel.shape[1]:]                        # [1, r*C, n_mels]
    r = flow_cfg.token_mel_ratio
    gen = gen * (jnp.arange(gen.shape[1])[None, :] < r * n_valid)[..., None]
    voc_in = jnp.concatenate([voc_hist.astype(gen.dtype), gen], axis=1)
    wav = vocode(params["vocoder"], voc_cfg, voc_in)
    return gen, wav


_lm_stream_start_j = jax.jit(lm_stream_start, static_argnames=("cfg", "max_new_tokens"))
_lm_stream_chunk_j = jax.jit(
    lm_stream_chunk, static_argnames=("cfg", "chunk_tokens", "min_new_tokens", "p_len")
)
_flow_vocode_chunk_j = jax.jit(flow_vocode_chunk, static_argnames=("flow_cfg", "voc_cfg"))


def synthesize_streaming(
    params: Params,
    cfg: CosyVoiceConfig,
    key,
    text_tokens: jnp.ndarray,
    text_mask: jnp.ndarray,
    prompt_speech_tokens: jnp.ndarray,
    prompt_speech_mask: jnp.ndarray,
    spk_embedding: jnp.ndarray,
    prompt_mel: jnp.ndarray,
    prompt_mel_mask: jnp.ndarray,
    *,
    stream: StreamConfig = StreamConfig(),
    max_new_tokens: int = 512,
    min_new_tokens: int = 2,
):
    """Incremental zero-shot TTS: yields 24 kHz waveform chunks (np.float32).

    Chunked counterpart of :func:`synthesize` (single stream, B == 1). Per
    chunk: (1) the LM emits ``chunk_tokens`` speech tokens from its resumable
    KV state; (2) flow matching synthesises the chunk's mel conditioned on a
    fixed-size buffer of the previously generated mel (teacher-forced
    continuation — the same mechanism the batch path uses for the voice
    prompt, so joins are smooth); (3) the vocoder re-renders a short mel
    context plus the new frames, and consecutive chunks are crossfaded over
    ``fade_samples`` to hide the convolutional right-edge truncation.

    Everything device-side has static shapes; the Python generator only
    shuttles tiny mel/wave buffers between three cached compiled programs.
    """
    if text_tokens.shape[0] != 1:
        raise ValueError("streaming synthesis is single-stream (batch == 1); "
                         "use synthesize() for batched offline TTS")
    r = cfg.flow.token_mel_ratio
    hop = cfg.vocoder.hop
    c_tok = stream.chunk_tokens
    n_chunks = -(-max_new_tokens // c_tok)
    total_tok = n_chunks * c_tok
    # ONE eager RNG op for the whole stream (per-chunk splits are relay RPCs),
    # then ONE device read stages the key material to host numpy — per-chunk
    # indexing of a device array would be an eager gather RPC per chunk.
    # Typed new-style keys (jax.random.key()) have no buffer protocol, so
    # they stage via key_data and re-wrap per chunk; old-style [2]-uint32
    # rows pass straight into the jitted chunk programs (the transfer rides
    # the dispatch, like the mel/wave buffers already shuttled).
    _ks = jax.random.split(key, 2 * n_chunks)
    if jnp.issubdtype(_ks.dtype, jax.dtypes.prng_key):
        _impl = jax.random.key_impl(key)
        _kd = np.asarray(jax.random.key_data(_ks))
        _kd = _kd.reshape(n_chunks, 2, *_kd.shape[1:])

        def _chunk_key(ci: int, j: int):
            return jax.random.wrap_key_data(_kd[ci, j], impl=_impl)
    else:
        _kd = np.asarray(_ks).reshape(n_chunks, 2, *_ks.shape[1:])

        def _chunk_key(ci: int, j: int):
            return _kd[ci, j]

    lm_state = _lm_stream_start_j(
        params["lm"], cfg.lm, text_tokens, text_mask,
        prompt_speech_tokens, prompt_speech_mask, max_new_tokens=total_tok,
    )
    p_len = 2 + text_tokens.shape[1] + prompt_speech_tokens.shape[1]

    # Flow context buffer: last `flow_context` generated mel frames (init from
    # the real prompt tail, right-aligned, left-padded invalid).
    f_ctx = stream.flow_context
    if f_ctx % r:
        # the token buffer covers f_ctx // r tokens = r·(f_ctx//r) frames; a
        # non-multiple would leave the NEWEST context frames token-less
        # (mel_cond≠0 with token_cond=0 — conditioning training never saw)
        # and phase-shift every other frame's token pairing
        raise ValueError(
            f"StreamConfig.flow_context={f_ctx} must be a multiple of "
            f"token_mel_ratio={r}")
    n_mels = cfg.flow.n_mels
    ctx_mel = np.zeros((1, f_ctx, n_mels), np.float32)
    ctx_mask = np.zeros((1, f_ctx), bool)
    pm = np.asarray(prompt_mel[0], np.float32)
    pm_valid = pm[np.asarray(prompt_mel_mask[0], bool)]
    take = min(len(pm_valid), f_ctx)
    if take:
        ctx_mel[0, f_ctx - take:] = pm_valid[len(pm_valid) - take:]
        ctx_mask[0, f_ctx - take:] = True

    # Tokens behind the context frames (flow conditioning parity with
    # training: exposed mel always pairs with its token encodings). One
    # token covers r frames; right-aligned like ctx_mel. Seed from the
    # prompt's speech-token tail.
    w_tok = max(f_ctx // r, 1)
    ctx_tok = np.zeros((1, w_tok), np.int32)
    ctx_tok_mask = np.zeros((1, w_tok), bool)
    psp_valid = np.asarray(prompt_speech_tokens[0])[
        np.asarray(prompt_speech_mask[0], bool)]
    tk = min(len(psp_valid), w_tok)
    if tk:
        ctx_tok[0, w_tok - tk:] = psp_valid[len(psp_valid) - tk:]
        ctx_tok_mask[0, w_tok - tk:] = True

    # Vocoder state: mel history for left-edge warm-up + crossfade holdback.
    v_ctx = stream.vocoder_context
    voc_hist = np.zeros((v_ctx, n_mels), np.float32)
    held: Optional[np.ndarray] = None

    spk = jnp.asarray(spk_embedding)
    fv_params = {"flow": params["flow"], "vocoder": params["vocoder"]}
    for ci in range(n_chunks):
        tokens, lm_state = _lm_stream_chunk_j(
            params["lm"], cfg.lm, _chunk_key(ci, 0), lm_state,
            chunk_tokens=c_tok, min_new_tokens=min_new_tokens, p_len=p_len,
        )
        tok_np = np.asarray(tokens[0])                     # host sync (needed)
        n_valid = int(np.argmax(tok_np == cfg.lm.eos_speech)) \
            if (tok_np == cfg.lm.eos_speech).any() else c_tok
        # honor the caller's total budget exactly: the last chunk may not be
        # full (synthesize() with the same max_new_tokens emits no more)
        n_valid = min(n_valid, max_new_tokens - ci * c_tok)
        if n_valid <= 0:
            break
        # ONE fused dispatch: masking + flow matching + vocoder
        gen_dev, wav_dev = _flow_vocode_chunk_j(
            fv_params, cfg.flow, cfg.vocoder, _chunk_key(ci, 1), tokens,
            np.int32(n_valid), spk, ctx_mel, ctx_mask,
            ctx_tok, ctx_tok_mask, voc_hist[None],
        )
        gen_valid = np.asarray(gen_dev[0, : r * n_valid], np.float32)
        wav = np.asarray(wav_dev[0], np.float32)

        # roll the flow context buffer (pure numpy — zero device traffic)
        full = np.concatenate([ctx_mel[0][ctx_mask[0]], gen_valid], axis=0)
        ctx_mel[0] = full[-f_ctx:] if len(full) >= f_ctx else np.concatenate(
            [np.zeros((f_ctx - len(full), n_mels), np.float32), full])
        ctx_mask[0] = True if len(full) >= f_ctx else \
            np.arange(f_ctx) >= f_ctx - len(full)
        # roll the context-token buffer in step with the frames
        tok_full = np.concatenate(
            [ctx_tok[0][ctx_tok_mask[0]], tok_np[:n_valid].astype(np.int32)])
        if len(tok_full) >= w_tok:
            ctx_tok[0] = tok_full[-w_tok:]
            ctx_tok_mask[0] = True
        else:
            ctx_tok[0] = np.concatenate(
                [np.zeros(w_tok - len(tok_full), np.int32), tok_full])
            ctx_tok_mask[0] = np.arange(w_tok) >= w_tok - len(tok_full)

        start, end = v_ctx * hop, (v_ctx + len(gen_valid)) * hop
        fade = min(stream.fade_samples, v_ctx * hop, end - start)
        out = wav[start:end]
        if held is not None and fade > 0:
            ramp = np.linspace(0.0, 1.0, len(held), dtype=np.float32)
            out = np.concatenate(
                [held * (1 - ramp) + wav[start - len(held):start] * ramp, out])
        if fade > 0:
            held = out[len(out) - fade:]
            out = out[: len(out) - fade]
        voc_hist = np.concatenate([voc_hist, gen_valid], axis=0)[-v_ctx:]
        if len(out):
            yield out
        if n_valid < c_tok:
            break
    if held is not None and len(held):
        yield held


# --------------------------------------------------------------- parallelism


def speech_lm_partition_rules(tp_axis: str = "tp"):
    """TP rules for the full speech LM: backbone rules plus hidden-sharded
    embedding tables and a vocab-parallel output head (the 6564-way logits +
    softmax shard over ``tp_axis``; XLA inserts the cross-shard reductions)."""
    from jax.sharding import PartitionSpec as P

    from ..parallel.partition import PartitionRules

    return PartitionRules(rules=q2.partition_rules(tp_axis).rules + (
        (r"(text_embed|speech_embed)$", P(None, tp_axis)),
        (r"head/kernel(_q)?$", P(None, tp_axis)),
        (r"head/scale$", P(None, tp_axis)),
        (r"head/bias$", P(tp_axis)),
        # MTP heads are extra [H, V] output heads — vocab-parallel like the
        # main head (paths look like mtp_heads/0/kernel)
        (r"mtp_heads/\d+/kernel(_q)?$", P(None, tp_axis)),
        (r"mtp_heads/\d+/scale$", P(None, tp_axis)),
        (r"mtp_heads/\d+/bias$", P(tp_axis)),
    ))


# ------------------------------------------------------------- quantization


def quantize_speech_lm(params: Params) -> Params:
    """Weight-only int8 for the decode hot path: every backbone matmul kernel
    and the output head(s) become int8 with per-channel scales (common.dense
    dispatches on ``kernel_q``). Embedding tables and norms stay float —
    only gathered rows / tiny vectors stream per step. Autoregressive decode
    is HBM-bandwidth-bound, so halving weight bytes ≈ halves step time."""
    from .common import quantize_dense

    out = dict(params)
    backbone = dict(params["backbone"])
    layers = []
    for layer in backbone["layers"]:
        ql = dict(layer)
        for name in ("q", "k", "v", "o", "gate", "up", "down"):
            ql[name] = quantize_dense(layer[name])
        layers.append(ql)
    backbone["layers"] = layers
    out["backbone"] = backbone
    out["head"] = quantize_dense(params["head"])
    if "mtp_heads" in params:
        out["mtp_heads"] = [quantize_dense(h) for h in params["mtp_heads"]]
    return out


# -------------------------------------------------------------- conversion


def from_cosyvoice_llm_state_dict(state: Dict[str, Any], cfg: SpeechLMConfig) -> Params:
    """Convert an official CosyVoice2 ``llm.pt`` (cosyvoice.llm.llm.Qwen2LM)
    state dict into our SpeechLM tree — the checkpoint the reference's Greek
    SFT trains and its Docker build overwrites (greek_sft.yaml llm:,
    train_greek.sh; Dockerfile.cosyvoice bakes llm/model.pt).

    Key layout (Qwen2LM):
      llm.model.*            HF Qwen2ForCausalLM (backbone + embed_tokens)
      llm_embedding.weight   [2, h] — row 0 = sos_eos, row 1 = task_id
      speech_embedding.weight [speech_token_size + 3, h]
      llm_decoder.weight/bias [speech_token_size + 3, h] output head

    Mapping: the Qwen2 ``embed_tokens`` becomes ``text_embed``; the two
    llm_embedding rows land in our speech table's sos/task control slots
    (SpeechLMConfig.sos_index/task_index); the decoder head transposes into
    ``head`` (eos logit stays at index speech_token_size on both sides).
    """
    from .common import linear_from_torch, t2j

    if cfg.mtp > 1:
        # synthesize() would dispatch to generate_speech_tokens_mtp, whose
        # params["mtp_heads"] this checkpoint does not carry — fail with the
        # config mismatch instead of a KeyError at trace time
        raise ValueError(
            "official llm.pt has no MTP heads; use SpeechLMConfig(mtp=1) "
            f"(got mtp={cfg.mtp})")
    backbone_state = {
        k[len("llm.model."):]: v for k, v in state.items()
        if k.startswith("llm.model.")
    }
    backbone = q2.from_hf_state_dict(backbone_state, cfg.backbone)

    def g(name):
        for prefix in ("model.", ""):
            if prefix + name in backbone_state:
                return backbone_state[prefix + name]
        raise KeyError(name)

    text_embed = t2j(g("embed_tokens.weight"))
    speech_embed = t2j(state["speech_embedding.weight"])
    llm_embedding = t2j(state["llm_embedding.weight"])
    if speech_embed.shape[0] != cfg.speech_token_size + 3:
        raise ValueError(
            f"speech_embedding rows {speech_embed.shape[0]} != "
            f"speech_token_size+3 ({cfg.speech_token_size + 3}) — config mismatch")
    speech_embed = speech_embed.at[cfg.sos_index].set(llm_embedding[0])
    speech_embed = speech_embed.at[cfg.task_index].set(llm_embedding[1])

    return {
        "backbone": backbone,
        "text_embed": text_embed,
        "speech_embed": speech_embed,
        "head": linear_from_torch(state["llm_decoder.weight"],
                                  state.get("llm_decoder.bias")),
    }
