"""Generic fixed-shape greedy / beam search for encoder-decoder LMs.

Designed for XLA: static shapes throughout, one compiled decode step reused for
prompt teacher-forcing and generation, ``lax.while_loop`` with early exit, KV
caches reordered per step with a flat gather. Matches HF ``generate`` semantics
(decoder-start + forced-BOS prompts, EOS-candidate insertion into a size-K
finished set with length-penalty normalisation at insertion time).

``step_fn(token [N], pos, cache, beam_state) -> (logits [N, V], cache)`` is the
only model-specific piece; ``beam_state`` carries immutable per-call context
(cross-attention K/V, padding masks).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp

StepFn = Callable[..., Tuple[jnp.ndarray, Any]]

NEG_INF = -1.0e9


@dataclasses.dataclass(frozen=True)
class BeamConfig:
    eos_token: int
    pad_token: int
    max_len: int
    num_beams: int = 1
    length_penalty: float = 1.0
    # HF parity: length normalisation uses generated_len = cur_len - decoder_prompt_len.
    # With auto-built decoder inputs (start token only; forced BOS counts as
    # generated) this is 1.
    decoder_prompt_len: int = 1
    # HF MinNewTokensLengthLogitsProcessor parity: EOS is banned while the
    # token being produced (sequence index pos+1) is < decoder_prompt_len +
    # min_new_tokens. The ban lives HERE (post-log_softmax in beam search,
    # where HF's processors run) — banning on raw logits pre-softmax would
    # renormalize each beam by a different amount and shift cross-beam
    # ranking away from HF. Greedy argmax is renormalization-invariant.
    min_new_tokens: int = 0


def greedy_search(step_fn: StepFn, prompt: jnp.ndarray, cache, beam_state, cfg: BeamConfig) -> jnp.ndarray:
    """Greedy decode; returns [B, cfg.max_len], EOS-padded."""
    b, p_len = prompt.shape
    total = cfg.max_len
    tokens0 = jnp.full((b, total), cfg.pad_token, jnp.int32)
    tokens0 = jax.lax.dynamic_update_slice(tokens0, prompt.astype(jnp.int32), (0, 0))

    def cond(state):
        pos, tokens, cache, done = state
        return (pos < total - 1) & ~jnp.all(done)

    def body(state):
        pos, tokens, cache, done = state
        tok = jax.lax.dynamic_slice(tokens, (0, pos), (b, 1))[:, 0]
        logits, cache = step_fn(tok, pos, cache, beam_state)
        if cfg.min_new_tokens:
            logits = jnp.where(
                pos + 1 < cfg.decoder_prompt_len + cfg.min_new_tokens,
                logits.at[:, cfg.eos_token].set(NEG_INF), logits)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        in_prompt = pos + 1 < p_len
        cur = jax.lax.dynamic_slice(tokens, (0, jnp.minimum(pos + 1, total - 1)), (b, 1))[:, 0]
        nxt = jnp.where(in_prompt, cur, jnp.where(done, cfg.pad_token, nxt))
        tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, pos + 1))
        done = done | (~in_prompt & (nxt == cfg.eos_token))
        return pos + 1, tokens, cache, done

    state = (jnp.asarray(0, jnp.int32), tokens0, cache, jnp.zeros((b,), bool))
    _, tokens, _, _ = jax.lax.while_loop(cond, body, state)
    return tokens


def _gather_beams(tree, indices: jnp.ndarray, batch: int, beams: int):
    """Reorder [B*K, ...] cache leaves by per-batch beam indices [B, K]."""
    flat_idx = (jnp.arange(batch)[:, None] * beams + indices).reshape(-1)
    return jax.tree_util.tree_map(lambda x: jnp.take(x, flat_idx, axis=0), tree)


def beam_search(step_fn: StepFn, prompt: jnp.ndarray, cache, beam_state, cfg: BeamConfig) -> jnp.ndarray:
    """HF-compatible beam search (early_stopping=True semantics).

    ``cache`` leaves must be allocated for batch B*K. ``beam_state`` leaves with
    a leading batch dim B are broadcast to B*K automatically.
    Returns the best hypothesis per batch item, [B, cfg.max_len], pad-padded.
    """
    b, p_len = prompt.shape
    k = cfg.num_beams
    total = cfg.max_len

    # Broadcast beam_state's batch-major leaves from B to B*K.
    def tile(x):
        # repeat (NOT jnp.tile): each row's k beams must be contiguous to
        # match the b*k + beam flat indexing in _gather_beams
        if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] == b:
            return jnp.repeat(x, k, axis=0)
        return x

    beam_state = jax.tree_util.tree_map(tile, beam_state)

    tokens0 = jnp.full((b, k, total), cfg.pad_token, jnp.int32)
    tokens0 = tokens0.at[:, :, :p_len].set(prompt[:, None, :].astype(jnp.int32))
    live_scores0 = jnp.tile(jnp.asarray([0.0] + [NEG_INF] * (k - 1)), (b, 1))
    fin_tokens0 = jnp.full((b, k, total), cfg.pad_token, jnp.int32)
    fin_scores0 = jnp.full((b, k), NEG_INF)

    def cond(state):
        pos, tokens, live_scores, fin_tokens, fin_scores, cache = state
        # early_stopping=True: a batch item is done when its K finished slots
        # are all populated.
        batch_done = jnp.all(fin_scores > NEG_INF / 2, axis=1)
        return (pos < total - 1) & ~jnp.all(batch_done)

    def body(state):
        pos, tokens, live_scores, fin_tokens, fin_scores, cache = state
        tok = jax.lax.dynamic_slice(tokens, (0, 0, pos), (b, k, 1)).reshape(b * k)
        logits, cache = step_fn(tok, pos, cache, beam_state)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1).reshape(b, k, -1)
        if cfg.min_new_tokens:
            # post-softmax like HF's processor chain: no renormalization
            logp = jnp.where(
                pos + 1 < cfg.decoder_prompt_len + cfg.min_new_tokens,
                logp.at[:, :, cfg.eos_token].set(NEG_INF), logp)
        vocab = logp.shape[-1]

        in_prompt = pos + 1 < p_len

        # ---- prompt phase: keep forced tokens, caches advance, nothing else.
        def prompt_branch():
            return tokens, live_scores, fin_tokens, fin_scores, cache

        # ---- generation phase
        def gen_branch():
            cand = live_scores[:, :, None] + logp                   # [B,K,V]
            flat = cand.reshape(b, k * vocab)
            top_scores, top_idx = jax.lax.top_k(flat, 2 * k)        # [B,2K]
            parent = top_idx // vocab
            token_id = (top_idx % vocab).astype(jnp.int32)
            is_eos = token_id == cfg.eos_token

            # Candidate sequences [B,2K,total]
            parent_tokens = jnp.take_along_axis(tokens, parent[:, :, None], axis=1)
            cand_tokens = jax.lax.dynamic_update_slice(
                parent_tokens, token_id[:, :, None], (0, 0, pos + 1)
            )

            # --- finished set insertion. HF parity: only EOS candidates ranked
            # within the top num_beams may finish (BeamSearchScorer.process:
            # is_beam_token_worse_than_top_num_beams), and scores normalise by
            # generated_len = cur_len - decoder_prompt_len at insertion time.
            gen_len = (pos + 2 - cfg.decoder_prompt_len).astype(jnp.float32)
            norm = top_scores / gen_len ** cfg.length_penalty
            rank_ok = jnp.arange(2 * k)[None, :] < k
            # HF parity: once a batch item is done (K finished hyps with
            # early_stopping=True), its hypothesis set is frozen — later, better
            # hypotheses are NOT inserted.
            batch_done = jnp.all(fin_scores > NEG_INF / 2, axis=1)[:, None]
            eos_scores = jnp.where(is_eos & rank_ok & ~batch_done, norm, NEG_INF)
            all_fin_scores = jnp.concatenate([fin_scores, eos_scores], axis=1)      # [B,3K]
            all_fin_tokens = jnp.concatenate([fin_tokens, cand_tokens], axis=1)     # [B,3K,total]
            new_fin_scores, fin_sel = jax.lax.top_k(all_fin_scores, k)
            new_fin_tokens = jnp.take_along_axis(all_fin_tokens, fin_sel[:, :, None], axis=1)

            # --- live set: best K non-EOS candidates (ordered by score)
            live_cand = jnp.where(is_eos, NEG_INF, top_scores)
            new_live_scores, live_sel = jax.lax.top_k(live_cand, k)
            new_parent = jnp.take_along_axis(parent, live_sel, axis=1)              # [B,K]
            new_tokens = jnp.take_along_axis(cand_tokens, live_sel[:, :, None], axis=1)

            new_cache = _gather_beams(cache, new_parent, b, k)
            return new_tokens, new_live_scores, new_fin_tokens, new_fin_scores, new_cache

        tokens, live_scores, fin_tokens, fin_scores, cache = jax.lax.cond(
            in_prompt, prompt_branch, gen_branch
        )
        return pos + 1, tokens, live_scores, fin_tokens, fin_scores, cache

    state = (jnp.asarray(0, jnp.int64 if jax.config.jax_enable_x64 else jnp.int32), tokens0, live_scores0, fin_tokens0, fin_scores0, cache)
    pos, tokens, live_scores, fin_tokens, fin_scores, _ = jax.lax.while_loop(cond, body, state)

    # HF finalize parity: for batch items that did NOT finish early, the live
    # beams (normalised at final length) compete with the finished set; for
    # done batch items only the finished set counts.
    batch_done = jnp.all(fin_scores > NEG_INF / 2, axis=1)
    final_gen_len = jnp.maximum(pos + 1 - cfg.decoder_prompt_len, 1).astype(jnp.float32)
    live_norm = live_scores / final_gen_len ** cfg.length_penalty
    live_norm = jnp.where(batch_done[:, None], NEG_INF, live_norm)
    all_scores = jnp.concatenate([fin_scores, live_norm], axis=1)      # [B,2K]
    all_tokens = jnp.concatenate([fin_tokens, tokens], axis=1)         # [B,2K,total]
    best = jnp.argmax(all_scores, axis=1)
    return jnp.take_along_axis(all_tokens, best[:, None, None], axis=1)[:, 0]
