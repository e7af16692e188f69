"""Whisper-family ASR in JAX: encoder + KV-cached autoregressive decoder.

Replaces the reference's ``whisper.load_model("medium")`` + ``transcribe``
(services/cascaded_backend.py:418, :158) with a resident jit-compiled model:
the reference loads/releases the torch model per request (cascaded_backend.py:
415-429, an explicit memory-vs-latency trade); on TPU the compiled graphs stay
resident and the mel frontend is the fused Pallas kernel (ops/pallas_mel.py).

Architecture parity: HF ``WhisperForConditionalGeneration`` — conv1d×2 frontend
(stride 2), fixed sinusoidal encoder positions, pre-LN transformer blocks,
learned decoder positions, cross-attention with precomputed encoder K/V, tied
embedding/output projection, k-projection without bias. Verified against a
random-weight torch model in tests/test_whisper.py.

Decoding: a single ``lax.while_loop`` whose body is one fused decode step
(prompt tokens teacher-forced through the same step — one compiled program),
early exit at EOT, budget-sized KV caches, traced temperature (greedy /
Gumbel sampling share the program), token suppression, no-speech probability,
and per-sequence log-probs — the full whisper.transcribe decode feature set
the reference inherits (cascaded_backend.py:158); pipeline/jax_engines wires
the fallback ladder, silence gate, and cross-chunk conditioning on top, and
word timestamps come from the cross-attention DTW (dtw_token_times).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .common import (
    AttnConfig,
    Params,
    attention_kv,
    gelu,
    init_attention,
    init_layer_norm,
    init_mlp,
    layer_norm,
    mha,
    mha_step,
    mlp,
    sinusoid_position_embedding,
    t2j,
    tied_head_logits,
    linear_from_torch,
)


@dataclasses.dataclass(frozen=True)
class WhisperConfig:
    n_mels: int = 80
    d_model: int = 384
    encoder_layers: int = 4
    decoder_layers: int = 4
    heads: int = 6
    ffn_dim: int = 1536
    vocab_size: int = 51865
    max_source_positions: int = 1500
    max_target_positions: int = 448
    # special tokens (multilingual layout; tiny/base/small/medium share these)
    bos_token: int = 50258           # <|startoftranscript|>
    eos_token: int = 50257           # <|endoftext|>
    task_transcribe: int = 50359
    task_translate: int = 50358
    no_timestamps: int = 50363
    no_speech_token: int = 50362     # <|nospeech|>
    sop_token: int = 50361           # <|startofprev|> (previous-text context)
    lang_token_start: int = 50259    # <|en|>; 99 consecutive language tokens
    n_langs: int = 99

    @property
    def attn(self) -> AttnConfig:
        return AttnConfig(self.d_model, self.heads, k_bias=False)

    @classmethod
    def tiny(cls):
        return cls(d_model=384, encoder_layers=4, decoder_layers=4, heads=6, ffn_dim=1536)

    @classmethod
    def base(cls):
        return cls(d_model=512, encoder_layers=6, decoder_layers=6, heads=8, ffn_dim=2048)

    @classmethod
    def small(cls):
        return cls(d_model=768, encoder_layers=12, decoder_layers=12, heads=12, ffn_dim=3072)

    @classmethod
    def medium(cls):
        return cls(d_model=1024, encoder_layers=24, decoder_layers=24, heads=16, ffn_dim=4096)


# --------------------------------------------------------------------- init


def _init_block(key, cfg: WhisperConfig, *, cross: bool) -> Params:
    from .common import init_pre_ln_block

    return init_pre_ln_block(key, cfg.attn, cfg.d_model, cfg.ffn_dim, cross=cross)


def init_whisper(key, cfg: WhisperConfig) -> Params:
    keys = jax.random.split(key, cfg.encoder_layers + cfg.decoder_layers + 4)
    conv_scale1 = 1.0 / np.sqrt(cfg.n_mels * 3)
    conv_scale2 = 1.0 / np.sqrt(cfg.d_model * 3)
    params: Params = {
        "encoder": {
            # conv kernels [width, in, out]
            "conv1": {
                "kernel": jax.random.uniform(keys[0], (3, cfg.n_mels, cfg.d_model), jnp.float32, -conv_scale1, conv_scale1),
                "bias": jnp.zeros((cfg.d_model,)),
            },
            "conv2": {
                "kernel": jax.random.uniform(keys[1], (3, cfg.d_model, cfg.d_model), jnp.float32, -conv_scale2, conv_scale2),
                "bias": jnp.zeros((cfg.d_model,)),
            },
            "pos": jnp.asarray(sinusoid_position_embedding(cfg.max_source_positions, cfg.d_model)),
            "layers": [
                _init_block(keys[2 + i], cfg, cross=False) for i in range(cfg.encoder_layers)
            ],
            "ln_post": init_layer_norm(cfg.d_model),
        },
        "decoder": {
            "embed": jax.random.normal(keys[-2], (cfg.vocab_size, cfg.d_model)) * 0.02,
            "pos": jax.random.normal(keys[-1], (cfg.max_target_positions, cfg.d_model)) * 0.02,
            "layers": [
                _init_block(keys[2 + cfg.encoder_layers + i], cfg, cross=True)
                for i in range(cfg.decoder_layers)
            ],
            "ln": init_layer_norm(cfg.d_model),
        },
    }
    return params


# ------------------------------------------------------------------- encoder


def encode(params: Params, cfg: WhisperConfig, mel: jnp.ndarray) -> jnp.ndarray:
    """mel [B, n_mels, 3000] → encoder states [B, 1500, D]."""
    x = jnp.swapaxes(mel, -1, -2)  # [B, T, n_mels]
    enc = params["encoder"]
    x = gelu(
        jax.lax.conv_general_dilated(
            x, enc["conv1"]["kernel"], (1,), [(1, 1)],
            dimension_numbers=("NHC", "HIO", "NHC"),
        )
        + enc["conv1"]["bias"]
    )
    x = gelu(
        jax.lax.conv_general_dilated(
            x, enc["conv2"]["kernel"], (2,), [(1, 1)],
            dimension_numbers=("NHC", "HIO", "NHC"),
        )
        + enc["conv2"]["bias"]
    )
    x = x + enc["pos"][: x.shape[1]]
    for block in enc["layers"]:
        h = layer_norm(block["self_attn_ln"], x)
        x = x + mha(block["self_attn"], cfg.attn, h, h)
        h = layer_norm(block["mlp_ln"], x)
        x = x + mlp(block["mlp"], h)
    return layer_norm(enc["ln_post"], x)


# ------------------------------------------------------------------- decoder


def precompute_cross_kv(params: Params, cfg: WhisperConfig, enc_out: jnp.ndarray):
    from .common import precompute_layer_cross_kv

    return precompute_layer_cross_kv(params["decoder"]["layers"], cfg.attn, enc_out)


def init_kv_cache(cfg: WhisperConfig, batch: int, dtype=jnp.float32,
                  max_len: int | None = None):
    """Cache sized to the decode budget (prompt + max_new), not the model's
    448-position ceiling: every step reads the whole (masked) cache, so a 68-
    row cache cuts that read 6.6x for typical serving budgets."""
    from .common import init_decoder_kv_cache

    return init_decoder_kv_cache(cfg.decoder_layers, batch,
                                 max_len or cfg.max_target_positions,
                                 cfg.heads, cfg.d_model // cfg.heads, dtype)


def _decode_step_impl(
    params: Params,
    cfg: WhisperConfig,
    token: jnp.ndarray,        # [B] int32
    pos: jnp.ndarray,          # scalar int32
    kv_cache,
    cross_kv,
    *,
    with_attn: bool,
):
    """THE decoder step (single implementation — the plain and alignment
    variants used to be forked copies and drifted). ``with_attn`` is a
    Python-static flag: False uses the packed cross-attention; True inlines
    it so the weights are observable, at identical math. Each value compiles
    its own program, so the plain path pays nothing for the flag."""
    from .common import _merge_heads, _split_heads, dense as _dense

    dec = params["decoder"]
    x = dec["embed"][token][:, None, :] + jax.lax.dynamic_slice_in_dim(dec["pos"], pos, 1, 0)[None]
    new_cache = []
    attn_maps = []
    for block, cache, (ck, cv) in zip(dec["layers"], kv_cache, cross_kv):
        h = layer_norm(block["self_attn_ln"], x)
        attn, k, v = mha_step(block["self_attn"], cfg.attn, h, cache["k"], cache["v"], pos)
        x = x + attn
        new_cache.append({"k": k, "v": v})
        h = layer_norm(block["cross_attn_ln"], x)
        if with_attn:
            # inline cross-attention so the weights are observable
            q = _split_heads(_dense(block["cross_attn"]["q"], h), cfg.heads) * (cfg.attn.head_dim ** -0.5)
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, ck)
            weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            attn_maps.append(jnp.mean(weights[:, :, 0, :], axis=1))  # [B, T_enc]
            out = jnp.einsum("bhqk,bkhd->bqhd", weights.astype(h.dtype), cv)
            x = x + _dense(block["cross_attn"]["o"], _merge_heads(out))
        else:
            x = x + mha(block["cross_attn"], cfg.attn, h, None, precomputed_kv=(ck, cv))
        h = layer_norm(block["mlp_ln"], x)
        x = x + mlp(block["mlp"], h)
    x = layer_norm(dec["ln"], x)
    logits = tied_head_logits(dec, x[:, 0, :], dec["embed"])
    if not with_attn:
        return logits, new_cache
    # upper-half layers carry the cleanest alignment (whisper convention)
    half = len(attn_maps) // 2
    alignment = jnp.mean(jnp.stack(attn_maps[half:]), axis=0)
    return logits, new_cache, alignment


def decode_step(
    params: Params,
    cfg: WhisperConfig,
    token: jnp.ndarray,        # [B] int32
    pos: jnp.ndarray,          # scalar int32
    kv_cache,
    cross_kv,
) -> Tuple[jnp.ndarray, Any]:
    """One decoder step → (logits [B, vocab], new kv_cache)."""
    return _decode_step_impl(params, cfg, token, pos, kv_cache, cross_kv,
                             with_attn=False)


def decode_step_with_attn(
    params: Params,
    cfg: WhisperConfig,
    token: jnp.ndarray,
    pos: jnp.ndarray,
    kv_cache,
    cross_kv,
) -> Tuple[jnp.ndarray, Any, jnp.ndarray]:
    """decode_step that also returns layer-mean cross-attention weights
    [B, T_enc] — the alignment signal for word timestamps (openai-whisper
    computes these via DTW over cross-attention; cascaded_backend.py:146-191
    consumes the resulting word times for pause analysis)."""
    return _decode_step_impl(params, cfg, token, pos, kv_cache, cross_kv,
                             with_attn=True)


def decode_with_alignment(
    params: Params,
    cfg: WhisperConfig,
    mel: jnp.ndarray,
    prompt: jnp.ndarray,
    *,
    max_new_tokens: int = 224,
    min_new_tokens: int = 0,
    temperature: Optional[jnp.ndarray] = None,
    key: Optional[jnp.ndarray] = None,
    suppress_tokens: Tuple[int, ...] = (),
    suppress_first_tokens: Tuple[int, ...] = (),
    sot_index=0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Decode with per-token cross-attention alignments and log-probs.

    ``temperature`` is a TRACED scalar (0.0 = greedy; > 0 samples via the
    Gumbel trick), so one compiled program serves every rung of whisper's
    temperature-fallback ladder (openai-whisper transcribe retries at
    (0, .2, .4, .6, .8, 1) when compression-ratio/logprob gates fail —
    the decoding behavior the reference gets from whisper.transcribe,
    cascaded_backend.py:158).

    Returns (tokens [B, P+max_new], alignments [B, P+max_new, T_enc],
    sum_logprob [B] over generated tokens incl. EOS, n_generated [B],
    no_speech_prob [B] — P(<|nospeech|>) at the <|startoftranscript|> step,
    whisper's silence signal).

    ``suppress_tokens``: ids never emitted (whisper's SuppressTokens filter —
    the non-speech symbol list in real deployments); ``suppress_first_tokens``:
    ids additionally suppressed on the FIRST generated token (whisper's
    SuppressBlank: space + EOT). Both are static tuples baked into the
    compiled program as constant masks.

    ``sot_index``: position of <|startoftranscript|> in the prompt (traced
    scalar or int). With condition_on_previous_text the prompt is
    [<|startofprev|>] + prev + [sot, lang, task, notimestamps], so the
    no-speech probability must be read at the SOT step, not position 0
    (openai-whisper reads it at tokenizer.sot index). It is computed from the
    PRE-suppression logits so a standard whisper suppress list (which contains
    the no-speech id) cannot zero the signal.
    """
    b, p_len = prompt.shape
    if p_len + max_new_tokens > cfg.max_target_positions:
        # past the ceiling the position-embedding dynamic_slice would clamp
        # and silently reuse the last row (frozen position signal) — refuse,
        # the way openai-whisper refuses overlong sequences
        raise ValueError(
            f"prompt ({p_len}) + max_new_tokens ({max_new_tokens}) exceeds "
            f"max_target_positions ({cfg.max_target_positions})")
    enc_out = encode(params, cfg, mel)
    cross_kv = precompute_cross_kv(params, cfg, enc_out)
    t_enc = enc_out.shape[1]
    temp = jnp.asarray(0.0 if temperature is None else temperature, jnp.float32)
    if key is None:
        if isinstance(temperature, (int, float)) and (temperature or 0) > 0:
            # a silent fixed-key fallback would make every fallback-ladder
            # rung redraw the SAME Gumbel noise — "sampling" that
            # deterministically repeats the rejected transcript
            raise ValueError(
                "temperature > 0 sampling needs an explicit PRNG key "
                "(fold a request counter into a base key per call)")
        key = jax.random.PRNGKey(0)  # greedy path: the key is never consumed

    total = p_len + max_new_tokens
    kv_cache = init_kv_cache(cfg, b, dtype=enc_out.dtype, max_len=total)
    tokens0 = jnp.full((b, total), cfg.eos_token, jnp.int32)
    tokens0 = jax.lax.dynamic_update_slice(tokens0, prompt.astype(jnp.int32), (0, 0))
    align0 = jnp.zeros((b, total, t_enc), jnp.float32)

    def cond(state):
        pos, tokens, aligns, cache, done, slp, ngen, nsp, key = state
        # runs through pos == total-1: that last iteration writes the FINAL
        # generated token's alignment row (budget-exhausted chunks would
        # otherwise leave it all-zero and its word timestamp DTW-artifactual)
        return (pos < total) & ~jnp.all(done)

    def body(state):
        pos, tokens, aligns, cache, done, slp, ngen, nsp, key = state
        tok = jax.lax.dynamic_slice(tokens, (0, pos), (b, 1))[:, 0]
        logits, cache, alignment = decode_step_with_attn(params, cfg, tok, pos, cache, cross_kv)
        aligns = jax.lax.dynamic_update_slice(aligns, alignment[:, None, :], (0, pos, 0))
        logits32 = logits.astype(jnp.float32)
        # no-speech signal: pre-suppression softmax at the SOT step ONLY
        # (lax.cond skips the full-vocab softmax on every other step)
        nsp_tok = min(cfg.no_speech_token, cfg.vocab_size - 1)
        nsp = jax.lax.cond(
            pos == jnp.asarray(sot_index, jnp.int32),
            lambda l: jax.nn.softmax(l, axis=-1)[:, nsp_tok],
            lambda l: nsp,
            logits32)
        key, sub = jax.random.split(key)   # unconditional: one key stream
        in_prompt = pos + 1 < p_len

        def _generate(args):
            """Suppression + sampling + stepwise logprob — generation steps
            only; prompt teacher-forcing steps discard all of it, so lax.cond
            skips ~p_len full-vocab softmaxes per chunk on the hot path."""
            logits32, sub = args
            neg = jnp.float32(-1e9)
            if min_new_tokens:
                # clamp like every other special-id use here: an out-of-range
                # scatter index is silently DROPPED by JAX, which would turn
                # min_new_tokens into a no-op on tiny-vocab configs
                eos_idx = min(cfg.eos_token, cfg.vocab_size - 1)
                logits32 = jnp.where(
                    pos + 1 < p_len + min_new_tokens,
                    logits32.at[:, eos_idx].set(neg),
                    logits32,
                )
            if suppress_tokens:
                # drop out-of-range ids (a standard whisper suppress list
                # against a smaller vocab) — the old modulo wrap remapped
                # them onto unrelated legitimate tokens
                mask = np.zeros((cfg.vocab_size,), bool)
                keep_ids = [i for i in suppress_tokens if 0 <= i < cfg.vocab_size]
                if keep_ids:
                    mask[np.asarray(keep_ids)] = True
                logits32 = jnp.where(jnp.asarray(mask), neg, logits32)
            if suppress_first_tokens:
                fmask = np.zeros((cfg.vocab_size,), bool)
                keep_ids = [i for i in suppress_first_tokens if 0 <= i < cfg.vocab_size]
                if keep_ids:
                    fmask[np.asarray(keep_ids)] = True
                first = pos + 1 == p_len
                logits32 = jnp.where(first & jnp.asarray(fmask), neg, logits32)

            def _sample(a):
                l, k = a
                gumbel = -jnp.log(-jnp.log(
                    jax.random.uniform(k, l.shape, minval=1e-9, maxval=1.0)))
                return jnp.argmax(l / jnp.maximum(temp, 1e-6) + gumbel,
                                  axis=-1).astype(jnp.int32)

            # greedy steps skip the [B, vocab] Gumbel generation entirely
            nxt = jax.lax.cond(
                temp > 0.0, _sample,
                lambda a: jnp.argmax(a[0], axis=-1).astype(jnp.int32),
                (logits32, sub))
            logprobs = jax.nn.log_softmax(logits32, axis=-1)
            step_lp = jnp.take_along_axis(logprobs, nxt[:, None], axis=-1)[:, 0]
            return nxt, step_lp

        nxt, step_lp = jax.lax.cond(
            in_prompt,
            lambda a: (jnp.zeros((b,), jnp.int32), jnp.zeros((b,), jnp.float32)),
            _generate,
            (logits32, sub))
        past_end = pos + 1 >= total   # final iteration: alignment-only
        cur = jax.lax.dynamic_slice(tokens, (0, jnp.minimum(pos + 1, total - 1)), (b, 1))[:, 0]
        nxt = jnp.where(in_prompt | past_end, cur, jnp.where(done, cfg.eos_token, nxt))
        counts = (~in_prompt) & ~done & ~past_end
        slp = slp + jnp.where(counts, step_lp, 0.0)
        ngen = ngen + counts.astype(jnp.int32)
        tokens = jax.lax.dynamic_update_slice(
            tokens, nxt[:, None], (0, jnp.minimum(pos + 1, total - 1)))
        done = done | (~in_prompt & (nxt == cfg.eos_token)) | past_end
        return pos + 1, tokens, aligns, cache, done, slp, ngen, nsp, key

    state = (jnp.asarray(0, jnp.int32), tokens0, align0, kv_cache,
             jnp.zeros((b,), bool), jnp.zeros((b,), jnp.float32),
             jnp.zeros((b,), jnp.int32), jnp.zeros((b,), jnp.float32), key)
    _, tokens, aligns, _, _, slp, ngen, nsp, _ = jax.lax.while_loop(cond, body, state)
    return tokens, aligns, slp, ngen, nsp


def greedy_decode_with_alignment(
    params: Params,
    cfg: WhisperConfig,
    mel: jnp.ndarray,
    prompt: jnp.ndarray,
    *,
    max_new_tokens: int = 224,
    min_new_tokens: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy decode returning (tokens, alignments) — thin wrapper over
    :func:`decode_with_alignment` at temperature 0."""
    tokens, aligns, _, _, _ = decode_with_alignment(
        params, cfg, mel, prompt,
        max_new_tokens=max_new_tokens, min_new_tokens=min_new_tokens)
    return tokens, aligns


def dtw_token_times(
    alignment: np.ndarray, n_tokens: int, audio_seconds: float,
) -> np.ndarray:
    """Monotonic DTW over -log(attention) → per-token times in seconds
    (openai-whisper find_alignment parity; host-side numpy).

    alignment: [T_tokens, T_enc] attention rows for the generated tokens.
    Returns [n_tokens] start times.
    """
    a = np.asarray(alignment[:n_tokens], np.float64)
    if a.size == 0:
        return np.zeros(0)
    # column-normalise then cost = -log
    a = a / np.maximum(a.sum(axis=-1, keepdims=True), 1e-9)
    cost = -np.log(np.maximum(a, 1e-9))
    n, m = cost.shape
    acc = np.full((n + 1, m + 1), np.inf)
    acc[0, 0] = 0.0
    for i in range(1, n + 1):
        # openai-whisper dtw moves: diagonal (i-1,j-1), vertical (i-1,j)
        # (several tokens on ONE frame), horizontal (i,j-1) (one token spans
        # frames): acc[i][j] = c[j] + min(p[j-1], p[j], f[j-1]). The row
        # recurrence expands to f[j] = S[j] + min_{k<=j}(q[k] - S[k-1]) with
        # q[k] = min(p[k-1], p[k]) and S = cumsum(c), so the whole row is one
        # cumsum + one running min (O(m) vector ops instead of a 224x3000
        # Python loop on the serving word-timestamp path).
        c = cost[i - 1]
        prev = acc[i - 1]
        s = np.concatenate(([0.0], np.cumsum(c)))          # S[0..m]
        q = np.minimum(prev[:m], prev[1:])                 # min(p[k-1], p[k])
        run = np.minimum.accumulate(q - s[:m])             # min_k (q[k]-S[k-1])
        acc[i, 0] = np.inf
        acc[i, 1:] = s[1:] + run
    # backtrack from the full-path corner (every frame consumed): first frame
    # where each token becomes active. Three-move backtrace (openai
    # timing.backtrace order: diagonal wins ties, then vertical).
    j = m
    i = n
    first_frame = np.full(n, j - 1)
    while i > 0 and j > 0:
        first_frame[i - 1] = j - 1
        move = int(np.argmin([acc[i - 1, j - 1], acc[i - 1, j], acc[i, j - 1]]))
        if move == 0:
            i -= 1
            j -= 1
        elif move == 1:
            i -= 1
        else:
            j -= 1
    frames_per_second = (m / 30.0) if audio_seconds <= 0 else m / max(audio_seconds, 1e-6)
    return first_frame / frames_per_second


def decode_full(
    params: Params, cfg: WhisperConfig, tokens: jnp.ndarray, enc_out: jnp.ndarray
) -> jnp.ndarray:
    """Teacher-forced full-sequence decoder (training / parity tests).
    tokens [B, T] → logits [B, T, vocab]."""
    dec = params["decoder"]
    t = tokens.shape[1]
    x = dec["embed"][tokens] + dec["pos"][:t]
    causal = np.tril(np.ones((t, t), bool))[None, None]
    for block in dec["layers"]:
        h = layer_norm(block["self_attn_ln"], x)
        x = x + mha(block["self_attn"], cfg.attn, h, h, mask=jnp.asarray(causal))
        h = layer_norm(block["cross_attn_ln"], x)
        x = x + mha(block["cross_attn"], cfg.attn, h, enc_out)
        h = layer_norm(block["mlp_ln"], x)
        x = x + mlp(block["mlp"], h)
    x = layer_norm(dec["ln"], x)
    return tied_head_logits(dec, x, dec["embed"])


# ------------------------------------------------------------------ generation



def quantize_whisper_decoder(params: Params) -> Params:
    """Weight-only int8 for the decode hot path: decoder block kernels +
    the tied output head (per-row int8 copy of ``decoder/embed`` — at
    whisper-medium the 51865x1024 logit matmul is the largest per-token
    weight stream). The encoder stays bf16 (one batched pass, MXU-bound)."""
    from .common import quantize_embed_head, quantize_transformer_blocks

    out = dict(params)
    dec = dict(params["decoder"])
    dec["layers"] = quantize_transformer_blocks(dec["layers"])
    dec["embed_q"] = quantize_embed_head(dec["embed"])
    out["decoder"] = dec
    return out

def detect_language(
    params: Params, cfg: WhisperConfig, mel: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Whisper language identification (openai-whisper ``detect_language``
    parity, used when the caller passes no source language —
    services/cascaded_backend.py:188 reads the detected language back).

    One decoder step from ``<|startoftranscript|>`` with logits restricted to
    the 99 consecutive language tokens. mel [B, n_mels, 3000] →
    (lang token ids [B], probabilities [B, n_langs])."""
    enc_out = encode(params, cfg, mel)
    sot = jnp.full((mel.shape[0], 1), cfg.bos_token, jnp.int32)
    logits = decode_full(params, cfg, sot, enc_out)[:, 0, :]
    # clamp for tiny test vocabs where the multilingual token block is absent
    start = min(cfg.lang_token_start, max(cfg.vocab_size - 1, 0))
    width = max(1, min(cfg.n_langs, cfg.vocab_size - start))
    lang_logits = jax.lax.dynamic_slice_in_dim(logits, start, width, axis=1)
    probs = jax.nn.softmax(lang_logits.astype(jnp.float32), axis=-1)
    return start + jnp.argmax(lang_logits, axis=-1), probs


def greedy_decode(
    params: Params,
    cfg: WhisperConfig,
    mel: jnp.ndarray,
    prompt: jnp.ndarray,
    *,
    max_new_tokens: int = 224,
    min_new_tokens: int = 0,
) -> jnp.ndarray:
    """Greedy generation. ``prompt`` [B, P] (e.g. <sot> <lang> <task> <notimestamps>).

    Returns tokens [B, P + max_new_tokens] padded with EOT after stop. The
    prompt is teacher-forced through the same compiled decode step, so there is
    exactly one program for the whole autoregressive loop.
    """
    b, p_len = prompt.shape
    if p_len + max_new_tokens > cfg.max_target_positions:
        # same position-embedding ceiling as decode_with_alignment: past it
        # the dynamic_slice clamps and silently reuses the last position row
        raise ValueError(
            f"prompt ({p_len}) + max_new_tokens ({max_new_tokens}) exceeds "
            f"max_target_positions ({cfg.max_target_positions})")
    enc_out = encode(params, cfg, mel)
    cross_kv = precompute_cross_kv(params, cfg, enc_out)

    total = p_len + max_new_tokens
    kv_cache = init_kv_cache(cfg, b, dtype=enc_out.dtype, max_len=total)

    # Drive beam.greedy_search instead of a forked loop copy — the plain and
    # alignment decode steps drifted once before (_decode_step_impl history);
    # the search loop must not repeat that. decoder_prompt_len=p_len gives
    # the whisper min_new_tokens convention (count from the prompt's end);
    # pad_token=eos reproduces the EOS-padded output contract. An eos_token
    # outside a tiny test vocab makes the ban a silent no-op (out-of-range
    # scatter), which is also what the forked copy's clamp amounted to.
    from .beam import BeamConfig, greedy_search

    def step_fn(token, pos, cache, beam_state):
        return decode_step(params, cfg, token, pos, cache, beam_state)

    bc = BeamConfig(eos_token=cfg.eos_token, pad_token=cfg.eos_token,
                    max_len=total, decoder_prompt_len=p_len,
                    min_new_tokens=min_new_tokens)
    return greedy_search(step_fn, prompt, kv_cache, cross_kv, bc)


# ------------------------------------------------------------------ conversion


def from_hf_state_dict(state: Dict[str, Any], cfg: WhisperConfig) -> Params:
    """Convert an HF WhisperForConditionalGeneration/WhisperModel state dict.

    Accepts either naming root (``model.encoder...`` or ``encoder...``).
    """
    def g(name):
        for prefix in ("model.", ""):
            key = prefix + name
            if key in state:
                return state[key]
        raise KeyError(name)

    def attn_params(base: str) -> Params:
        p = {
            "q": linear_from_torch(g(f"{base}.q_proj.weight"), g(f"{base}.q_proj.bias")),
            "k": linear_from_torch(g(f"{base}.k_proj.weight")),
            "v": linear_from_torch(g(f"{base}.v_proj.weight"), g(f"{base}.v_proj.bias")),
            "o": linear_from_torch(g(f"{base}.out_proj.weight"), g(f"{base}.out_proj.bias")),
        }
        return p

    def ln_params(base: str) -> Params:
        return {"scale": t2j(g(f"{base}.weight")), "bias": t2j(g(f"{base}.bias"))}

    def block(base: str, *, cross: bool) -> Params:
        p = {
            "self_attn": attn_params(f"{base}.self_attn"),
            "self_attn_ln": ln_params(f"{base}.self_attn_layer_norm"),
            "mlp": {
                "fc1": linear_from_torch(g(f"{base}.fc1.weight"), g(f"{base}.fc1.bias")),
                "fc2": linear_from_torch(g(f"{base}.fc2.weight"), g(f"{base}.fc2.bias")),
            },
            "mlp_ln": ln_params(f"{base}.final_layer_norm"),
        }
        if cross:
            p["cross_attn"] = attn_params(f"{base}.encoder_attn")
            p["cross_attn_ln"] = ln_params(f"{base}.encoder_attn_layer_norm")
        return p

    params: Params = {
        "encoder": {
            # torch conv1d weight [out, in, width] → [width, in, out]
            "conv1": {
                "kernel": jnp.transpose(t2j(g("encoder.conv1.weight")), (2, 1, 0)),
                "bias": t2j(g("encoder.conv1.bias")),
            },
            "conv2": {
                "kernel": jnp.transpose(t2j(g("encoder.conv2.weight")), (2, 1, 0)),
                "bias": t2j(g("encoder.conv2.bias")),
            },
            "pos": t2j(g("encoder.embed_positions.weight")),
            "layers": [
                block(f"encoder.layers.{i}", cross=False) for i in range(cfg.encoder_layers)
            ],
            "ln_post": ln_params("encoder.layer_norm"),
        },
        "decoder": {
            "embed": t2j(g("decoder.embed_tokens.weight")),
            "pos": t2j(g("decoder.embed_positions.weight")),
            "layers": [
                block(f"decoder.layers.{i}", cross=True) for i in range(cfg.decoder_layers)
            ],
            "ln": ln_params("decoder.layer_norm"),
        },
    }
    return params


def whisper_partition_rules(tp_axis: str = "tp"):
    """TP rules for whisper (SURVEY.md §2.19 'design pjit sharding rules
    anyway'): the shared-block Megatron layout (models/common.py
    transformer_partition_rules); conv stem, positions, and norms replicate.
    Requires heads % tp == 0."""
    from .common import transformer_partition_rules

    return transformer_partition_rules(tp_axis)
