"""NLLB-200 (M2M100 architecture) NMT in JAX.

Replaces the reference's per-request ``AutoModelForSeq2SeqLM.from_pretrained(
"facebook/nllb-200-distilled-600M")`` + ``generate(forced_bos_token_id=...)``
(services/cascaded_backend.py:431-452) with a resident pjit-compiled model.

Architecture parity with HF M2M100: shared scaled embeddings (×√d), M2M100
sinusoidal positions (offset-2 table, padding-aware position ids), pre-LN
blocks, k/q/v/out projections all biased, final encoder/decoder layer norms,
tied lm_head. Verified against a random-weight torch model in
tests/test_nllb.py, including beam search (the SeamlessM4T legacy path uses
``num_beams=5``, translate_speech.py:118; the NLLB path uses greedy).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Tuple

import jax
import jax.nn
import jax.numpy as jnp
import numpy as np

from .beam import BeamConfig, beam_search, greedy_search
from .common import (
    AttnConfig,
    Params,
    attention_kv,
    init_attention,
    init_layer_norm,
    init_mlp,
    layer_norm,
    linear_from_torch,
    mha,
    mha_step,
    tied_head_logits,
    mlp,
    t2j,
)

# M2M100/NLLB uses ReLU activations (M2M100Config.activation_function default)
_mlp = functools.partial(mlp, activation=jax.nn.relu)


@dataclasses.dataclass(frozen=True)
class NLLBConfig:
    d_model: int = 1024
    encoder_layers: int = 12
    decoder_layers: int = 12
    heads: int = 16
    ffn_dim: int = 4096
    vocab_size: int = 256_206
    max_positions: int = 1024
    pad_token: int = 1
    bos_token: int = 0
    eos_token: int = 2
    decoder_start_token: int = 2  # M2M100 starts decoding from </s>

    @property
    def attn(self) -> AttnConfig:
        return AttnConfig(self.d_model, self.heads, k_bias=True)

    @classmethod
    def distilled_600m(cls):
        return cls()


# ------------------------------------------------------- position embeddings


def m2m100_sinusoids(num_positions: int, dim: int, padding_idx: int = 1) -> np.ndarray:
    """M2M100SinusoidalPositionalEmbedding.get_embedding parity:
    table [num_positions + offset(2), dim], half sin / half cos."""
    num_embeddings = num_positions + 2
    half_dim = dim // 2
    emb = np.log(10000.0) / (half_dim - 1)
    emb = np.exp(np.arange(half_dim) * -emb)
    emb = np.arange(num_embeddings)[:, None] * emb[None, :]
    table = np.concatenate([np.sin(emb), np.cos(emb)], axis=1)
    if dim % 2 == 1:
        table = np.concatenate([table, np.zeros((num_embeddings, 1))], axis=1)
    table[padding_idx, :] = 0
    return table.astype(np.float32)


def position_ids_from_tokens(tokens: jnp.ndarray, pad_token: int) -> jnp.ndarray:
    """HF create_position_ids_from_input_ids: cumsum over non-pad + padding_idx."""
    mask = (tokens != pad_token).astype(jnp.int32)
    return jnp.cumsum(mask, axis=1) * mask + pad_token


# ----------------------------------------------------------------------- init


def _init_block(key, cfg: NLLBConfig, *, cross: bool) -> Params:
    from .common import init_pre_ln_block

    return init_pre_ln_block(key, cfg.attn, cfg.d_model, cfg.ffn_dim, cross=cross)


def init_nllb(key, cfg: NLLBConfig) -> Params:
    keys = jax.random.split(key, cfg.encoder_layers + cfg.decoder_layers + 2)
    pos_table = jnp.asarray(m2m100_sinusoids(cfg.max_positions, cfg.d_model, cfg.pad_token))
    return {
        "embed": jax.random.normal(keys[0], (cfg.vocab_size, cfg.d_model)) * 0.02,
        "pos": pos_table,
        "encoder": {
            "layers": [_init_block(keys[1 + i], cfg, cross=False) for i in range(cfg.encoder_layers)],
            "ln": init_layer_norm(cfg.d_model),
        },
        "decoder": {
            "layers": [
                _init_block(keys[1 + cfg.encoder_layers + i], cfg, cross=True)
                for i in range(cfg.decoder_layers)
            ],
            "ln": init_layer_norm(cfg.d_model),
        },
    }


# -------------------------------------------------------------------- encoder


def encode(params: Params, cfg: NLLBConfig, tokens: jnp.ndarray) -> jnp.ndarray:
    """tokens [B, T] (pad = cfg.pad_token) → encoder states [B, T, D]."""
    # same silent-clamp hazard generate() guards on the decoder side: a
    # source longer than the sinusoid table would reuse the last row for the
    # tail instead of erroring like HF
    max_pos_id = tokens.shape[1] + cfg.pad_token
    if max_pos_id >= params["pos"].shape[0]:
        raise ValueError(
            f"source length {tokens.shape[1]} needs position id {max_pos_id} "
            f"but the position table has {params['pos'].shape[0]} rows "
            f"(max_positions={cfg.max_positions})")
    scale = float(np.sqrt(cfg.d_model))
    pos_ids = position_ids_from_tokens(tokens, cfg.pad_token)
    x = params["embed"][tokens] * scale + params["pos"][pos_ids]
    pad_mask = (tokens != cfg.pad_token)[:, None, None, :]  # [B,1,1,T]
    for block in params["encoder"]["layers"]:
        h = layer_norm(block["self_attn_ln"], x)
        x = x + mha(block["self_attn"], cfg.attn, h, h, mask=pad_mask)
        h = layer_norm(block["mlp_ln"], x)
        x = x + _mlp(block["mlp"], h)
    return layer_norm(params["encoder"]["ln"], x)


# -------------------------------------------------------------------- decoder


def precompute_cross_kv(params: Params, cfg: NLLBConfig, enc_out: jnp.ndarray):
    from .common import precompute_layer_cross_kv

    return precompute_layer_cross_kv(params["decoder"]["layers"], cfg.attn, enc_out)


def init_kv_cache(cfg: NLLBConfig, batch: int, max_len: int, dtype=jnp.float32):
    from .common import init_decoder_kv_cache

    return init_decoder_kv_cache(cfg.decoder_layers, batch, max_len, cfg.heads,
                                 cfg.d_model // cfg.heads, dtype)


def decode_step(
    params: Params,
    cfg: NLLBConfig,
    token: jnp.ndarray,          # [B]
    pos: jnp.ndarray,            # scalar — 0-based decode position
    kv_cache,
    cross_kv,
    enc_pad_mask: jnp.ndarray,   # [B, 1, 1, T_enc]
) -> Tuple[jnp.ndarray, Any]:
    scale = float(np.sqrt(cfg.d_model))
    # Generated tokens are never pad, so position id is simply pos+1+padding_idx.
    pos_id = pos + 1 + cfg.pad_token
    x = params["embed"][token][:, None, :] * scale + params["pos"][pos_id][None, None, :]
    new_cache = []
    for block, cache, (ck, cv) in zip(params["decoder"]["layers"], kv_cache, cross_kv):
        h = layer_norm(block["self_attn_ln"], x)
        attn, k, v = mha_step(block["self_attn"], cfg.attn, h, cache["k"], cache["v"], pos)
        x = x + attn
        new_cache.append({"k": k, "v": v})
        h = layer_norm(block["cross_attn_ln"], x)
        x = x + mha(block["cross_attn"], cfg.attn, h, None, precomputed_kv=(ck, cv), mask=enc_pad_mask)
        h = layer_norm(block["mlp_ln"], x)
        x = x + _mlp(block["mlp"], h)
    x = layer_norm(params["decoder"]["ln"], x)
    logits = tied_head_logits(params, x[:, 0, :], params["embed"])
    return logits, new_cache


def decode_full(
    params: Params, cfg: NLLBConfig, tokens: jnp.ndarray, enc_out: jnp.ndarray,
    enc_tokens: jnp.ndarray,
) -> jnp.ndarray:
    """Teacher-forced decoder [B, T] → logits [B, T, vocab]."""
    scale = float(np.sqrt(cfg.d_model))
    t = tokens.shape[1]
    pos_ids = position_ids_from_tokens(tokens, cfg.pad_token)
    x = params["embed"][tokens] * scale + params["pos"][pos_ids]
    # Causal mask combined with the decoder pad *key* mask (HF builds
    # causal+pad jointly; without it non-pad queries attend to pad keys
    # whenever padding is not strictly trailing, e.g. left-padded batches).
    dec_pad = (tokens != cfg.pad_token)[:, None, None, :]
    causal = jnp.asarray(np.tril(np.ones((t, t), bool))[None, None]) & dec_pad
    enc_pad = (enc_tokens != cfg.pad_token)[:, None, None, :]
    for block in params["decoder"]["layers"]:
        h = layer_norm(block["self_attn_ln"], x)
        x = x + mha(block["self_attn"], cfg.attn, h, h, mask=causal)
        h = layer_norm(block["cross_attn_ln"], x)
        x = x + mha(block["cross_attn"], cfg.attn, h, enc_out, mask=enc_pad)
        h = layer_norm(block["mlp_ln"], x)
        x = x + _mlp(block["mlp"], h)
    x = layer_norm(params["decoder"]["ln"], x)
    return tied_head_logits(params, x, params["embed"])


# ----------------------------------------------------------------- generation


def generate(
    params: Params,
    cfg: NLLBConfig,
    src_tokens: jnp.ndarray,
    forced_bos_token: int,
    *,
    num_beams: int = 1,
    max_new_tokens: int = 200,
    min_new_tokens: int = 0,
    length_penalty: float = 1.0,
) -> jnp.ndarray:
    """Translate: returns [B, 1 + max_new_tokens] token ids
    (``</s> <lang> ...`` — HF layout: the forced-BOS language token counts
    as the first generated token, so max_len = 1 + max_new_tokens)."""
    if max_new_tokens < 0:
        raise ValueError(f"max_new_tokens must be >= 0, got {max_new_tokens}")
    if max_new_tokens == 0:
        # HF parity: nothing to generate — return just the decoder start token.
        return jnp.full((src_tokens.shape[0], 1), cfg.decoder_start_token, jnp.int32)
    # HF parity: the forced BOS counts as a *generated* token, so the horizon
    # is decoder_prompt_len (1) + max_new_tokens — not prompt_len + max_new.
    max_len = 1 + max_new_tokens
    # The sinusoid table has max_positions+2 rows; the decode loops stop at
    # pos = max_len-2 (cond: pos < max_len-1) and decode_step reads row
    # pos+1+pad_token, so the largest id read is (max_len-2)+1+pad.  JAX
    # clamps out-of-range gathers, which would silently repeat the last row
    # where HF raises.
    max_pos_id = (max_len - 2) + 1 + cfg.pad_token
    if max_pos_id >= params["pos"].shape[0]:
        raise ValueError(
            f"max_new_tokens={max_new_tokens} needs position id {max_pos_id} "
            f"but the position table has {params['pos'].shape[0]} rows "
            f"(max_positions={cfg.max_positions})"
        )
    enc_out = encode(params, cfg, src_tokens)
    enc_pad_mask = (src_tokens != cfg.pad_token)[:, None, None, :]
    cross_kv = precompute_cross_kv(params, cfg, enc_out)
    prompt = jnp.concatenate(
        [
            jnp.full((src_tokens.shape[0], 1), cfg.decoder_start_token, jnp.int32),
            jnp.full((src_tokens.shape[0], 1), forced_bos_token, jnp.int32),
        ],
        axis=1,
    )

    def step_fn(token, pos, cache, beam_state):
        cross, pad_mask = beam_state
        return decode_step(params, cfg, token, pos, cache, cross, pad_mask)

    # min_new_tokens rides BeamConfig: HF's MinNewTokensLengthLogitsProcessor
    # runs on the log-softmaxed scores in beam search, so banning EOS on raw
    # logits here would renormalize each beam by a different amount and shift
    # cross-beam ranking away from HF (greedy is argmax-invariant either way).
    bc = BeamConfig(
        eos_token=cfg.eos_token,
        pad_token=cfg.pad_token,
        max_len=max_len,
        num_beams=num_beams,
        length_penalty=length_penalty,
        min_new_tokens=min_new_tokens,
    )
    if num_beams <= 1:
        cache = init_kv_cache(cfg, src_tokens.shape[0], max_len, enc_out.dtype)
        return greedy_search(step_fn, prompt, cache, (cross_kv, enc_pad_mask), bc)
    cache = init_kv_cache(cfg, src_tokens.shape[0] * num_beams, max_len, enc_out.dtype)
    return beam_search(step_fn, prompt, cache, (cross_kv, enc_pad_mask), bc)



def quantize_nllb_decoder(params: Params) -> Params:
    """Weight-only int8 for NLLB decode: decoder block kernels + a per-row
    int8 copy of the tied embedding for the 256k-vocab logit matmul (the
    dominant per-token weight stream at 600M scale). Encoder stays bf16."""
    from .common import quantize_embed_head, quantize_transformer_blocks

    out = dict(params)
    dec = dict(params["decoder"])
    dec["layers"] = quantize_transformer_blocks(dec["layers"])
    out["decoder"] = dec
    out["embed_q"] = quantize_embed_head(params["embed"])
    return out

# ----------------------------------------------------------------- conversion


def from_hf_state_dict(state: Dict[str, Any], cfg: NLLBConfig) -> Params:
    """Convert an HF M2M100ForConditionalGeneration state dict."""
    def g(name):
        for prefix in ("model.", ""):
            if prefix + name in state:
                return state[prefix + name]
        raise KeyError(name)

    def attn_params(base: str) -> Params:
        return {
            "q": linear_from_torch(g(f"{base}.q_proj.weight"), g(f"{base}.q_proj.bias")),
            "k": linear_from_torch(g(f"{base}.k_proj.weight"), g(f"{base}.k_proj.bias")),
            "v": linear_from_torch(g(f"{base}.v_proj.weight"), g(f"{base}.v_proj.bias")),
            "o": linear_from_torch(g(f"{base}.out_proj.weight"), g(f"{base}.out_proj.bias")),
        }

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

    return {
        "embed": t2j(g("shared.weight")),
        "pos": jnp.asarray(m2m100_sinusoids(cfg.max_positions, cfg.d_model, cfg.pad_token)),
        "encoder": {
            "layers": [block(f"encoder.layers.{i}", cross=False) for i in range(cfg.encoder_layers)],
            "ln": ln_params("encoder.layer_norm"),
        },
        "decoder": {
            "layers": [block(f"decoder.layers.{i}", cross=True) for i in range(cfg.decoder_layers)],
            "ln": ln_params("decoder.layer_norm"),
        },
    }


def nllb_partition_rules(tp_axis: str = "tp"):
    """TP rules for NLLB/M2M100 — same shared-block Megatron layout
    (models/common.py transformer_partition_rules); sinusoid positions and
    norms replicate. Requires heads % tp == 0."""
    from .common import transformer_partition_rules

    return transformer_partition_rules(tp_axis)
