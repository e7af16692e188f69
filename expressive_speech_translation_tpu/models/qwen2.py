"""Qwen2-style decoder-only transformer backbone (RoPE, GQA, RMSNorm, SwiGLU).

This is the LM inside CosyVoice2's speech-token generator (greek_sft.yaml:24-31:
``llm_input_size/llm_output_size=896`` — Qwen2-0.5B dimensions). Implemented as
a reusable backbone: the CosyVoice speech LM (models/cosyvoice.py) feeds it
mixed text/speech embeddings; parity is verified against a random-weight torch
``Qwen2Model`` in tests/test_qwen2.py.

TPU notes: KV caches are preallocated and written with dynamic_update_slice;
GQA K/V heads are repeated at compute time (cheap on MXU vs doubling cache HBM);
RoPE tables are baked constants.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .common import Params, dense, init_dense, linear_from_torch, t2j


@dataclasses.dataclass(frozen=True)
class Qwen2Config:
    hidden: int = 896
    layers: int = 24
    heads: int = 14
    kv_heads: int = 2
    ffn_dim: int = 4864
    rope_theta: float = 1_000_000.0
    norm_eps: float = 1e-6
    max_positions: int = 4096

    @property
    def head_dim(self) -> int:
        return self.hidden // self.heads

    @classmethod
    def qwen2_05b(cls):
        return cls()


# ----------------------------------------------------------------------- rope


def rope_table(cfg: Qwen2Config) -> Tuple[np.ndarray, np.ndarray]:
    inv_freq = 1.0 / (cfg.rope_theta ** (np.arange(0, cfg.head_dim, 2) / cfg.head_dim))
    t = np.arange(cfg.max_positions)
    freqs = np.outer(t, inv_freq)                       # [T, Dh/2]
    emb = np.concatenate([freqs, freqs], axis=-1)       # [T, Dh] (HF layout)
    return np.cos(emb).astype(np.float32), np.sin(emb).astype(np.float32)


def _rotate_half(x):
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x [B, T, H, Dh]; cos/sin [T, Dh] (shared) or [B, T, Dh] (per-row)."""
    if cos.ndim == 2:
        cos = cos[None, :, None, :]
        sin = sin[None, :, None, :]
    else:
        cos = cos[:, :, None, :]
        sin = sin[:, :, None, :]
    return x * cos + _rotate_half(x) * sin


# ----------------------------------------------------------------------- init


def _init_layer(key, cfg: Qwen2Config) -> Params:
    ks = jax.random.split(key, 7)
    h, hd = cfg.hidden, cfg.head_dim
    return {
        "input_ln": {"scale": jnp.ones((h,))},
        "q": init_dense(ks[0], h, cfg.heads * hd),
        "k": init_dense(ks[1], h, cfg.kv_heads * hd),
        "v": init_dense(ks[2], h, cfg.kv_heads * hd),
        "o": init_dense(ks[3], cfg.heads * hd, h, bias=False),
        "post_ln": {"scale": jnp.ones((h,))},
        "gate": init_dense(ks[4], h, cfg.ffn_dim, bias=False),
        "up": init_dense(ks[5], h, cfg.ffn_dim, bias=False),
        "down": init_dense(ks[6], cfg.ffn_dim, h, bias=False),
    }


def init_qwen2(key, cfg: Qwen2Config) -> Params:
    keys = jax.random.split(key, cfg.layers)
    return {
        "layers": [_init_layer(k, cfg) for k in keys],
        "ln_f": {"scale": jnp.ones((cfg.hidden,))},
    }


def _rms(p, x, eps):
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    return (x.astype(jnp.float32) * jax.lax.rsqrt(var + eps)).astype(x.dtype) * p["scale"]


def _repeat_kv(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """[B, T, Hkv, Dh] → [B, T, Hkv*n, Dh]."""
    b, t, h, d = x.shape
    return jnp.broadcast_to(x[:, :, :, None, :], (b, t, h, n, d)).reshape(b, t, h * n, d)


# -------------------------------------------------------------------- forward


def forward(
    params: Params,
    cfg: Qwen2Config,
    x: jnp.ndarray,                       # [B, T, hidden] input embeddings
    *,
    attn_mask: Optional[jnp.ndarray] = None,   # [B,1,T,T] True=attend (causal default)
    pos_offset: int = 0,
) -> jnp.ndarray:
    """Full-sequence forward (prefill / training). Returns hidden states."""
    b, t, _ = x.shape
    cos_t, sin_t = rope_table(cfg)
    cos = jnp.asarray(cos_t)[pos_offset: pos_offset + t]
    sin = jnp.asarray(sin_t)[pos_offset: pos_offset + t]
    if attn_mask is None:
        attn_mask = jnp.asarray(np.tril(np.ones((t, t), bool))[None, None])
    groups = cfg.heads // cfg.kv_heads

    for layer in params["layers"]:
        h = _rms(layer["input_ln"], x, cfg.norm_eps)
        q = dense(layer["q"], h).reshape(b, t, cfg.heads, cfg.head_dim)
        k = dense(layer["k"], h).reshape(b, t, cfg.kv_heads, cfg.head_dim)
        v = dense(layer["v"], h).reshape(b, t, cfg.kv_heads, cfg.head_dim)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        k = _repeat_kv(k, groups)
        v = _repeat_kv(v, groups)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(cfg.head_dim)
        logits = jnp.where(attn_mask, logits, jnp.finfo(logits.dtype).min)
        w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, t, -1)
        x = x + dense(layer["o"], attn)
        h = _rms(layer["post_ln"], x, cfg.norm_eps)
        x = x + dense(layer["down"], jax.nn.silu(dense(layer["gate"], h)) * dense(layer["up"], h))
    return _rms(params["ln_f"], x, cfg.norm_eps)


def init_kv_cache(cfg: Qwen2Config, batch: int, max_len: int, dtype=jnp.float32):
    shape = (batch, max_len, cfg.kv_heads, cfg.head_dim)
    return [{"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)} for _ in range(cfg.layers)]


def prefill(
    params: Params, cfg: Qwen2Config, x: jnp.ndarray, kv_cache, *,
    length_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Any]:
    """Run the prompt through the model, filling the KV cache at positions
    [0, T). Returns (hidden [B,T,H], cache). ``length_mask`` [B,T] marks valid
    prompt positions when prompts are right-padded."""
    b, t, _ = x.shape
    cos_t, sin_t = rope_table(cfg)
    cos = jnp.asarray(cos_t)[:t]
    sin = jnp.asarray(sin_t)[:t]
    causal = jnp.asarray(np.tril(np.ones((t, t), bool))[None, None])
    if length_mask is not None:
        causal = causal & length_mask[:, None, None, :]
    groups = cfg.heads // cfg.kv_heads

    new_cache = []
    for layer, cache in zip(params["layers"], kv_cache):
        h = _rms(layer["input_ln"], x, cfg.norm_eps)
        q = dense(layer["q"], h).reshape(b, t, cfg.heads, cfg.head_dim)
        k = dense(layer["k"], h).reshape(b, t, cfg.kv_heads, cfg.head_dim)
        v = dense(layer["v"], h).reshape(b, t, cfg.kv_heads, cfg.head_dim)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        ck = jax.lax.dynamic_update_slice(cache["k"], k.astype(cache["k"].dtype), (0, 0, 0, 0))
        cv = jax.lax.dynamic_update_slice(cache["v"], v.astype(cache["v"].dtype), (0, 0, 0, 0))
        new_cache.append({"k": ck, "v": cv})
        kr = _repeat_kv(k, groups)
        vr = _repeat_kv(v, groups)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, kr) / np.sqrt(cfg.head_dim)
        logits = jnp.where(causal, logits, jnp.finfo(logits.dtype).min)
        w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", w, vr).reshape(b, t, -1)
        x = x + dense(layer["o"], attn)
        h = _rms(layer["post_ln"], x, cfg.norm_eps)
        x = x + dense(layer["down"], jax.nn.silu(dense(layer["gate"], h)) * dense(layer["up"], h))
    return _rms(params["ln_f"], x, cfg.norm_eps), new_cache


def decode_step(
    params: Params,
    cfg: Qwen2Config,
    x: jnp.ndarray,        # [B, 1, hidden] current-step embedding
    pos: jnp.ndarray,      # scalar int32 — cache write position
    kv_cache,
    *,
    valid_from: Optional[jnp.ndarray] = None,  # [B] first valid cache index
    rope_pos: Optional[jnp.ndarray] = None,    # [B] per-row RoPE position
    prompt_len: Optional[jnp.ndarray] = None,  # [B] true prompt lengths
    prompt_capacity: int = 0,                  # padded prompt width
) -> Tuple[jnp.ndarray, Any]:
    """One cached decode step → (hidden [B,1,H], new cache).

    Right-padded batched prompts: ``prompt_len``/``prompt_capacity`` mask
    the pad slots [prompt_len_b, prompt_capacity) out of attention (prefill
    wrote garbage K/V there), and ``rope_pos`` gives each row its TRUE
    continuation position (last valid prompt index + 1 + step) so shorter
    rows don't see prompt→token RoPE distances inflated by their pad count.
    The cache write slot stays the shared scalar ``pos``."""
    b = x.shape[0]
    cos_t, sin_t = rope_table(cfg)
    if rope_pos is None:
        cos = jax.lax.dynamic_slice_in_dim(jnp.asarray(cos_t), pos, 1, 0)
        sin = jax.lax.dynamic_slice_in_dim(jnp.asarray(sin_t), pos, 1, 0)
    else:
        cos = jnp.asarray(cos_t)[rope_pos][:, None, :]       # [B, 1, rot]
        sin = jnp.asarray(sin_t)[rope_pos][:, None, :]
    groups = cfg.heads // cfg.kv_heads
    max_len = kv_cache[0]["k"].shape[1]
    positions = jnp.arange(max_len)[None, None, None, :]
    mask = positions <= pos
    if valid_from is not None:
        mask = mask & (positions >= valid_from[:, None, None, None])
    if prompt_len is not None:
        keep = ((positions < prompt_len[:, None, None, None])
                | (positions >= prompt_capacity))
        mask = mask & keep

    new_cache = []
    for layer, cache in zip(params["layers"], kv_cache):
        h = _rms(layer["input_ln"], x, cfg.norm_eps)
        q = dense(layer["q"], h).reshape(b, 1, cfg.heads, cfg.head_dim)
        k = dense(layer["k"], h).reshape(b, 1, cfg.kv_heads, cfg.head_dim)
        v = dense(layer["v"], h).reshape(b, 1, cfg.kv_heads, cfg.head_dim)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        ck = jax.lax.dynamic_update_slice(cache["k"], k.astype(cache["k"].dtype), (0, pos, 0, 0))
        cv = jax.lax.dynamic_update_slice(cache["v"], v.astype(cache["v"].dtype), (0, pos, 0, 0))
        new_cache.append({"k": ck, "v": cv})
        kr = _repeat_kv(ck, groups)
        vr = _repeat_kv(cv, groups)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, kr) / np.sqrt(cfg.head_dim)
        logits = jnp.where(mask, logits, jnp.finfo(logits.dtype).min)
        w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", w, vr).reshape(b, 1, -1)
        x = x + dense(layer["o"], attn)
        h = _rms(layer["post_ln"], x, cfg.norm_eps)
        x = x + dense(layer["down"], jax.nn.silu(dense(layer["gate"], h)) * dense(layer["up"], h))
    return _rms(params["ln_f"], x, cfg.norm_eps), new_cache


def decode_span(
    params: Params,
    cfg: Qwen2Config,
    x: jnp.ndarray,        # [B, S, hidden] — S new positions
    pos: jnp.ndarray,      # scalar int32 — absolute index of x[:, 0]
    kv_cache,
    *,
    rope_pos: Optional[jnp.ndarray] = None,    # [B] per-row position of x[:, 0]
    prompt_len: Optional[jnp.ndarray] = None,  # [B] true prompt lengths
    prompt_capacity: int = 0,                  # padded prompt width
) -> Tuple[jnp.ndarray, Any]:
    """Multi-position cached decode: process S new tokens in ONE dispatch
    (weights stream from HBM once for all S — the enabler for multi-token
    prediction, where S≈2-4 costs barely more than 1 when HBM-bound).
    ``rope_pos``/``prompt_len``/``prompt_capacity``: see decode_step —
    right-padded batched prompt handling."""
    b, s_len, _ = x.shape
    cos_t, sin_t = rope_table(cfg)
    if rope_pos is None:
        cos = jax.lax.dynamic_slice_in_dim(jnp.asarray(cos_t), pos, s_len, 0)
        sin = jax.lax.dynamic_slice_in_dim(jnp.asarray(sin_t), pos, s_len, 0)
    else:
        idx = rope_pos[:, None] + jnp.arange(s_len)[None, :]  # [B, S]
        cos = jnp.asarray(cos_t)[idx]                         # [B, S, rot]
        sin = jnp.asarray(sin_t)[idx]
    groups = cfg.heads // cfg.kv_heads
    max_len = kv_cache[0]["k"].shape[1]
    cache_pos = jnp.arange(max_len)[None, None, None, :]
    query_abs = pos + jnp.arange(s_len)[None, None, :, None]
    mask = cache_pos <= query_abs          # causal over absolute positions
    if prompt_len is not None:
        keep = ((cache_pos < prompt_len[:, None, None, None])
                | (cache_pos >= prompt_capacity))
        mask = mask & keep

    new_cache = []
    for layer, cache in zip(params["layers"], kv_cache):
        h = _rms(layer["input_ln"], x, cfg.norm_eps)
        q = dense(layer["q"], h).reshape(b, s_len, cfg.heads, cfg.head_dim)
        k = dense(layer["k"], h).reshape(b, s_len, cfg.kv_heads, cfg.head_dim)
        v = dense(layer["v"], h).reshape(b, s_len, cfg.kv_heads, cfg.head_dim)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        ck = jax.lax.dynamic_update_slice(cache["k"], k.astype(cache["k"].dtype), (0, pos, 0, 0))
        cv = jax.lax.dynamic_update_slice(cache["v"], v.astype(cache["v"].dtype), (0, pos, 0, 0))
        new_cache.append({"k": ck, "v": cv})
        kr = _repeat_kv(ck, groups)
        vr = _repeat_kv(cv, groups)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, kr) / np.sqrt(cfg.head_dim)
        logits = jnp.where(mask, logits, jnp.finfo(logits.dtype).min)
        w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", w, vr).reshape(b, s_len, -1)
        x = x + dense(layer["o"], attn)
        h = _rms(layer["post_ln"], x, cfg.norm_eps)
        x = x + dense(layer["down"], jax.nn.silu(dense(layer["gate"], h)) * dense(layer["up"], h))
    return _rms(params["ln_f"], x, cfg.norm_eps), new_cache


# ----------------------------------------------------------------- conversion


def from_hf_state_dict(state: Dict[str, Any], cfg: Qwen2Config) -> Params:
    """Convert an HF Qwen2Model / Qwen2ForCausalLM ``model.*`` state dict
    (backbone only — embeddings/heads belong to the wrapping speech LM)."""
    def g(name):
        for prefix in ("model.", ""):
            if prefix + name in state:
                return state[prefix + name]
        raise KeyError(name)

    layers = []
    for i in range(cfg.layers):
        base = f"layers.{i}"
        layers.append({
            "input_ln": {"scale": t2j(g(f"{base}.input_layernorm.weight"))},
            "q": linear_from_torch(g(f"{base}.self_attn.q_proj.weight"), g(f"{base}.self_attn.q_proj.bias")),
            "k": linear_from_torch(g(f"{base}.self_attn.k_proj.weight"), g(f"{base}.self_attn.k_proj.bias")),
            "v": linear_from_torch(g(f"{base}.self_attn.v_proj.weight"), g(f"{base}.self_attn.v_proj.bias")),
            "o": linear_from_torch(g(f"{base}.self_attn.o_proj.weight")),
            "post_ln": {"scale": t2j(g(f"{base}.post_attention_layernorm.weight"))},
            "gate": linear_from_torch(g(f"{base}.mlp.gate_proj.weight")),
            "up": linear_from_torch(g(f"{base}.mlp.up_proj.weight")),
            "down": linear_from_torch(g(f"{base}.mlp.down_proj.weight")),
        })
    return {"layers": layers, "ln_f": {"scale": t2j(g("norm.weight"))}}


# --------------------------------------------------------------- parallelism


def partition_rules(tp_axis: str = "tp"):
    """Megatron-style tensor-parallel layout for the backbone.

    Column-parallel q/k/v/gate/up (output features sharded over ``tp_axis``)
    and row-parallel o/down (input features sharded), so each attention/MLP
    block needs exactly one all-reduce — inserted automatically by XLA's
    sharding propagation, not hand-written collectives. Replaces the
    reference's single-process-group DDP (train_greek.sh:24) with a layout
    that also scales model size. Requires heads % tp == 0 and
    kv_heads % tp == 0 for fully local attention-head math.
    """
    from jax.sharding import PartitionSpec as P

    from ..parallel.partition import PartitionRules

    return PartitionRules(rules=(
        # kernel(_q) covers both float and weight-only-int8 layouts; the
        # per-output-channel quant scale [1, out] shards with the columns
        (r"/(q|k|v|gate|up)/kernel(_q)?$", P(None, tp_axis)),
        (r"/(q|k|v|gate|up)/scale$", P(None, tp_axis)),
        (r"/(q|k|v)/bias$", P(tp_axis)),
        (r"/(o|down)/kernel(_q)?$", P(tp_axis, None)),
    ))
