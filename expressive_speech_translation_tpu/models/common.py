"""Shared transformer building blocks (pure functional, param pytrees).

Models in this framework are plain nested dicts of arrays + pure apply
functions. No framework layer classes: converters from torch checkpoints,
pjit partition rules (parallel/partition.py), and donation/jit boundaries all
operate on the same simple pytree.

Conventions:
- activations [B, T, D]; attention heads folded as [B, T, H, Dh]
- dense kernels stored as [in, out] (torch Linear weights are transposed on load)
- KV caches are preallocated [B, max_T, H, Dh] and written via dynamic_update_slice
  so autoregressive decode is a single compiled step with no reshapes
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


# ----------------------------------------------------------------- initialisers


def _dense_init(key, in_dim, out_dim, dtype=jnp.float32):
    scale = 1.0 / math.sqrt(in_dim)
    return jax.random.uniform(key, (in_dim, out_dim), dtype, -scale, scale)


def init_dense(key, in_dim: int, out_dim: int, *, bias: bool = True) -> Params:
    p = {"kernel": _dense_init(key, in_dim, out_dim)}
    if bias:
        p["bias"] = jnp.zeros((out_dim,), jnp.float32)
    return p


def dense(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    if "kernel_q" in p:
        # weight-only int8: the matmul operand is convert(int8) — XLA:TPU
        # streams the int8 weights from HBM (half the bytes of bf16, the
        # binding constraint of autoregressive decode) and converts in
        # registers; the per-output-channel scale applies after the dot.
        y = (x @ p["kernel_q"].astype(x.dtype)) * p["scale"].astype(x.dtype)
    else:
        y = x @ p["kernel"]
    if "bias" in p:
        y = y + p["bias"]
    return y


def quantize_dense(p: Params) -> Params:
    """Symmetric per-output-channel int8 weight quantization of a dense param
    ({"kernel" [in, out], "bias"?}) for bandwidth-bound serving."""
    k = p["kernel"]
    scale = jnp.maximum(jnp.max(jnp.abs(k), axis=0, keepdims=True), 1e-8) / 127.0
    q = jnp.clip(jnp.round(k / scale), -127, 127).astype(jnp.int8)
    out: Params = {"kernel_q": q, "scale": scale.astype(jnp.float32)}
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


def quantize_transformer_blocks(blocks) -> list:
    """int8-quantize the dense kernels of standard attention/MLP blocks
    (init_attention q/k/v/o + init_mlp fc1/fc2); norms stay float."""
    out = []
    for blk in blocks:
        q = dict(blk)
        for key in ("self_attn", "cross_attn"):
            if key in blk:
                q[key] = {n: quantize_dense(p) for n, p in blk[key].items()}
        if "mlp" in blk:
            q["mlp"] = {n: quantize_dense(p) for n, p in blk["mlp"].items()}
        out.append(q)
    return out


def quantize_embed_head(embed: jnp.ndarray) -> Params:
    """Per-vocab-row int8 copy of a tied embedding for the OUTPUT projection
    (the [vocab, d] matmul is the single largest weight stream of whisper/NLLB
    decode). The float table stays for gathers; this int8 copy serves
    ``logits = x @ embed.T``."""
    scale = jnp.maximum(jnp.max(jnp.abs(embed), axis=1), 1e-8) / 127.0
    q = jnp.clip(jnp.round(embed / scale[:, None]), -127, 127).astype(jnp.int8)
    return {"q": q, "scale": scale.astype(jnp.float32)}


def tied_head_logits(container: Params, x: jnp.ndarray, embed: jnp.ndarray) -> jnp.ndarray:
    """``x @ embed.T`` — through the int8 head when ``container`` carries
    ``embed_q`` (x: [..., d] → logits [..., vocab])."""
    if "embed_q" in container:
        eq = container["embed_q"]
        return (x @ eq["q"].T.astype(x.dtype)) * eq["scale"].astype(x.dtype)
    return x @ embed.T


def init_layer_norm(dim: int) -> Params:
    return {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


def layer_norm(p: Params, x: jnp.ndarray, *, eps: float = 1e-5) -> jnp.ndarray:
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return y * p["scale"] + p["bias"]


def rms_norm(p: Params, x: jnp.ndarray, *, eps: float = 1e-6) -> jnp.ndarray:
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(var + eps) * p["scale"]


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.gelu(x, approximate=False)


def sinusoid_position_embedding(length: int, dim: int, *, max_timescale: float = 10000.0) -> np.ndarray:
    """Whisper-style sinusoids: [length, dim] = concat(sin, cos)."""
    assert dim % 2 == 0
    log_timescale = math.log(max_timescale) / (dim // 2 - 1)
    inv_timescales = np.exp(-log_timescale * np.arange(dim // 2))
    scaled = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(np.float32)


# -------------------------------------------------------------------- attention


@dataclasses.dataclass(frozen=True)
class AttnConfig:
    dim: int
    heads: int
    # torch-parity details: whisper/nllb use bias on q/v/out but not k
    k_bias: bool = False

    @property
    def head_dim(self) -> int:
        return self.dim // self.heads


def init_attention(key, cfg: AttnConfig) -> Params:
    ks = jax.random.split(key, 4)
    return {
        "q": init_dense(ks[0], cfg.dim, cfg.dim),
        "k": init_dense(ks[1], cfg.dim, cfg.dim, bias=cfg.k_bias),
        "v": init_dense(ks[2], cfg.dim, cfg.dim),
        "o": init_dense(ks[3], cfg.dim, cfg.dim),
    }


def _split_heads(x: jnp.ndarray, heads: int) -> jnp.ndarray:
    b, t, d = x.shape
    return x.reshape(b, t, heads, d // heads)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, t, h, dh = x.shape
    return x.reshape(b, t, h * dh)


def mha(
    p: Params,
    cfg: AttnConfig,
    x_q: jnp.ndarray,
    x_kv: jnp.ndarray,
    *,
    mask: Optional[jnp.ndarray] = None,
    precomputed_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
) -> jnp.ndarray:
    """Full (non-cached) multi-head attention. mask: broadcastable to
    [B, H, Tq, Tk], True = attend."""
    q = _split_heads(dense(p["q"], x_q), cfg.heads) * (cfg.head_dim ** -0.5)
    if precomputed_kv is None:
        k = _split_heads(dense(p["k"], x_kv), cfg.heads)
        v = _split_heads(dense(p["v"], x_kv), cfg.heads)
    else:
        k, v = precomputed_kv
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k)
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(logits.dtype).min)
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x_q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", weights, v)
    return dense(p["o"], _merge_heads(out))


def attention_kv(p: Params, cfg: AttnConfig, x_kv: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Precompute K/V (e.g. encoder outputs for cross-attention)."""
    k = _split_heads(dense(p["k"], x_kv), cfg.heads)
    v = _split_heads(dense(p["v"], x_kv), cfg.heads)
    return k, v


def mha_step(
    p: Params,
    cfg: AttnConfig,
    x_q: jnp.ndarray,            # [B, 1, D]
    cache_k: jnp.ndarray,        # [B, maxT, H, Dh]
    cache_v: jnp.ndarray,
    pos: jnp.ndarray,            # scalar int32 — current write position
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Single autoregressive self-attention step with preallocated KV cache.

    Returns (out [B,1,D], new_cache_k, new_cache_v). Positions > ``pos`` are
    masked out, so stale cache contents are harmless.
    """
    b = x_q.shape[0]
    q = _split_heads(dense(p["q"], x_q), cfg.heads) * (cfg.head_dim ** -0.5)
    k_new = _split_heads(dense(p["k"], x_q), cfg.heads)  # [B,1,H,Dh]
    v_new = _split_heads(dense(p["v"], x_q), cfg.heads)
    cache_k = jax.lax.dynamic_update_slice(cache_k, k_new.astype(cache_k.dtype), (0, pos, 0, 0))
    cache_v = jax.lax.dynamic_update_slice(cache_v, v_new.astype(cache_v.dtype), (0, pos, 0, 0))

    logits = jnp.einsum("bqhd,bkhd->bhqk", q, cache_k)  # [B,H,1,maxT]
    positions = jnp.arange(cache_k.shape[1])[None, None, None, :]
    mask = positions <= pos
    logits = jnp.where(mask, logits, jnp.finfo(logits.dtype).min)
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x_q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", weights, cache_v)
    return dense(p["o"], _merge_heads(out)), cache_k, cache_v


# ------------------------------------------------------- shared decoder plumbing


def init_pre_ln_block(key, attn_cfg: "AttnConfig", d_model: int, ffn_dim: int,
                      *, cross: bool) -> Params:
    """Pre-LN encoder/decoder block param tree shared by whisper and NLLB
    (their _init_block copies drifted in nothing but the config type)."""
    ks = jax.random.split(key, 3)
    p: Params = {
        "self_attn": init_attention(ks[0], attn_cfg),
        "self_attn_ln": init_layer_norm(d_model),
        "mlp": init_mlp(ks[1], d_model, ffn_dim),
        "mlp_ln": init_layer_norm(d_model),
    }
    if cross:
        p["cross_attn"] = init_attention(ks[2], attn_cfg)
        p["cross_attn_ln"] = init_layer_norm(d_model)
    return p


def precompute_layer_cross_kv(layers, attn_cfg: "AttnConfig", enc_out: jnp.ndarray):
    """Per-layer encoder K/V for cross-attention (computed once per utterance)."""
    return [attention_kv(b["cross_attn"], attn_cfg, enc_out) for b in layers]


def init_decoder_kv_cache(n_layers: int, batch: int, max_len: int, heads: int,
                          head_dim: int, dtype=jnp.float32):
    shape = (batch, max_len, heads, head_dim)
    return [{"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}
            for _ in range(n_layers)]


# ------------------------------------------------------------------------- mlp


def init_mlp(key, dim: int, hidden: int) -> Params:
    k1, k2 = jax.random.split(key)
    return {"fc1": init_dense(k1, dim, hidden), "fc2": init_dense(k2, hidden, dim)}


def mlp(p: Params, x: jnp.ndarray, *, activation=gelu) -> jnp.ndarray:
    return dense(p["fc2"], activation(dense(p["fc1"], x)))


# -------------------------------------------------------------------- conversion


def t2j(tensor) -> jnp.ndarray:
    """torch tensor → jnp array (via numpy, no copies beyond the host one)."""
    return jnp.asarray(np.asarray(tensor.detach().cpu().numpy()))


def linear_from_torch(weight, bias=None) -> Params:
    p = {"kernel": t2j(weight).T}
    if bias is not None:
        p["bias"] = t2j(bias)
    return p


def cast_floats(tree, dtype):
    """Cast floating leaves of a pytree (bf16 inference policy)."""
    def _cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(_cast, tree)


def host_init(init_fn, seed: int, *args):
    """Run ``init_fn(PRNGKey(seed), *args)`` on the host CPU backend and
    transfer the tree to the default device in one batch.

    Eager per-tensor inits dispatch hundreds of tiny programs; over a remote
    TPU relay each is a round-trip, making reference-scale engine construction
    take minutes/model. The PRNG key MUST be created inside the CPU context
    (it takes an integer seed, not a key): ops follow their operands' device,
    so a device-resident key would drag the whole init back onto the relay —
    and even device_put of one key off the relay measures ~80 s.
    """
    cpus = jax.devices("cpu")
    with jax.default_device(cpus[0]):
        tree = init_fn(jax.random.PRNGKey(seed), *args)
    default = jax.devices()[0]
    if default.platform == "cpu":
        return tree
    return jax.device_put(tree, default)


def transformer_partition_rules(tp_axis: str = "tp"):
    """Megatron-style TP layout for the shared pre-LN transformer blocks
    (whisper + NLLB use these exact param paths — init_attention/init_mlp):
    column-parallel q/k/v + fc1, row-parallel o + fc2 (one all-reduce per
    block, inserted by XLA's sharding propagation), hidden-sharded tied
    embedding so the vocab logit matmul contracts locally and psums.
    int8 (kernel_q + per-channel scale) layouts shard with their columns;
    row-parallel scales replicate (full output dim per shard)."""
    from jax.sharding import PartitionSpec as P

    from ..parallel.partition import PartitionRules

    return PartitionRules(rules=(
        (r"/(self_attn|cross_attn)/(q|k|v)/kernel(_q)?$", P(None, tp_axis)),
        (r"/(self_attn|cross_attn)/(q|k|v)/scale$", P(None, tp_axis)),
        (r"/(self_attn|cross_attn)/(q|k|v)/bias$", P(tp_axis)),
        (r"/(self_attn|cross_attn)/o/kernel(_q)?$", P(tp_axis, None)),
        (r"/mlp/fc1/kernel(_q)?$", P(None, tp_axis)),
        (r"/mlp/fc1/scale$", P(None, tp_axis)),
        (r"/mlp/fc1/bias$", P(tp_axis)),
        (r"/mlp/fc2/kernel(_q)?$", P(tp_axis, None)),
        (r"embed_q/q$", P(None, tp_axis)),
        (r"(^|/)embed$", P(None, tp_axis)),
    ))
