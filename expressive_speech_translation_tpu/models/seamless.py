"""SeamlessM4T-v2 direct speech-to-speech translation in JAX (TPU-first).

The reference's alternate backend path: ``facebook/seamless-m4t-v2-large``
direct S2ST with ``num_beams=5`` (/root/reference/Backend/translate_speech.py:79-154;
the pyc-only SeamlessBackend, SURVEY §2.4). This module is weight-compatible
with the HF checkpoint — :func:`from_hf_state_dict` consumes
``SeamlessM4Tv2ForSpeechToSpeech`` state dicts — and every stage has a
random-weight torch-mirror parity test (tests/test_seamless_convert.py).

Architecture (HF modeling_seamless_m4t_v2.py is the behavioral spec):

  speech encoder   conformer: fbank×2-stack (160) → feature projection →
                   N× [½ffn → rel-pos self-attn (chunked) → causal depthwise
                   conv → ½ffn → LN] → ½intermediate-ffn → conv adaptor
                   (k8/s8 GLU pooling + attention) → LN
  text decoder     M2M100-family: scaled tied embeddings, offset-2 sinusoids,
                   pre-LN blocks, beam/greedy KV-cached decode
  t2u model        NAR text-to-unit: transformer encoder over text-decoder
                   states → char-upsample → duration predictor → hard
                   upsample → FFT-style post-LN conv blocks → unit logits
  unit vocoder     code HiFi-GAN: unit embeddings → duration predictor →
                   hard upsample → [lang|units|spkr] channels → HiFi-GAN

TPU notes: the NAR upsampling stages are data-dependent in torch
(repeat_interleave); here they are static-shape gathers built from a cumsum
(searchsorted-style), so the whole t2u+vocoder path jits with bucketed
``max_chars`` / ``max_units`` horizons and valid-length masks.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .beam import BeamConfig, beam_search, greedy_search
from .common import (
    AttnConfig,
    Params,
    attention_kv,
    dense,
    init_attention,
    init_dense,
    init_layer_norm,
    init_mlp,
    layer_norm,
    linear_from_torch,
    mha,
    mha_step,
    mlp,
    t2j,
)
from .nllb import m2m100_sinusoids, position_ids_from_tokens

_relu_mlp = functools.partial(mlp, activation=jax.nn.relu)
_swish_mlp = functools.partial(mlp, activation=jax.nn.silu)


@dataclasses.dataclass(frozen=True)
class SeamlessConfig:
    """Defaults mirror facebook/seamless-m4t-v2-large (HF SeamlessM4Tv2Config)."""

    hidden: int = 1024
    # --- speech encoder (wav2vec2-BERT-style conformer)
    feat_dim: int = 160                   # 80-mel fbank × 2-frame stack
    speech_layers: int = 24
    speech_heads: int = 16
    speech_ffn: int = 4096
    depthwise_kernel: int = 31
    left_max_pos: int = 64                # relative_key distance clamp
    right_max_pos: int = 8
    chunk_size: Optional[int] = 20_000    # speech_encoder_chunk_size
    left_chunk_num: int = 128
    adaptor_kernel: int = 8
    adaptor_stride: int = 8
    adapter_layers: int = 1
    # --- text decoder (M2M100 family)
    vocab_size: int = 256_102
    decoder_layers: int = 24
    decoder_heads: int = 16
    decoder_ffn: int = 8192
    max_positions: int = 4096
    pad_token: int = 0
    bos_token: int = 2
    eos_token: int = 3
    decoder_start_token: int = 3
    # --- t2u (NAR text-to-unit)
    t2u_vocab: int = 10_082
    t2u_encoder_layers: int = 6
    t2u_decoder_layers: int = 6
    t2u_ffn: int = 8192
    t2u_heads: int = 16
    char_vocab: int = 10_943
    t2u_pad: int = 1
    t2u_eos: int = 2
    var_embed_dim: int = 1024             # t2u_variance_predictor_embed_dim
    var_hidden_dim: int = 256             # t2u_variance_predictor_hidden_dim
    var_kernel: int = 3
    # --- unit vocoder (code HiFi-GAN)
    unit_vocab_vocoder: int = 10_000      # unit_hifi_gan_vocab_size
    unit_embed_dim: int = 1280
    lang_embed_dim: int = 256
    spkr_embed_dim: int = 256
    num_langs: int = 36
    num_spkrs: int = 200
    vocoder_offset: int = 4
    upsample_rates: Tuple[int, ...] = (5, 4, 4, 2, 2)
    upsample_kernels: Tuple[int, ...] = (11, 8, 8, 4, 4)
    upsample_initial_channel: int = 512
    resblock_kernels: Tuple[int, ...] = (3, 7, 11)
    resblock_dilations: Tuple[Tuple[int, ...], ...] = ((1, 3, 5),) * 3
    leaky_slope: float = 0.1
    sample_rate_out: int = 16_000

    @property
    def speech_attn(self) -> AttnConfig:
        return AttnConfig(self.hidden, self.speech_heads, k_bias=True)

    @property
    def text_attn(self) -> AttnConfig:
        return AttnConfig(self.hidden, self.decoder_heads, k_bias=True)

    @property
    def t2u_attn(self) -> AttnConfig:
        return AttnConfig(self.hidden, self.t2u_heads, k_bias=True)

    @property
    def head_dim(self) -> int:
        return self.hidden // self.speech_heads

    @property
    def hop_total(self) -> int:
        return int(np.prod(self.upsample_rates))

    @classmethod
    def v2_large(cls) -> "SeamlessConfig":
        return cls()

    @classmethod
    def toy(cls) -> "SeamlessConfig":
        """Small config for weightless serving/tests (same graph)."""
        return cls(
            hidden=64, speech_layers=2, speech_heads=4, speech_ffn=128,
            depthwise_kernel=7, chunk_size=None, adaptor_kernel=4,
            adaptor_stride=2, vocab_size=384, decoder_layers=2,
            decoder_heads=4, decoder_ffn=128, max_positions=512,
            t2u_vocab=48, t2u_encoder_layers=2, t2u_decoder_layers=2,
            t2u_ffn=128, t2u_heads=4, char_vocab=300,
            var_embed_dim=64, var_hidden_dim=32,
            unit_vocab_vocoder=40, unit_embed_dim=64, lang_embed_dim=16,
            spkr_embed_dim=16, num_langs=4, num_spkrs=3,
            upsample_rates=(4, 4), upsample_kernels=(8, 8),
            upsample_initial_channel=64, resblock_kernels=(3,),
            resblock_dilations=((1, 3),),
        )


# --------------------------------------------------------------------- convs


def _conv1d(p: Params, x: jnp.ndarray, *, stride: int = 1, pad=0,
            dilation: int = 1, groups: int = 1) -> jnp.ndarray:
    """NHC conv; kernel HIO [k, in/groups, out]; pad int (both sides) or 'same'."""
    k = p["kernel"].shape[0]
    if pad == "same":
        total = dilation * (k - 1)
        padding = [(total // 2, total - total // 2)]
    else:
        padding = [(pad, pad)]
    y = jax.lax.conv_general_dilated(
        x.astype(p["kernel"].dtype), p["kernel"], (stride,), padding,
        rhs_dilation=(dilation,), feature_group_count=groups,
        dimension_numbers=("NHC", "HIO", "NHC"))
    return y + p["bias"] if "bias" in p else y


def _conv_transpose1d(p: Params, x: jnp.ndarray, stride: int) -> jnp.ndarray:
    """torch ConvTranspose1d(stride=s, padding=(k−s)//2) parity (HiFi-GAN
    geometry: even k−s, out = in × s). Kernel stored HIO unflipped."""
    width = p["kernel"].shape[0]
    pad_torch = (width - stride) // 2
    pad = width - 1 - pad_torch
    y = jax.lax.conv_general_dilated(
        x.astype(p["kernel"].dtype), jnp.flip(p["kernel"], 0), (1,),
        [(pad, pad - (width - stride) % 2)], lhs_dilation=(stride,),
        dimension_numbers=("NHC", "HIO", "NHC"))
    return y + p["bias"]


def _init_conv(key, width: int, in_ch: int, out_ch: int, *, bias=True,
               groups: int = 1) -> Params:
    scale = 1.0 / np.sqrt((in_ch // groups) * width)
    p = {"kernel": jax.random.uniform(
        key, (width, in_ch // groups, out_ch), jnp.float32, -scale, scale)}
    if bias:
        p["bias"] = jnp.zeros((out_ch,), jnp.float32)
    return p


# ------------------------------------------------------------ mask utilities


def lengths_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """HF _compute_new_attention_mask: [B] lengths → bool [B, max_len]."""
    return jnp.arange(max_len)[None, :] < lengths[:, None]


def _chunk_attend(t: int, chunk: int, left_num: int) -> np.ndarray:
    """Bool [t, t] — True where attention is allowed under v2 chunking."""
    idx = np.arange(t)
    ci = idx // chunk
    start = np.maximum(ci - left_num, 0) * chunk if left_num >= 0 else np.zeros_like(ci)
    end = np.minimum((ci + 1) * chunk, t)
    j = idx[None, :]
    return (j >= start[:, None]) & (j < end[:, None])


def adaptor_out_lengths(cfg: SeamlessConfig, lengths: jnp.ndarray) -> jnp.ndarray:
    """Per-layer conv subsampling of valid lengths (HF
    _compute_sub_sample_lengths_from_attention_mask, applied per adapter layer)."""
    pad = cfg.adaptor_kernel // 2
    out = lengths
    for _ in range(cfg.adapter_layers):
        out = (out + 2 * pad - cfg.adaptor_kernel) // cfg.adaptor_stride + 1
    return out


# ------------------------------------------------------------- speech encoder


def _init_conformer_layer(key, cfg: SeamlessConfig) -> Params:
    ks = jax.random.split(key, 8)
    h = cfg.hidden
    n_pos = cfg.left_max_pos + cfg.right_max_pos + 1
    return {
        "ffn1_ln": init_layer_norm(h),
        "ffn1": init_mlp(ks[0], h, cfg.speech_ffn),
        "attn_ln": init_layer_norm(h),
        "attn": init_attention(ks[1], cfg.speech_attn),
        "dist_embed": jax.random.normal(ks[2], (n_pos, cfg.head_dim)) * 0.02,
        "conv_ln": init_layer_norm(h),
        "pw1": _init_conv(ks[3], 1, h, 2 * h, bias=False),
        "dw": _init_conv(ks[4], cfg.depthwise_kernel, h, h, bias=False, groups=h),
        "dw_ln": init_layer_norm(h),
        "pw2": _init_conv(ks[5], 1, h, h, bias=False),
        "ffn2_ln": init_layer_norm(h),
        "ffn2": init_mlp(ks[6], h, cfg.speech_ffn),
        "final_ln": init_layer_norm(h),
    }


def _init_adapter_layer(key, cfg: SeamlessConfig) -> Params:
    ks = jax.random.split(key, 4)
    h = cfg.hidden
    return {
        "residual_ln": init_layer_norm(h),
        "residual_conv": _init_conv(ks[0], cfg.adaptor_kernel, h, 2 * h),
        "attn_ln": init_layer_norm(h),
        "attn_conv": _init_conv(ks[1], cfg.adaptor_kernel, h, 2 * h),
        "attn": init_attention(ks[2], cfg.speech_attn),
        "ffn_ln": init_layer_norm(h),
        "ffn": init_mlp(ks[3], h, cfg.speech_ffn),
    }


def _rel_pos_scores(q: jnp.ndarray, dist_embed: jnp.ndarray,
                    left: int, right: int) -> jnp.ndarray:
    """relative_key attention term: q [B,T,H,Dh] → [B,H,Tq,Tk]."""
    tq = q.shape[1]
    l_idx = np.arange(tq)[:, None]
    r_idx = np.arange(tq)[None, :]
    distance = np.clip(r_idx - l_idx, -left, right) + left       # [Tq, Tk]
    pos_emb = dist_embed[distance]                               # [Tq, Tk, Dh]
    return jnp.einsum("blhd,lrd->bhlr", q, pos_emb.astype(q.dtype))


def _conformer_attention(p: Params, cfg: SeamlessConfig, x: jnp.ndarray,
                         attend: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Rel-pos self-attention. attend: bool [B,1,T,T] or None.

    HF scales scores by 1/sqrt(dh) AFTER the qk matmul and adds the
    rel-pos term with the same scale (modeling_seamless_m4t_v2.py:426-440)."""
    a = cfg.speech_attn
    q = dense(p["attn"]["q"], x).reshape(x.shape[0], x.shape[1], a.heads, a.head_dim)
    k = dense(p["attn"]["k"], x).reshape(q.shape)
    v = dense(p["attn"]["v"], x).reshape(q.shape)
    scale = 1.0 / math.sqrt(a.head_dim)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    scores = scores + _rel_pos_scores(q, p["dist_embed"], cfg.left_max_pos,
                                      cfg.right_max_pos) * scale
    if attend is not None:
        scores = jnp.where(attend, scores, jnp.finfo(scores.dtype).min)
    w = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(x.shape)
    return dense(p["attn"]["o"], out)


def _conformer_conv(p: Params, cfg: SeamlessConfig, x: jnp.ndarray,
                    pad_mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Causal depthwise conv module (left-padded k−1)."""
    h = layer_norm(p["conv_ln"], x)
    if pad_mask is not None:
        h = jnp.where(pad_mask[..., None], h, 0.0)
    h = _conv1d(p["pw1"], h)                                   # [B,T,2H]
    a, b = jnp.split(h, 2, axis=-1)
    h = a * jax.nn.sigmoid(b)                                  # GLU over channels
    h = jnp.pad(h, ((0, 0), (cfg.depthwise_kernel - 1, 0), (0, 0)))
    h = _conv1d(p["dw"], h, groups=cfg.hidden)
    h = layer_norm(p["dw_ln"], h)
    h = jax.nn.silu(h)
    return _conv1d(p["pw2"], h)


def encode_speech(
    params: Params,
    cfg: SeamlessConfig,
    feats: jnp.ndarray,                        # [B, T, feat_dim]
    feat_mask: Optional[jnp.ndarray] = None,   # bool [B, T] (True = valid)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """→ (encoder states [B, T', H], valid mask [B, T']) after the adaptor."""
    enc = params["speech_encoder"]
    b, t, _ = feats.shape
    x = dense(enc["fp"]["proj"], layer_norm(enc["fp"]["ln"], feats))

    attend = None
    if feat_mask is not None:
        x = jnp.where(feat_mask[..., None], x, 0.0)
        attend = feat_mask[:, None, None, :] & jnp.ones((1, 1, t, 1), bool)
    if cfg.chunk_size is not None:
        chunk = jnp.asarray(_chunk_attend(t, cfg.chunk_size, cfg.left_chunk_num))
        attend = chunk[None, None] if attend is None else attend & chunk[None, None]

    for layer in enc["layers"]:
        x = x + 0.5 * _swish_mlp(layer["ffn1"], layer_norm(layer["ffn1_ln"], x))
        x = x + _conformer_attention(layer, cfg, layer_norm(layer["attn_ln"], x), attend)
        x = x + _conformer_conv(layer, cfg, x, feat_mask)
        x = x + 0.5 * _swish_mlp(layer["ffn2"], layer_norm(layer["ffn2_ln"], x))
        x = layer_norm(layer["final_ln"], x)
    x = layer_norm(enc["ln"], x)

    # intermediate ffn (relu, no pre-LN — SpeechEncoder.forward:1538-1539)
    x = x + 0.5 * _relu_mlp(enc["intermediate_ffn"], x)

    lengths = (jnp.sum(feat_mask.astype(jnp.int32), axis=1) if feat_mask is not None
               else jnp.full((b,), t, jnp.int32))
    for layer in enc["adapter"]:
        residual = layer_norm(layer["residual_ln"], x)
        residual = _conv1d(layer["residual_conv"], residual,
                           stride=cfg.adaptor_stride, pad=cfg.adaptor_stride // 2)
        ra, rb = jnp.split(residual, 2, axis=-1)
        residual = ra * jax.nn.sigmoid(rb)

        h = layer_norm(layer["attn_ln"], x)
        h = _conv1d(layer["attn_conv"], h, stride=cfg.adaptor_stride,
                    pad=cfg.adaptor_stride // 2)
        ha, hb = jnp.split(h, 2, axis=-1)
        h = ha * jax.nn.sigmoid(hb)

        pad = cfg.adaptor_kernel // 2
        lengths = (lengths + 2 * pad - cfg.adaptor_kernel) // cfg.adaptor_stride + 1
        sub_mask = lengths_mask(lengths, h.shape[1])
        attend_sub = sub_mask[:, None, None, :]
        a = cfg.speech_attn
        q = dense(layer["attn"]["q"], h).reshape(h.shape[0], h.shape[1], a.heads, a.head_dim)
        k = dense(layer["attn"]["k"], h).reshape(q.shape)
        v = dense(layer["attn"]["v"], h).reshape(q.shape)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(a.head_dim)
        scores = jnp.where(attend_sub, scores, jnp.finfo(scores.dtype).min)
        w = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(h.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(h.shape)
        h = dense(layer["attn"]["o"], attn) + residual

        x = h + _relu_mlp(layer["ffn"], layer_norm(layer["ffn_ln"], h))

    x = layer_norm(enc["inner_ln"], x)
    return x, lengths_mask(lengths, x.shape[1])


# --------------------------------------------------------------- text decoder


def _init_text_block(key, cfg: SeamlessConfig) -> Params:
    ks = jax.random.split(key, 3)
    return {
        "self_attn": init_attention(ks[0], cfg.text_attn),
        "self_attn_ln": init_layer_norm(cfg.hidden),
        "cross_attn": init_attention(ks[1], cfg.text_attn),
        "cross_attn_ln": init_layer_norm(cfg.hidden),
        "mlp": init_mlp(ks[2], cfg.hidden, cfg.decoder_ffn),
        "mlp_ln": init_layer_norm(cfg.hidden),
    }


def text_decoder_hidden(
    params: Params, cfg: SeamlessConfig, tokens: jnp.ndarray,
    enc: jnp.ndarray, enc_mask: jnp.ndarray,
) -> jnp.ndarray:
    """Teacher-forced decoder pass → last hidden states [B, T, H]
    (SeamlessM4Tv2Decoder: scaled embed + padding-aware sinusoids, pre-LN)."""
    dec = params["text_decoder"]
    scale = math.sqrt(cfg.hidden)
    t = tokens.shape[1]
    pos_ids = position_ids_from_tokens(tokens, cfg.pad_token)
    x = params["shared"][tokens] * scale + dec["pos"][pos_ids]
    causal = jnp.asarray(np.tril(np.ones((t, t), bool))[None, None])
    enc_attend = enc_mask[:, None, None, :]
    for block in dec["layers"]:
        h = layer_norm(block["self_attn_ln"], x)
        x = x + mha(block["self_attn"], cfg.text_attn, h, h, mask=causal)
        h = layer_norm(block["cross_attn_ln"], x)
        x = x + mha(block["cross_attn"], cfg.text_attn, h, enc, mask=enc_attend)
        h = layer_norm(block["mlp_ln"], x)
        x = x + _relu_mlp(block["mlp"], h)
    return layer_norm(dec["ln"], x)


def text_decode_full(params: Params, cfg: SeamlessConfig, tokens: jnp.ndarray,
                     enc: jnp.ndarray, enc_mask: jnp.ndarray) -> jnp.ndarray:
    """Teacher-forced logits [B, T, vocab] (lm_head tied to shared embed)."""
    return text_decoder_hidden(params, cfg, tokens, enc, enc_mask) @ params["shared"].T


def generate_text(
    params: Params,
    cfg: SeamlessConfig,
    enc: jnp.ndarray,
    enc_mask: jnp.ndarray,
    tgt_lang_token: int | jnp.ndarray,
    *,
    num_beams: int = 5,
    max_new_tokens: int = 256,
) -> jnp.ndarray:
    """Beam/greedy text decoding. Prompt is ``[decoder_start, tgt_lang]``
    (HF prepends decoder_start_token_id to the forced lang id). Returns
    [B, 2 + max_new_tokens] ids, pad-filled after EOS."""
    b = enc.shape[0]
    dec = params["text_decoder"]
    cross = [attention_kv(blk["cross_attn"], cfg.text_attn, enc)
             for blk in dec["layers"]]
    enc_attend = enc_mask[:, None, None, :]
    scale = math.sqrt(cfg.hidden)

    def step(token, pos, cache, beam_state):
        cross_kv, attend = beam_state
        pos_id = pos + 1 + cfg.pad_token
        x = params["shared"][token][:, None, :] * scale + dec["pos"][pos_id][None, None, :]
        new_cache = []
        for block, c, (ck, cv) in zip(dec["layers"], cache, cross_kv):
            h = layer_norm(block["self_attn_ln"], x)
            attn, k, v = mha_step(block["self_attn"], cfg.text_attn, h,
                                  c["k"], c["v"], pos)
            x = x + attn
            new_cache.append({"k": k, "v": v})
            h = layer_norm(block["cross_attn_ln"], x)
            x = x + mha(block["cross_attn"], cfg.text_attn, h, None,
                        precomputed_kv=(ck, cv), mask=attend)
            h = layer_norm(block["mlp_ln"], x)
            x = x + _relu_mlp(block["mlp"], h)
        x = layer_norm(dec["ln"], x)
        return x[:, 0, :] @ params["shared"].T, new_cache

    prompt = jnp.concatenate([
        jnp.full((b, 1), cfg.decoder_start_token, jnp.int32),
        jnp.broadcast_to(jnp.asarray(tgt_lang_token, jnp.int32), (b,))[:, None],
    ], axis=1)
    max_len = 2 + max_new_tokens
    bc = BeamConfig(eos_token=cfg.eos_token, pad_token=cfg.pad_token,
                    max_len=max_len, num_beams=num_beams)

    def cache_for(n):
        shape = (n, max_len, cfg.decoder_heads, cfg.hidden // cfg.decoder_heads)
        return [{"k": jnp.zeros(shape, enc.dtype), "v": jnp.zeros(shape, enc.dtype)}
                for _ in range(cfg.decoder_layers)]

    if num_beams <= 1:
        return greedy_search(step, prompt, cache_for(b), (cross, enc_attend), bc)
    return beam_search(step, prompt, cache_for(b * num_beams), (cross, enc_attend), bc)


# ------------------------------------------------------------------ t2u model


def _init_t2u_enc_block(key, cfg: SeamlessConfig) -> Params:
    ks = jax.random.split(key, 2)
    return {
        "self_attn": init_attention(ks[0], cfg.t2u_attn),
        "self_attn_ln": init_layer_norm(cfg.hidden),
        "mlp": init_mlp(ks[1], cfg.hidden, cfg.t2u_ffn),
        "mlp_ln": init_layer_norm(cfg.hidden),
    }


def _init_t2u_dec_layer(key, cfg: SeamlessConfig) -> Params:
    ks = jax.random.split(key, 3)
    return {
        "attn": init_attention(ks[0], cfg.t2u_attn),
        "attn_ln": init_layer_norm(cfg.hidden),
        "conv1": _init_conv(ks[1], 7, cfg.hidden, cfg.hidden),
        "conv2": _init_conv(ks[2], 7, cfg.hidden, cfg.hidden),
        "conv_ln": init_layer_norm(cfg.hidden),
    }


def _init_variance_predictor(key, embed: int, hidden: int, kernel: int) -> Params:
    ks = jax.random.split(key, 3)
    return {
        "conv1": _init_conv(ks[0], kernel, embed, hidden),
        "ln1": init_layer_norm(hidden),
        "conv2": _init_conv(ks[1], kernel, hidden, hidden),
        "ln2": init_layer_norm(hidden),
        "proj": init_dense(ks[2], hidden, 1),
    }


def _variance_predictor(p: Params, x: jnp.ndarray,
                        pad_mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """[B,T,C] → log-durations [B,T] (SeamlessM4Tv2VariancePredictor)."""
    if pad_mask is not None:
        x = jnp.where(pad_mask[..., None], x, 0.0)
    x = jax.nn.relu(_conv1d(p["conv1"], x, pad="same"))
    x = layer_norm(p["ln1"], x)
    if pad_mask is not None:
        x = jnp.where(pad_mask[..., None], x, 0.0)
    x = jax.nn.relu(_conv1d(p["conv2"], x, pad="same"))
    x = layer_norm(p["ln2"], x)
    return dense(p["proj"], x)[..., 0]


def hard_upsample(h: jnp.ndarray, counts: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """torch repeat_interleave with static output shape: position j maps to
    the segment whose cumulative count first exceeds j (positions beyond
    sum(counts) hold the last row — callers mask by valid length)."""
    ends = jnp.cumsum(counts, axis=1)                          # [B, T]
    j = jnp.arange(out_len)
    idx = jnp.sum(j[None, :, None] >= ends[:, None, :], axis=-1)
    idx = jnp.minimum(idx, h.shape[1] - 1)
    return jnp.take_along_axis(h, idx[..., None], axis=1)


def t2u_encode(params: Params, cfg: SeamlessConfig, embeds: jnp.ndarray,
               mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """t2u encoder over text-decoder hidden states (no embed/positions —
    SeamlessM4Tv2Encoder with is_t2u_encoder=True)."""
    enc = params["t2u"]["encoder"]
    attend = None if mask is None else mask[:, None, None, :]
    x = embeds
    for block in enc["layers"]:
        h = layer_norm(block["self_attn_ln"], x)
        x = x + mha(block["self_attn"], cfg.t2u_attn, h, h, mask=attend)
        h = layer_norm(block["mlp_ln"], x)
        x = x + _relu_mlp(block["mlp"], h)
    return layer_norm(enc["ln"], x)


def t2u_nar_decode(
    params: Params,
    cfg: SeamlessConfig,
    enc_hidden: jnp.ndarray,       # [B, T_text, H] (t2u encoder output)
    char_ids: jnp.ndarray,         # [B, C]
    char_counts: jnp.ndarray,      # [B, T_text] chars per text id
    *,
    max_units: int,
) -> Dict[str, jnp.ndarray]:
    """NAR unit decoding (SeamlessM4Tv2TextToUnitDecoder.forward).
    Returns unit logits [B, max_units, t2u_vocab], the unit valid mask and
    the per-char durations."""
    dec = params["t2u"]["decoder"]
    scale = math.sqrt(cfg.hidden)
    n_chars = char_ids.shape[1]
    char_mask = lengths_mask(jnp.sum(char_counts, axis=1), n_chars)

    char_hidden = hard_upsample(enc_hidden, char_counts, n_chars)
    # sequential position ids starting at padding_idx+1 (inputs_embeds path)
    pos_ids = jnp.arange(cfg.t2u_pad + 1, n_chars + cfg.t2u_pad + 1)
    char_pos = dec["pos_alpha_char"] * dec["pos"][pos_ids][None]
    char_hidden = dec["embed_char"][char_ids] * scale + char_pos + char_hidden

    log_dur = _variance_predictor(dec["dur"], char_hidden, char_mask)
    dur = jnp.maximum(jnp.round(jnp.expm1(log_dur)), 1.0).astype(jnp.int32)
    dur = jnp.where(char_mask, dur, 0)

    x = hard_upsample(char_hidden, dur, max_units)
    upos = jnp.arange(cfg.t2u_pad + 1, max_units + cfg.t2u_pad + 1)
    x = x + dec["pos_alpha"] * dec["pos"][upos][None]

    unit_lengths = jnp.sum(dur, axis=1)
    pad_mask = lengths_mask(unit_lengths, max_units)
    attend = pad_mask[:, None, None, :]
    for layer in dec["layers"]:
        # post-LN FFT block (TextToUnitDecoderLayer.forward:1214-1242)
        attn = mha(layer["attn"], cfg.t2u_attn, x, x, mask=attend)
        x = layer_norm(layer["attn_ln"], x + attn)
        residual = x
        h = jnp.where(pad_mask[..., None], x, 0.0)
        h = _conv1d(layer["conv1"], h, pad="same")
        h = jnp.where(pad_mask[..., None], h, 0.0)
        h = jax.nn.relu(h)
        h = _conv1d(layer["conv2"], h, pad="same")
        x = layer_norm(layer["conv_ln"], residual + h)
    x = layer_norm(dec["ln"], x)
    logits = x @ dec["embed"].T                       # lm_head tied to embed_tokens
    return {"logits": logits, "padding_mask": pad_mask, "durations": dur,
            "unit_lengths": unit_lengths}


def units_from_logits(cfg: SeamlessConfig, logits: jnp.ndarray,
                      pad_mask: jnp.ndarray) -> jnp.ndarray:
    """argmax units → vocoder ids: EOS/padding → t2u_pad, then subtract the
    control-symbol offset on real units (ForSpeechToSpeech.generate:3883-3892)."""
    unit_ids = jnp.argmax(logits, axis=-1)
    replace = (unit_ids == cfg.t2u_eos) | (~pad_mask)
    unit_ids = jnp.where(replace, cfg.t2u_pad, unit_ids)
    # control symbols below the offset (bos/unk) would go negative — torch
    # would crash there; clamp so weightless random-weight runs stay valid
    return jnp.where(unit_ids == cfg.t2u_pad, unit_ids,
                     jnp.maximum(unit_ids - cfg.vocoder_offset, 0))


# --------------------------------------------------------------- unit vocoder


def _init_hifigan(key, cfg: SeamlessConfig) -> Params:
    ks = iter(jax.random.split(key, 256))
    in_dim = cfg.unit_embed_dim + cfg.lang_embed_dim + cfg.spkr_embed_dim
    ch = cfg.upsample_initial_channel
    p: Params = {"conv_pre": _init_conv(next(ks), 7, in_dim, ch), "ups": [], "res": []}
    for i, (r, kw) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernels)):
        out_ch = ch // (2 ** (i + 1))
        p["ups"].append(_init_conv(next(ks), kw, ch // (2 ** i), out_ch))
        stage = []
        for k, dils in zip(cfg.resblock_kernels, cfg.resblock_dilations):
            stage.append([{"c1": _init_conv(next(ks), k, out_ch, out_ch),
                           "c2": _init_conv(next(ks), k, out_ch, out_ch)}
                          for _ in dils])
        p["res"].append(stage)
    p["conv_post"] = _init_conv(next(ks), 7, ch // (2 ** len(cfg.upsample_rates)), 1)
    return p


def _hifigan(params: Params, cfg: SeamlessConfig, x: jnp.ndarray) -> jnp.ndarray:
    """[B, T, in_dim] → waveform [B, T × hop]. Inner leaky slope is
    config (0.1); the final pre-conv_post activation is torch's default
    0.01 (SeamlessM4Tv2HifiGan.forward:2470)."""
    lrelu = lambda v: jax.nn.leaky_relu(v, cfg.leaky_slope)
    x = _conv1d(params["conv_pre"], x, pad=3)
    for up, stage, rate in zip(params["ups"], params["res"], cfg.upsample_rates):
        x = _conv_transpose1d(up, lrelu(x), rate)
        acc = None
        for block, dils in zip(stage, cfg.resblock_dilations):
            h = x
            for unit, d in zip(block, dils):
                y = _conv1d(unit["c1"], lrelu(h), pad="same", dilation=d)
                y = _conv1d(unit["c2"], lrelu(y), pad="same")
                h = h + y
            acc = h if acc is None else acc + h
        x = acc / len(stage)
    x = jnp.tanh(_conv1d(params["conv_post"], jax.nn.leaky_relu(x, 0.01), pad=3))
    return x[..., 0]


def vocoder_output_length(cfg: SeamlessConfig, n: jnp.ndarray) -> jnp.ndarray:
    """HiFi-GAN conv-stack length map (_get_output_hifigan_lengths parity —
    with the standard odd-kernel geometry every stage except the upsamplers
    preserves length, so this is n × prod(rates); kept as the explicit
    per-stage recurrence to match HF on unusual configs)."""
    def conv_out(length, k, s, p, d=1):
        return (length + 2 * p - d * (k - 1) - 1) // s + 1

    n = conv_out(n, 7, 1, 3)
    for r, k in zip(cfg.upsample_rates, cfg.upsample_kernels):
        n = (n - 1) * r - 2 * ((k - r) // 2) + (k - 1) + 1
    for _ in cfg.upsample_rates:
        for k, dils in zip(cfg.resblock_kernels, cfg.resblock_dilations):
            for d in dils:
                n = conv_out(n, k, 1, (k - 1) * d // 2, d)
            for _ in dils:
                n = conv_out(n, k, 1, (k - 1) // 2, 1)
    return conv_out(n, 7, 1, 3)


def code_hifigan(
    params: Params,
    cfg: SeamlessConfig,
    unit_ids: jnp.ndarray,          # [B, T] vocoder unit ids (pad = t2u_pad)
    spkr_id: jnp.ndarray,           # [B] or scalar
    lang_id: jnp.ndarray,           # [B] or scalar
    *,
    max_frames: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """SeamlessM4Tv2CodeHifiGan.forward: duration-upsampled unit embeddings +
    speaker/language channels → waveform [B, max_frames × hop], lengths [B]."""
    voc = params["vocoder"]
    b, t = unit_ids.shape
    ue = voc["unit_embed"][unit_ids]                           # [B, T, unit_dim]
    log_dur = _variance_predictor(voc["dur"], ue, None)
    dur = jnp.maximum(jnp.round(jnp.expm1(log_dur)), 1.0).astype(jnp.int32)
    x = hard_upsample(ue, dur, max_frames)

    spkr = voc["spkr_embed"][jnp.broadcast_to(jnp.asarray(spkr_id, jnp.int32), (b,))]
    lang = voc["lang_embed"][jnp.broadcast_to(jnp.asarray(lang_id, jnp.int32), (b,))]
    x = jnp.concatenate([
        jnp.broadcast_to(lang[:, None, :], (b, max_frames, lang.shape[-1])),
        x,
        jnp.broadcast_to(spkr[:, None, :], (b, max_frames, spkr.shape[-1])),
    ], axis=-1)
    wave = _hifigan(voc["hifi"], cfg, x)

    # HF length contract: cumsum(dur) gathered at the (clamped) non-pad unit
    # count — includes one pad slot's duration, mirrored deliberately
    # (_get_dur_output_lengths:2509-2521).
    unit_len = jnp.clip(jnp.sum((unit_ids != cfg.t2u_pad).astype(jnp.int32), axis=1),
                        0, t - 1)
    cum = jnp.cumsum(dur, axis=1)
    frame_len = jnp.take_along_axis(cum, unit_len[:, None], axis=1)[:, 0]
    return wave, vocoder_output_length(cfg, frame_len)


# ------------------------------------------------------------------ host: chars


def char_inputs_for_t2u(
    t2u_input_ids: np.ndarray,
    id_to_text: Dict[str, str],
    char_to_id: Dict[str, int],
    *,
    pad_token_id: int = 0,
    unk_token_id: int = 1,
    max_chars: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side char preparation mirroring the HF generate glue
    (_indices_to_subwords → _count_character_length_in_subword
    (merge_space_with_prev_subword=False) → zero-pad both ends →
    _get_char_input_ids). Returns (char_ids [B, C], char_counts [B, T+2])."""
    ids = np.asarray(t2u_input_ids)
    batch, seq = ids.shape
    space = "▁"

    subwords_batch: List[List[str]] = [
        [str(id_to_text.get(str(int(ids[b, i])))) for i in range(seq)]
        for b in range(batch)
    ]
    counts = np.zeros_like(ids)
    for b in range(batch):
        n = int((ids[b] != pad_token_id).sum())
        subs = subwords_batch[b][:n]
        next_space = [len(subs[i + 1]) > 1 and subs[i + 1][0] == space
                      if i < len(subs) - 1 else False for i in range(len(subs))]
        is_punc = [len(s) == 1 and not s.isalpha() and not s.isnumeric() and s != space
                   for s in subs]
        for i in range(n):
            if ids[b, i] == pad_token_id:
                break
            if ids[b, i] == unk_token_id:
                clen = 1
            else:
                clen = len(subs[i])
                if is_punc[i] and next_space[i]:
                    clen += 1
                elif i > 0 and is_punc[i - 1] and next_space[i - 1]:
                    clen -= 1
            counts[b, i] = clen

    total = counts.sum(1)
    c = int(total.max()) if max_chars is None else max_chars
    if max_chars is not None:
        # keep counts consistent with the char-id truncation below: a row
        # whose subword chars overflow max_chars must not report counts for
        # dropped ids, or the duration predictor / hard_upsample would align
        # units to pad positions
        for b in range(batch):
            cum = 0
            for i in range(seq):
                take = min(int(counts[b, i]), max(0, c - cum))
                counts[b, i] = take
                cum += take
    char_ids = np.full((batch, c), pad_token_id, np.int32)
    for b in range(batch):
        n = int((ids[b] != pad_token_id).sum())
        pos = 0
        for i in range(n):
            if ids[b, i] == unk_token_id:
                cid = [unk_token_id]
            else:
                cid = [char_to_id.get(ch, unk_token_id)
                       for ch in subwords_batch[b][i]]
            take = cid[: max(0, c - pos)]
            if take:
                char_ids[b, pos:pos + len(take)] = np.asarray(take, np.int32)
            pos += len(cid)
    zero = np.zeros((batch, 1), counts.dtype)
    char_counts = np.concatenate([zero, counts, zero], axis=1)
    return char_ids, char_counts


def byte_char_maps(vocab_size: int) -> Tuple[Dict[str, str], Dict[str, int]]:
    """Weightless fallback maps: token id → 2-char pseudo-subword, chars 'a'-'p'
    (hex nibbles). Keeps the full S2ST graph runnable without the real
    tokenizer's generation-config maps."""
    alphabet = "abcdefghijklmnop"
    id_to_text = {str(i): alphabet[(i >> 4) & 15] + alphabet[i & 15]
                  for i in range(vocab_size)}
    char_to_id = {ch: 2 + i for i, ch in enumerate(alphabet)}
    return id_to_text, char_to_id


# ----------------------------------------------------------------- end-to-end


def translate_s2st(
    params: Params,
    cfg: SeamlessConfig,
    feats: jnp.ndarray,
    feat_mask: Optional[jnp.ndarray] = None,
    *,
    tgt_lang_token: int = 0,
    vocoder_lang_id: int = 0,
    spkr_id: int = 0,
    num_beams: int = 5,
    max_text_tokens: int = 64,
    max_chars: int = 256,
    max_units: int = 512,
    id_to_text: Optional[Dict[str, str]] = None,
    char_to_id: Optional[Dict[str, int]] = None,
) -> Dict[str, Any]:
    """Full direct S2ST (ForSpeechToSpeech.generate parity shape): speech →
    text beam decode → host char alignment → NAR t2u → code HiFi-GAN.

    Host sync happens once (text ids → chars); each side of it is jittable.
    """
    if id_to_text is None or char_to_id is None:
        id_to_text, char_to_id = byte_char_maps(cfg.vocab_size)

    enc, enc_mask = encode_speech(params, cfg, feats, feat_mask)
    sequences = generate_text(params, cfg, enc, enc_mask, tgt_lang_token,
                              num_beams=num_beams, max_new_tokens=max_text_tokens)

    seq_np = np.asarray(sequences)
    t2u_ids = seq_np[:, 2:-1].copy()                 # drop start+lang and last col
    t2u_ids[t2u_ids == cfg.eos_token] = cfg.pad_token
    char_ids, char_counts = char_inputs_for_t2u(
        t2u_ids, id_to_text, char_to_id, pad_token_id=cfg.pad_token,
        max_chars=max_chars)

    dec_in = sequences[:, :-1]
    hidden = text_decoder_hidden(params, cfg, dec_in, enc, enc_mask)
    seq_lens = jnp.sum((dec_in != cfg.pad_token).astype(jnp.int32), axis=1)
    t2u_mask = lengths_mask(seq_lens, dec_in.shape[1])
    t2u_enc = t2u_encode(params, cfg, hidden, t2u_mask)
    nar = t2u_nar_decode(params, cfg, t2u_enc, jnp.asarray(char_ids),
                         jnp.asarray(char_counts), max_units=max_units)
    unit_ids = units_from_logits(cfg, nar["logits"], nar["padding_mask"])
    wave, lengths = code_hifigan(params, cfg, unit_ids, spkr_id, vocoder_lang_id,
                                 max_frames=max_units * 2)
    return {"audio": wave, "waveform_lengths": lengths,
            "text_tokens": sequences, "units": unit_ids,
            "n_units": nar["unit_lengths"]}


# ------------------------------------------------------------------------ init


def init_seamless(key, cfg: SeamlessConfig = SeamlessConfig()) -> Params:
    ks = iter(jax.random.split(key, 64 + cfg.speech_layers + cfg.decoder_layers
                               + cfg.t2u_encoder_layers + cfg.t2u_decoder_layers))
    pos_table = jnp.asarray(m2m100_sinusoids(cfg.max_positions, cfg.hidden,
                                             cfg.pad_token))
    t2u_pos = jnp.asarray(m2m100_sinusoids(cfg.max_positions, cfg.hidden,
                                           cfg.t2u_pad))
    return {
        "speech_encoder": {
            "fp": {"ln": init_layer_norm(cfg.feat_dim),
                   "proj": init_dense(next(ks), cfg.feat_dim, cfg.hidden)},
            "layers": [_init_conformer_layer(next(ks), cfg)
                       for _ in range(cfg.speech_layers)],
            "ln": init_layer_norm(cfg.hidden),
            "intermediate_ffn": init_mlp(next(ks), cfg.hidden, cfg.speech_ffn),
            "adapter": [_init_adapter_layer(next(ks), cfg)
                        for _ in range(cfg.adapter_layers)],
            "inner_ln": init_layer_norm(cfg.hidden),
        },
        "shared": jax.random.normal(next(ks), (cfg.vocab_size, cfg.hidden)) * 0.02,
        "text_decoder": {
            "pos": pos_table,
            "layers": [_init_text_block(next(ks), cfg)
                       for _ in range(cfg.decoder_layers)],
            "ln": init_layer_norm(cfg.hidden),
        },
        "t2u": {
            "encoder": {
                "layers": [_init_t2u_enc_block(next(ks), cfg)
                           for _ in range(cfg.t2u_encoder_layers)],
                "ln": init_layer_norm(cfg.hidden),
            },
            "decoder": {
                "embed": jax.random.normal(next(ks), (cfg.t2u_vocab, cfg.hidden)) * 0.02,
                "embed_char": jax.random.normal(next(ks), (cfg.char_vocab, cfg.hidden)) * 0.02,
                "pos": t2u_pos,
                "pos_alpha": jnp.ones((1,)),
                "pos_alpha_char": jnp.ones((1,)),
                "dur": _init_variance_predictor(next(ks), cfg.var_embed_dim,
                                                cfg.var_hidden_dim, cfg.var_kernel),
                "layers": [_init_t2u_dec_layer(next(ks), cfg)
                           for _ in range(cfg.t2u_decoder_layers)],
                "ln": init_layer_norm(cfg.hidden),
            },
        },
        "vocoder": {
            "dur": _init_variance_predictor(next(ks), cfg.unit_embed_dim,
                                            cfg.unit_embed_dim, cfg.var_kernel),
            "unit_embed": jax.random.normal(next(ks), (cfg.unit_vocab_vocoder,
                                                       cfg.unit_embed_dim)) * 0.02,
            "spkr_embed": jax.random.normal(next(ks), (cfg.num_spkrs,
                                                       cfg.spkr_embed_dim)) * 0.02,
            "lang_embed": jax.random.normal(next(ks), (cfg.num_langs,
                                                       cfg.lang_embed_dim)) * 0.02,
            "hifi": _init_hifigan(next(ks), cfg),
        },
    }


# ------------------------------------------------------------------ converter


def _t2n(x):
    return np.asarray(x.detach().cpu().numpy()) if hasattr(x, "detach") else np.asarray(x)


def _ln_from(state, name) -> Params:
    return {"scale": t2j(state[f"{name}.weight"]), "bias": t2j(state[f"{name}.bias"])}


def _ffn_from(state, name) -> Params:
    """SeamlessM4Tv2ConformerFeedForward → mlp tree."""
    return {"fc1": linear_from_torch(state[f"{name}.intermediate_dense.weight"],
                                     state[f"{name}.intermediate_dense.bias"]),
            "fc2": linear_from_torch(state[f"{name}.output_dense.weight"],
                                     state[f"{name}.output_dense.bias"])}


def _conformer_attn_from(state, name) -> Params:
    return {"q": linear_from_torch(state[f"{name}.linear_q.weight"],
                                   state[f"{name}.linear_q.bias"]),
            "k": linear_from_torch(state[f"{name}.linear_k.weight"],
                                   state[f"{name}.linear_k.bias"]),
            "v": linear_from_torch(state[f"{name}.linear_v.weight"],
                                   state[f"{name}.linear_v.bias"]),
            "o": linear_from_torch(state[f"{name}.linear_out.weight"],
                                   state[f"{name}.linear_out.bias"])}


def _bart_attn_from(state, name) -> Params:
    return {"q": linear_from_torch(state[f"{name}.q_proj.weight"],
                                   state[f"{name}.q_proj.bias"]),
            "k": linear_from_torch(state[f"{name}.k_proj.weight"],
                                   state[f"{name}.k_proj.bias"]),
            "v": linear_from_torch(state[f"{name}.v_proj.weight"],
                                   state[f"{name}.v_proj.bias"]),
            "o": linear_from_torch(state[f"{name}.out_proj.weight"],
                                   state[f"{name}.out_proj.bias"])}


def _conv_from(state, name, *, bias=True) -> Params:
    w = _t2n(state[f"{name}.weight"])                  # [O, I/g, W]
    p = {"kernel": jnp.asarray(w.transpose(2, 1, 0))}  # HIO
    if bias:
        p["bias"] = t2j(state[f"{name}.bias"])
    return p


def _convt_from(state, name) -> Params:
    w = _t2n(state[f"{name}.weight"])                  # ConvT: [I, O, W]
    return {"kernel": jnp.asarray(w.transpose(2, 0, 1)),
            "bias": t2j(state[f"{name}.bias"])}


def _vp_from(state, name) -> Params:
    return {
        "conv1": _conv_from(state, f"{name}.conv1"),
        "ln1": _ln_from(state, f"{name}.ln1"),
        "conv2": _conv_from(state, f"{name}.conv2"),
        "ln2": _ln_from(state, f"{name}.ln2"),
        "proj": linear_from_torch(state[f"{name}.proj.weight"],
                                  state[f"{name}.proj.bias"]),
    }


def from_hf_state_dict(state: Dict[str, Any], cfg: SeamlessConfig) -> Params:
    """SeamlessM4Tv2ForSpeechToSpeech state dict → param tree.

    Validated by random-weight torch-mirror parity in
    tests/test_seamless_convert.py (speech encoder / text decoder / t2u /
    vocoder each within 2e-4 at fp32; greedy text decode token-exact)."""
    def conformer_layer(base: str) -> Params:
        return {
            "ffn1_ln": _ln_from(state, f"{base}.ffn1_layer_norm"),
            "ffn1": _ffn_from(state, f"{base}.ffn1"),
            "attn_ln": _ln_from(state, f"{base}.self_attn_layer_norm"),
            "attn": _conformer_attn_from(state, f"{base}.self_attn"),
            "dist_embed": t2j(state[f"{base}.self_attn.distance_embedding.weight"]),
            "conv_ln": _ln_from(state, f"{base}.conv_module.layer_norm"),
            "pw1": _conv_from(state, f"{base}.conv_module.pointwise_conv1", bias=False),
            "dw": _conv_from(state, f"{base}.conv_module.depthwise_conv", bias=False),
            "dw_ln": _ln_from(state, f"{base}.conv_module.depthwise_layer_norm"),
            "pw2": _conv_from(state, f"{base}.conv_module.pointwise_conv2", bias=False),
            "ffn2_ln": _ln_from(state, f"{base}.ffn2_layer_norm"),
            "ffn2": _ffn_from(state, f"{base}.ffn2"),
            "final_ln": _ln_from(state, f"{base}.final_layer_norm"),
        }

    def adapter_layer(base: str) -> Params:
        return {
            "residual_ln": _ln_from(state, f"{base}.residual_layer_norm"),
            "residual_conv": _conv_from(state, f"{base}.residual_conv"),
            "attn_ln": _ln_from(state, f"{base}.self_attn_layer_norm"),
            "attn_conv": _conv_from(state, f"{base}.self_attn_conv"),
            "attn": _conformer_attn_from(state, f"{base}.self_attn"),
            "ffn_ln": _ln_from(state, f"{base}.ffn_layer_norm"),
            "ffn": _ffn_from(state, f"{base}.ffn"),
        }

    def text_block(base: str) -> Params:
        return {
            "self_attn": _bart_attn_from(state, f"{base}.self_attn"),
            "self_attn_ln": _ln_from(state, f"{base}.self_attn_layer_norm"),
            "cross_attn": _bart_attn_from(state, f"{base}.cross_attention"),
            "cross_attn_ln": _ln_from(state, f"{base}.cross_attention_layer_norm"),
            "mlp": {"fc1": linear_from_torch(state[f"{base}.ffn.fc1.weight"],
                                             state[f"{base}.ffn.fc1.bias"]),
                    "fc2": linear_from_torch(state[f"{base}.ffn.fc2.weight"],
                                             state[f"{base}.ffn.fc2.bias"])},
            "mlp_ln": _ln_from(state, f"{base}.ffn_layer_norm"),
        }

    def t2u_enc_block(base: str) -> Params:
        return {
            "self_attn": _bart_attn_from(state, f"{base}.self_attn"),
            "self_attn_ln": _ln_from(state, f"{base}.self_attn_layer_norm"),
            "mlp": {"fc1": linear_from_torch(state[f"{base}.ffn.fc1.weight"],
                                             state[f"{base}.ffn.fc1.bias"]),
                    "fc2": linear_from_torch(state[f"{base}.ffn.fc2.weight"],
                                             state[f"{base}.ffn.fc2.bias"])},
            "mlp_ln": _ln_from(state, f"{base}.ffn_layer_norm"),
        }

    def t2u_dec_layer(base: str) -> Params:
        return {
            "attn": _bart_attn_from(state, f"{base}.self_attn"),
            "attn_ln": _ln_from(state, f"{base}.self_attn_layer_norm"),
            "conv1": _conv_from(state, f"{base}.conv1"),
            "conv2": _conv_from(state, f"{base}.conv2"),
            "conv_ln": _ln_from(state, f"{base}.conv_layer_norm"),
        }

    se = "speech_encoder"
    t2u = "t2u_model.model"
    hifi_p: Params = {
        "conv_pre": _conv_from(state, "vocoder.hifi_gan.conv_pre"),
        "ups": [], "res": [],
        "conv_post": _conv_from(state, "vocoder.hifi_gan.conv_post"),
    }
    n_kernels = len(cfg.resblock_kernels)
    for i in range(len(cfg.upsample_rates)):
        hifi_p["ups"].append(_convt_from(state, f"vocoder.hifi_gan.upsampler.{i}"))
        stage = []
        for j in range(n_kernels):
            base = f"vocoder.hifi_gan.resblocks.{i * n_kernels + j}"
            block = [{"c1": _conv_from(state, f"{base}.convs1.{d}"),
                      "c2": _conv_from(state, f"{base}.convs2.{d}")}
                     for d in range(len(cfg.resblock_dilations[j]))]
            stage.append(block)
        hifi_p["res"].append(stage)

    return {
        "speech_encoder": {
            "fp": {"ln": _ln_from(state, f"{se}.feature_projection.layer_norm"),
                   "proj": linear_from_torch(
                       state[f"{se}.feature_projection.projection.weight"],
                       state[f"{se}.feature_projection.projection.bias"])},
            "layers": [conformer_layer(f"{se}.encoder.layers.{i}")
                       for i in range(cfg.speech_layers)],
            "ln": _ln_from(state, f"{se}.encoder.layer_norm"),
            "intermediate_ffn": _ffn_from(state, f"{se}.intermediate_ffn"),
            "adapter": [adapter_layer(f"{se}.adapter.layers.{i}")
                        for i in range(cfg.adapter_layers)],
            "inner_ln": _ln_from(state, f"{se}.inner_layer_norm"),
        },
        "shared": t2j(state["shared.weight"]),
        "text_decoder": {
            "pos": jnp.asarray(m2m100_sinusoids(cfg.max_positions, cfg.hidden,
                                                cfg.pad_token)),
            "layers": [text_block(f"text_decoder.layers.{i}")
                       for i in range(cfg.decoder_layers)],
            "ln": _ln_from(state, "text_decoder.layer_norm"),
        },
        "t2u": {
            "encoder": {
                "layers": [t2u_enc_block(f"{t2u}.encoder.layers.{i}")
                           for i in range(cfg.t2u_encoder_layers)],
                "ln": _ln_from(state, f"{t2u}.encoder.layer_norm"),
            },
            "decoder": {
                "embed": t2j(state[f"{t2u}.decoder.embed_tokens.weight"]),
                "embed_char": t2j(state[f"{t2u}.decoder.embed_char.weight"]),
                "pos": jnp.asarray(m2m100_sinusoids(cfg.max_positions, cfg.hidden,
                                                    cfg.t2u_pad)),
                "pos_alpha": t2j(state[f"{t2u}.decoder.pos_emb_alpha"]),
                "pos_alpha_char": t2j(state[f"{t2u}.decoder.pos_emb_alpha_char"]),
                "dur": _vp_from(state, f"{t2u}.decoder.duration_predictor"),
                "layers": [t2u_dec_layer(f"{t2u}.decoder.layers.{i}")
                           for i in range(cfg.t2u_decoder_layers)],
                "ln": _ln_from(state, f"{t2u}.decoder.layer_norm"),
            },
        },
        "vocoder": {
            "dur": _vp_from(state, "vocoder.dur_predictor"),
            "unit_embed": t2j(state["vocoder.unit_embedding.weight"]),
            "spkr_embed": t2j(state["vocoder.speaker_embedding.weight"]),
            "lang_embed": t2j(state["vocoder.language_embedding.weight"]),
            "hifi": hifi_p,
        },
    }
