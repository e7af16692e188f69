"""ECAPA-TDNN speaker embeddings + cosine similarity.

Replaces the SpeechBrain ``spkrec-ecapa-voxceleb`` dependency
(services/voice_similarity_analyser.py:26-33: 192-d embeddings, cosine score;
Docker/similarity_api.py /compare-voices/). Full architecture: conv1d frontend,
three SE-Res2Blocks with dilations 2/3/4, multi-layer feature aggregation,
channel- and context-dependent attentive statistics pooling, 192-d projection.

All convs are [width, in, out] NHC convs → XLA maps them onto the MXU.
Input features: 80-mel kaldi fbank (ops/mel.kaldi_fbank at 16 kHz).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from .common import Params, dense, init_dense


@dataclasses.dataclass(frozen=True)
class EcapaConfig:
    n_mels: int = 80
    channels: int = 512
    bottleneck: int = 128      # SE bottleneck
    scale: int = 8             # Res2Net scale
    embed_dim: int = 192
    attn_channels: int = 128


def _init_conv(key, width, in_ch, out_ch):
    scale = 1.0 / np.sqrt(in_ch * width)
    return {
        "kernel": jax.random.uniform(key, (width, in_ch, out_ch), jnp.float32, -scale, scale),
        "bias": jnp.zeros((out_ch,)),
    }


def _conv1d(p, x, *, dilation=1):
    x = x.astype(p["kernel"].dtype)
    width = p["kernel"].shape[0]
    pad = dilation * (width - 1) // 2
    return jax.lax.conv_general_dilated(
        x, p["kernel"], (1,), [(pad, pad)], rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
    ) + p["bias"]


def _init_bn(ch):
    return {"scale": jnp.ones((ch,)), "bias": jnp.zeros((ch,))}


def _bn(p, x, mask):
    """Masked batch-norm-as-layer-stat norm (inference-style, per utterance)."""
    denom = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)[..., None]
    mean = jnp.sum(x * mask[..., None], axis=1, keepdims=True) / denom
    var = jnp.sum(((x - mean) * mask[..., None]) ** 2, axis=1, keepdims=True) / denom
    return ((x - mean) * jax.lax.rsqrt(var + 1e-5)) * p["scale"] + p["bias"]


def _init_se_res2(key, cfg: EcapaConfig) -> Params:
    ks = jax.random.split(key, cfg.scale + 4)
    width = cfg.channels // cfg.scale
    return {
        "conv_in": _init_conv(ks[0], 1, cfg.channels, cfg.channels),
        "bn_in": _init_bn(cfg.channels),
        "res2": [_init_conv(ks[1 + i], 3, width, width) for i in range(cfg.scale - 1)],
        "conv_out": _init_conv(ks[cfg.scale], 1, cfg.channels, cfg.channels),
        "bn_out": _init_bn(cfg.channels),
        "se_down": init_dense(ks[cfg.scale + 1], cfg.channels, cfg.bottleneck),
        "se_up": init_dense(ks[cfg.scale + 2], cfg.bottleneck, cfg.channels),
    }


def init_ecapa(key, cfg: EcapaConfig = EcapaConfig()) -> Params:
    ks = jax.random.split(key, 8)
    c = cfg.channels
    return {
        "conv1": _init_conv(ks[0], 5, cfg.n_mels, c),
        "bn1": _init_bn(c),
        "blocks": [_init_se_res2(ks[1 + i], cfg) for i in range(3)],
        "mfa": _init_conv(ks[4], 1, 3 * c, 3 * c),
        "attn_pre": _init_conv(ks[5], 1, 3 * 3 * c, cfg.attn_channels),
        "attn_out": _init_conv(ks[6], 1, cfg.attn_channels, 3 * c),
        "embed": init_dense(ks[7], 6 * c, cfg.embed_dim),
    }


def _se_res2_block(p: Params, cfg: EcapaConfig, x: jnp.ndarray, mask: jnp.ndarray, dilation: int) -> jnp.ndarray:
    """SE-Res2Block: 1×1 → Res2 dilated 3×1 hierarchy → 1×1 → SE; residual."""
    residual = x
    h = jax.nn.relu(_bn(p["bn_in"], _conv1d(p["conv_in"], x), mask)) * mask[..., None]
    # Res2Net: split channels into `scale` groups; group i (>0) convolves
    # (input_i + prev_output) — hierarchical receptive field growth.
    width = cfg.channels // cfg.scale
    splits = jnp.split(h, cfg.scale, axis=-1)
    outs = [splits[0]]
    prev = None
    for i in range(1, cfg.scale):
        inp = splits[i] if prev is None else splits[i] + prev
        prev = jax.nn.relu(_conv1d(p["res2"][i - 1], inp, dilation=dilation)) * mask[..., None]
        outs.append(prev)
    h = jnp.concatenate(outs, axis=-1)
    h = jax.nn.relu(_bn(p["bn_out"], _conv1d(p["conv_out"], h), mask)) * mask[..., None]
    # squeeze-excitation over masked time mean
    denom = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)[..., None]
    s = jnp.sum(h * mask[..., None], axis=1, keepdims=True) / denom
    gate = jax.nn.sigmoid(dense(p["se_up"], jax.nn.relu(dense(p["se_down"], s))))
    return residual + h * gate


def embed(params: Params, cfg: EcapaConfig, feats: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """feats [B, T, n_mels] (+mask [B, T]) → L2-normalised embeddings [B, 192]."""
    m = mask.astype(feats.dtype)
    # zero padded slots after every conv so padding never leaks through
    # kernel support or norm biases (mask-invariance is tested)
    x = jax.nn.relu(_bn(params["bn1"], _conv1d(params["conv1"], feats * m[..., None]), m)) * m[..., None]
    feats_per_block = []
    # dilations 2/3/4 are static (stored in code, not params — params must stay
    # a pure array pytree for jit)
    for block, dilation in zip(params["blocks"], (2, 3, 4)):
        x = _se_res2_block(block, cfg, x, m, dilation)
        feats_per_block.append(x)
    h = jax.nn.relu(_conv1d(params["mfa"], jnp.concatenate(feats_per_block, axis=-1))) * m[..., None]

    # attentive statistics pooling with global-context concat
    denom = jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0)[..., None]
    mu = jnp.sum(h * m[..., None], axis=1, keepdims=True) / denom
    sg = jnp.sqrt(jnp.clip(
        jnp.sum((h - mu) ** 2 * m[..., None], axis=1, keepdims=True) / denom, 1e-9, None
    ))
    t = h.shape[1]
    ctx = jnp.concatenate(
        [h, jnp.broadcast_to(mu, h.shape), jnp.broadcast_to(sg, h.shape)], axis=-1
    )
    attn = _conv1d(params["attn_out"], jnp.tanh(_conv1d(params["attn_pre"], ctx)))
    attn = jnp.where(m[..., None] > 0, attn, -1e9)
    w = jax.nn.softmax(attn, axis=1)
    mean = jnp.sum(w * h, axis=1)
    std = jnp.sqrt(jnp.clip(jnp.sum(w * h**2, axis=1) - mean**2, 1e-9, None))
    e = dense(params["embed"], jnp.concatenate([mean, std], axis=-1))
    return e / jnp.linalg.norm(e, axis=-1, keepdims=True)


def cosine_similarity(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Cosine score in [-1, 1] (voice_similarity_analyser.py:84-100)."""
    a = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    b = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
    return jnp.sum(a * b, axis=-1)


def embed_audio(params: Params, cfg: EcapaConfig, audio_16k: jnp.ndarray) -> jnp.ndarray:
    """[T] or [B, T] 16 kHz waveform → embeddings (fbank frontend included)."""
    from ..ops import kaldi_fbank

    if audio_16k.ndim == 1:
        audio_16k = audio_16k[None]
    feats = kaldi_fbank(audio_16k, sr=16_000, frame_length_ms=25.0, frame_shift_ms=10.0)
    # per-utterance mean norm (speechbrain InputNormalization equivalent)
    feats = feats - jnp.mean(feats, axis=1, keepdims=True)
    mask = jnp.ones(feats.shape[:2], bool)
    return embed(params, cfg, feats, mask)
