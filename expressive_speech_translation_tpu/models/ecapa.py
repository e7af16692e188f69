"""ECAPA-TDNN speaker embeddings + cosine similarity — checkpoint-exact.

Replaces the SpeechBrain ``spkrec-ecapa-voxceleb`` dependency
(services/voice_similarity_analyser.py:26-33: 192-d embeddings, cosine score;
Docker/similarity_api.py /compare-voices/). The architecture matches
speechbrain.lobes.models.ECAPA_TDNN exactly so the released
``embedding_model.ckpt`` loads (:func:`from_speechbrain_state_dict`):

- blocks[0]: TDNNBlock(n_mels → C, k5) — conv → ReLU → BatchNorm (running
  stats at inference).
- blocks[1..3]: SERes2NetBlock(C, scale=8, dilations 2/3/4): 1×1 TDNN →
  Res2Net hierarchy (scale−1 dilated k3 TDNNBlocks, group i input =
  split_i (+ prev output for i>1)) → 1×1 TDNN → SE gate (masked time-mean →
  conv-ReLU-conv-sigmoid → x·s) → +residual.
- mfa: TDNNBlock(3C → mfa_out, k1) over the concat of the three SE blocks.
- asp: attentive statistics pooling with global context (x ⊕ μ ⊕ σ → TDNN →
  tanh → conv → masked softmax → weighted μ,σ), then BatchNorm, then the
  192-d fc conv.

All convs are [width, in, out] NHC convs → XLA maps them onto the MXU.
Input features: 80-mel kaldi fbank (ops/mel.kaldi_fbank at 16 kHz) with
per-utterance mean subtraction (speechbrain InputNormalization).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from .common import Params


@dataclasses.dataclass(frozen=True)
class EcapaConfig:
    n_mels: int = 80
    channels: int = 1024       # spkrec-ecapa-voxceleb: [1024]×4
    mfa_out: int = 3072        # channels[-1]
    bottleneck: int = 128      # SE bottleneck (se_channels)
    scale: int = 8             # Res2Net scale
    embed_dim: int = 192
    attn_channels: int = 128


class _Keys:
    def __init__(self, key):
        self._key = key

    def __call__(self):
        self._key, sub = jax.random.split(self._key)
        return sub


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
    return {"scale": jnp.ones((ch,)), "bias": jnp.zeros((ch,)),
            "mean": jnp.zeros((ch,)), "var": jnp.ones((ch,))}


def _bn(p, x):
    """BatchNorm1d at inference: running statistics (torch eps 1e-5)."""
    return ((x - p["mean"]) * jax.lax.rsqrt(p["var"] + 1e-5)) * p["scale"] + p["bias"]


def _init_tdnn(key, width, in_ch, out_ch):
    return {"conv": _init_conv(key, width, in_ch, out_ch), "bn": _init_bn(out_ch)}


def _tdnn(p, x, mask, *, dilation=1):
    """TDNNBlock: conv → ReLU → BN; padded slots re-zeroed so kernel support
    never leaks padding into later layers."""
    h = _bn(p["bn"], jax.nn.relu(_conv1d(p["conv"], x, dilation=dilation)))
    return h * mask[..., None]


def _init_se_res2(key, cfg: EcapaConfig) -> Params:
    ks = _Keys(key)
    width = cfg.channels // cfg.scale
    return {
        "tdnn1": _init_tdnn(ks(), 1, cfg.channels, cfg.channels),
        "res2": [_init_tdnn(ks(), 3, width, width) for _ in range(cfg.scale - 1)],
        "tdnn2": _init_tdnn(ks(), 1, cfg.channels, cfg.channels),
        "se_conv1": _init_conv(ks(), 1, cfg.channels, cfg.bottleneck),
        "se_conv2": _init_conv(ks(), 1, cfg.bottleneck, cfg.channels),
    }


def init_ecapa(key, cfg: EcapaConfig = EcapaConfig()) -> Params:
    ks = _Keys(key)
    c = cfg.channels
    return {
        "block0": _init_tdnn(ks(), 5, cfg.n_mels, c),
        "blocks": [_init_se_res2(ks(), cfg) for _ in range(3)],
        "mfa": _init_tdnn(ks(), 1, 3 * c, cfg.mfa_out),
        "asp_tdnn": _init_tdnn(ks(), 1, 3 * cfg.mfa_out, cfg.attn_channels),
        "asp_conv": _init_conv(ks(), 1, cfg.attn_channels, cfg.mfa_out),
        "asp_bn": _init_bn(2 * cfg.mfa_out),
        "fc": _init_conv(ks(), 1, 2 * cfg.mfa_out, cfg.embed_dim),
    }


def _se_res2_block(p: Params, cfg: EcapaConfig, x: jnp.ndarray, mask: jnp.ndarray, dilation: int) -> jnp.ndarray:
    """SERes2NetBlock (speechbrain): tdnn1 → res2net → tdnn2 → SE → +residual."""
    residual = x
    h = _tdnn(p["tdnn1"], x, mask)
    # Res2Net hierarchy: group 0 passes through; group 1 convolves its split;
    # groups ≥2 convolve (split_i + previous group's output).
    splits = jnp.split(h, cfg.scale, axis=-1)
    outs = [splits[0]]
    prev = None
    for i in range(1, cfg.scale):
        inp = splits[i] if prev is None else splits[i] + prev
        prev = _tdnn(p["res2"][i - 1], inp, mask, dilation=dilation)
        outs.append(prev)
    h = jnp.concatenate(outs, axis=-1)
    h = _tdnn(p["tdnn2"], h, mask)
    # SE gate over the masked time mean
    denom = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)[..., None]
    s = jnp.sum(h * mask[..., None], axis=1, keepdims=True) / denom
    s = jax.nn.sigmoid(_conv1d(p["se_conv2"], jax.nn.relu(_conv1d(p["se_conv1"], s))))
    return h * s + residual


def embed(params: Params, cfg: EcapaConfig, feats: jnp.ndarray, mask: jnp.ndarray,
          *, normalize: bool = True) -> jnp.ndarray:
    """feats [B, T, n_mels] (+mask [B, T]) → embeddings [B, 192]
    (L2-normalised by default; ``normalize=False`` gives speechbrain's raw
    output — cosine scoring is identical either way)."""
    m = mask.astype(feats.dtype)
    x = _tdnn(params["block0"], feats * m[..., None], m)
    feats_per_block = []
    # dilations 2/3/4 are static (stored in code, not params — params must stay
    # a pure array pytree for jit)
    for block, dilation in zip(params["blocks"], (2, 3, 4)):
        x = _se_res2_block(block, cfg, x, m, dilation)
        feats_per_block.append(x)
    h = _tdnn(params["mfa"], jnp.concatenate(feats_per_block, axis=-1), m)

    # attentive statistics pooling with global-context concat
    denom = jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0)[..., None]
    w_uniform = m[..., None] / denom
    mu = jnp.sum(h * w_uniform, axis=1, keepdims=True)
    sg = jnp.sqrt(jnp.clip(
        jnp.sum((h - mu) ** 2 * w_uniform, axis=1, keepdims=True), 1e-12, None))
    ctx = jnp.concatenate(
        [h, jnp.broadcast_to(mu, h.shape), jnp.broadcast_to(sg, h.shape)], axis=-1)
    attn = _conv1d(params["asp_conv"],
                   jnp.tanh(_tdnn(params["asp_tdnn"], ctx, m)))
    attn = jnp.where(m[..., None] > 0, attn, -jnp.inf)
    w = jax.nn.softmax(attn, axis=1)
    mean = jnp.sum(w * h, axis=1)
    std = jnp.sqrt(jnp.clip(jnp.sum(w * (h - mean[:, None]) ** 2, axis=1), 1e-12, None))
    pooled = _bn(params["asp_bn"], jnp.concatenate([mean, std], axis=-1))
    e = _conv1d(params["fc"], pooled[:, None, :])[:, 0]
    if normalize:
        e = e / jnp.linalg.norm(e, axis=-1, keepdims=True)
    return e


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


# ------------------------------------------------------------------ converter


def _t(w) -> np.ndarray:
    import torch

    if isinstance(w, torch.Tensor):
        w = w.detach().to(torch.float32).cpu().numpy()
    return np.asarray(w, np.float32)


def _conv_p(sd, prefix) -> Params:
    w = _t(sd[f"{prefix}.weight"])          # [out, in, k] → [k, in, out]
    p = {"kernel": jnp.asarray(w.transpose(2, 1, 0))}
    p["bias"] = (jnp.asarray(_t(sd[f"{prefix}.bias"]))
                 if f"{prefix}.bias" in sd else jnp.zeros((w.shape[0],)))
    return p


def _bn_p(sd, prefix) -> Params:
    return {"scale": jnp.asarray(_t(sd[f"{prefix}.weight"])),
            "bias": jnp.asarray(_t(sd[f"{prefix}.bias"])),
            "mean": jnp.asarray(_t(sd[f"{prefix}.running_mean"])),
            "var": jnp.asarray(_t(sd[f"{prefix}.running_var"]))}


def _tdnn_p(sd, prefix) -> Params:
    return {"conv": _conv_p(sd, f"{prefix}.conv.conv"),
            "bn": _bn_p(sd, f"{prefix}.norm.norm")}


def from_speechbrain_state_dict(sd: Dict[str, Any], cfg: EcapaConfig) -> Params:
    """speechbrain spkrec-ecapa-voxceleb ``embedding_model.ckpt`` → params.
    (speechbrain wraps torch convs/norms one level deep: ``…conv.conv``,
    ``…norm.norm``; an ``embedding_model.`` prefix from a full-model save is
    stripped.)"""
    sd = {k[16:] if k.startswith("embedding_model.") else k: v
          for k, v in sd.items()}
    return {
        "block0": _tdnn_p(sd, "blocks.0"),
        "blocks": [{
            "tdnn1": _tdnn_p(sd, f"blocks.{b}.tdnn1"),
            "res2": [_tdnn_p(sd, f"blocks.{b}.res2net_block.blocks.{i}")
                     for i in range(cfg.scale - 1)],
            "tdnn2": _tdnn_p(sd, f"blocks.{b}.tdnn2"),
            "se_conv1": _conv_p(sd, f"blocks.{b}.se_block.conv1.conv"),
            "se_conv2": _conv_p(sd, f"blocks.{b}.se_block.conv2.conv"),
        } for b in (1, 2, 3)],
        "mfa": _tdnn_p(sd, "mfa"),
        "asp_tdnn": _tdnn_p(sd, "asp.tdnn"),
        "asp_conv": _conv_p(sd, "asp.conv.conv"),
        "asp_bn": _bn_p(sd, "asp_bn.norm"),
        "fc": _conv_p(sd, "fc.conv"),
    }
