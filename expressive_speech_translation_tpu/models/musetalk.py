"""MuseTalk lip-sync: SD AutoencoderKL + single-step conditional UNet.

Replaces the reference's MuseTalk container (Docker/musetalk_api.py +
api_inference_logic.py): VAE-encode 256×256 face crops to latents (:104-116),
batched single-timestep UNet inference conditioned on whisper encoder
features (:118-143, batch 8, ``timesteps = torch.tensor([0])``), VAE-decode,
jaw-mode feathered blending back into frames (:145-170). Face detection /
parsing stays host-side (pipeline layer); this module is the device compute.

Architecture is CHECKPOINT-EXACT (so the published weights load):

- VAE: diffusers ``AutoencoderKL`` at the ``sd-vae-ft-mse`` geometry the
  container downloads — block_out_channels (128, 256, 512, 512), 2 resnets
  per block, mid-block with single-head spatial attention, quant/post-quant
  1×1 convs, scaling factor 0.18215. 256×256×3 → 32×32×4 latents.
- UNet: diffusers ``UNet2DConditionModel`` at MuseTalk's musetalk.json
  geometry — in_channels 8 (masked ⊕ reference latent), cross_attention_dim
  384 (whisper-tiny states), block_out_channels (320, 640, 1280, 1280),
  3×CrossAttnDownBlock2D + DownBlock2D / UpBlock2D + 3×CrossAttnUpBlock2D,
  2 layers per block, 8 heads, GEGLU feed-forwards, sinusoidal+MLP timestep
  embedding (run at the single fixed timestep 0).
- PE: MuseTalk's parameter-free sinusoidal PositionalEncoding over the
  whisper feature windows (:func:`positional_encoding`).

TPU-first execution: NHWC layout (XLA:TPU's native conv layout), bf16
inference policy, fori_loop-batched frame processing with static shapes.
Converters: :func:`vae_from_hf_state_dict` / :func:`unet_from_hf_state_dict`
accept the published torch state dicts (modern and legacy attention naming).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .common import Params, dense, init_dense

VAE_SCALE = 0.18215


@dataclasses.dataclass(frozen=True)
class MuseTalkConfig:
    image_size: int = 256
    latent_channels: int = 4
    vae_channels: Tuple[int, ...] = (128, 256, 512, 512)
    vae_layers: int = 2            # resnets per encoder block (decoder: +1)
    unet_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    unet_layers: int = 2           # resnets per down block (up: +1)
    audio_dim: int = 384           # whisper-tiny encoder width
    audio_ctx: int = 50            # feature steps per video-frame window
    heads: int = 8                 # musetalk.json attention_head_dim=8
    norm_groups: int = 32

    @property
    def time_embed_dim(self) -> int:
        return 4 * self.unet_channels[0]


class _Keys:
    """Lazily split PRNG keys (the param count is config-dependent)."""

    def __init__(self, key):
        self._key = key

    def __call__(self):
        self._key, sub = jax.random.split(self._key)
        return sub


# ------------------------------------------------------------------ primitives


def _init_conv2d(key, width, in_ch, out_ch):
    scale = 1.0 / np.sqrt(in_ch * width * width)
    return {
        "kernel": jax.random.uniform(
            key, (width, width, in_ch, out_ch), jnp.float32, -scale, scale
        ),
        "bias": jnp.zeros((out_ch,)),
    }


def _conv2d(p, x, *, stride=1, pad="same"):
    x = x.astype(p["kernel"].dtype)
    width = p["kernel"].shape[0]
    if pad == "same":
        padding = [((width - 1) // 2, (width - 1) // 2)] * 2
    elif pad == "asym":
        # diffusers VAE Downsample2D: F.pad (0,1,0,1) then stride-2 valid conv
        padding = [(0, 1), (0, 1)]
    else:
        padding = pad
    return jax.lax.conv_general_dilated(
        x, p["kernel"], (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["bias"]


def _init_gn(ch):
    return {"scale": jnp.ones((ch,)), "bias": jnp.zeros((ch,))}


def _group_norm(p, x, groups=32, eps=1e-6):
    b, h, w, c = x.shape
    g = x.reshape(b, h, w, groups, c // groups)
    mean = g.mean(axis=(1, 2, 4), keepdims=True)
    var = g.var(axis=(1, 2, 4), keepdims=True)
    g = (g - mean) * jax.lax.rsqrt(var + eps)
    return g.reshape(b, h, w, c) * p["scale"] + p["bias"]


def _init_ln(ch):
    return {"scale": jnp.ones((ch,)), "bias": jnp.zeros((ch,))}


def _layer_norm(p, x, eps=1e-5):
    mean = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _upsample2x(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), "nearest")


# --------------------------------------------------------------- ResnetBlock2D


def _init_resblock(key, in_ch, out_ch, *, temb_dim: Optional[int] = None):
    ks = _Keys(key)
    p: Dict[str, Any] = {
        "norm1": _init_gn(in_ch), "conv1": _init_conv2d(ks(), 3, in_ch, out_ch),
        "norm2": _init_gn(out_ch), "conv2": _init_conv2d(ks(), 3, out_ch, out_ch),
    }
    if temb_dim is not None:
        p["temb"] = init_dense(ks(), temb_dim, out_ch)
    if in_ch != out_ch:
        p["shortcut"] = _init_conv2d(ks(), 1, in_ch, out_ch)
    return p


def _resblock(p, x, temb=None, *, groups=32, eps=1e-6):
    """diffusers ResnetBlock2D (default output_scale_factor=1, non-scale-shift
    time embedding: added after conv1)."""
    h = _conv2d(p["conv1"], jax.nn.silu(_group_norm(p["norm1"], x, groups, eps)))
    if temb is not None and "temb" in p:
        h = h + dense(p["temb"], jax.nn.silu(temb))[:, None, None, :].astype(h.dtype)
    h = _conv2d(p["conv2"], jax.nn.silu(_group_norm(p["norm2"], h, groups, eps)))
    skip = _conv2d(p["shortcut"], x) if "shortcut" in p else x
    return skip + h


# ----------------------------------------------------- VAE spatial attention


def _init_vae_attn(key, ch):
    ks = _Keys(key)
    return {
        "gn": _init_gn(ch),
        "q": init_dense(ks(), ch, ch), "k": init_dense(ks(), ch, ch),
        "v": init_dense(ks(), ch, ch), "o": init_dense(ks(), ch, ch),
    }


def _vae_attn(p, x, *, groups=32):
    """Single-head spatial self-attention (diffusers Attention in the VAE
    mid-block: group_norm → to_q/k/v → softmax(QKᵀ/√C)V → to_out + residual)."""
    b, h, w, c = x.shape
    n = _group_norm(p["gn"], x, groups, 1e-6).reshape(b, h * w, c)
    q, k, v = dense(p["q"], n), dense(p["k"], n), dense(p["v"], n)
    logits = jnp.einsum("bqc,bkc->bqk", q, k) / np.sqrt(c)
    wts = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
    out = dense(p["o"], jnp.einsum("bqk,bkc->bqc", wts, v))
    return x + out.reshape(b, h, w, c)


# ------------------------------------------------------------------------ VAE


def init_vae(key, cfg: MuseTalkConfig) -> Params:
    ks = _Keys(key)
    chans = cfg.vae_channels
    lat = cfg.latent_channels

    enc: Dict[str, Any] = {"conv_in": _init_conv2d(ks(), 3, 3, chans[0]), "down": []}
    in_ch = chans[0]
    for i, ch in enumerate(chans):
        resnets = []
        for _ in range(cfg.vae_layers):
            resnets.append(_init_resblock(ks(), in_ch, ch))
            in_ch = ch
        enc["down"].append({
            "resnets": resnets,
            "downsample": _init_conv2d(ks(), 3, ch, ch) if i < len(chans) - 1 else None,
        })
    enc["mid"] = {
        "res1": _init_resblock(ks(), chans[-1], chans[-1]),
        "attn": _init_vae_attn(ks(), chans[-1]),
        "res2": _init_resblock(ks(), chans[-1], chans[-1]),
    }
    enc["norm_out"] = _init_gn(chans[-1])
    enc["conv_out"] = _init_conv2d(ks(), 3, chans[-1], 2 * lat)

    dec: Dict[str, Any] = {
        "conv_in": _init_conv2d(ks(), 3, lat, chans[-1]),
        "mid": {
            "res1": _init_resblock(ks(), chans[-1], chans[-1]),
            "attn": _init_vae_attn(ks(), chans[-1]),
            "res2": _init_resblock(ks(), chans[-1], chans[-1]),
        },
        "up": [],
    }
    rev = list(reversed(chans))
    in_ch = rev[0]
    for i, ch in enumerate(rev):
        resnets = []
        for _ in range(cfg.vae_layers + 1):
            resnets.append(_init_resblock(ks(), in_ch, ch))
            in_ch = ch
        dec["up"].append({
            "resnets": resnets,
            "upsample": _init_conv2d(ks(), 3, ch, ch) if i < len(chans) - 1 else None,
        })
    dec["norm_out"] = _init_gn(chans[0])
    dec["conv_out"] = _init_conv2d(ks(), 3, chans[0], 3)
    return {
        "encoder": enc, "decoder": dec,
        "quant_conv": _init_conv2d(ks(), 1, 2 * lat, 2 * lat),
        "post_quant_conv": _init_conv2d(ks(), 1, lat, lat),
    }


def vae_encode(params: Params, cfg: MuseTalkConfig, images: jnp.ndarray) -> jnp.ndarray:
    """[B, S, S, 3] in [-1,1] → latents [B, S/8, S/8, 4] × 0.18215 (posterior
    mode — the deterministic choice where the reference samples;
    musetalk vae.get_latents_for_unet)."""
    g = cfg.norm_groups
    enc = params["encoder"]
    x = _conv2d(enc["conv_in"], images)
    for down in enc["down"]:
        for res in down["resnets"]:
            x = _resblock(res, x, groups=g)
        if down["downsample"] is not None:
            x = _conv2d(down["downsample"], x, stride=2, pad="asym")
    x = _resblock(enc["mid"]["res1"], x, groups=g)
    x = _vae_attn(enc["mid"]["attn"], x, groups=g)
    x = _resblock(enc["mid"]["res2"], x, groups=g)
    x = _conv2d(enc["conv_out"], jax.nn.silu(_group_norm(enc["norm_out"], x, g, 1e-6)))
    moments = _conv2d(params["quant_conv"], x)
    mean, _logvar = jnp.split(moments, 2, axis=-1)
    return mean * VAE_SCALE


def vae_decode(params: Params, cfg: MuseTalkConfig, latents: jnp.ndarray) -> jnp.ndarray:
    g = cfg.norm_groups
    dec = params["decoder"]
    x = _conv2d(params["post_quant_conv"], latents / VAE_SCALE)
    x = _conv2d(dec["conv_in"], x)
    x = _resblock(dec["mid"]["res1"], x, groups=g)
    x = _vae_attn(dec["mid"]["attn"], x, groups=g)
    x = _resblock(dec["mid"]["res2"], x, groups=g)
    for up in dec["up"]:
        for res in up["resnets"]:
            x = _resblock(res, x, groups=g)
        if up["upsample"] is not None:
            x = _conv2d(up["upsample"], _upsample2x(x))
    x = _conv2d(dec["conv_out"], jax.nn.silu(_group_norm(dec["norm_out"], x, g, 1e-6)))
    return x


# -------------------------------------------------------------- Transformer2D


def _init_xattn(key, ch, ctx_dim, heads):
    ks = _Keys(key)
    return {
        "q": init_dense(ks(), ch, ch, bias=False),
        "k": init_dense(ks(), ctx_dim, ch, bias=False),
        "v": init_dense(ks(), ctx_dim, ch, bias=False),
        "o": init_dense(ks(), ch, ch),
    }


def _xattn(p, x, ctx, heads):
    """Multi-head attention over sequences: x [B,N,C] (queries), ctx [B,S,D]."""
    b, n, c = x.shape
    hd = c // heads
    q = dense(p["q"], x).reshape(b, n, heads, hd)
    k = dense(p["k"], ctx).reshape(b, -1, heads, hd)
    v = dense(p["v"], ctx).reshape(b, -1, heads, hd)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
    wts = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", wts, v).reshape(b, n, c)
    return dense(p["o"], out)


def _init_transformer2d(key, ch, ctx_dim, heads):
    ks = _Keys(key)
    return {
        "gn": _init_gn(ch),
        "proj_in": _init_conv2d(ks(), 1, ch, ch),
        "norm1": _init_ln(ch), "attn1": _init_xattn(ks(), ch, ch, heads),
        "norm2": _init_ln(ch), "attn2": _init_xattn(ks(), ch, ctx_dim, heads),
        "norm3": _init_ln(ch),
        "ff_proj": init_dense(ks(), ch, 8 * ch),   # GEGLU: value ⊕ gate
        "ff_out": init_dense(ks(), 4 * ch, ch),
        "proj_out": _init_conv2d(ks(), 1, ch, ch),
    }


def _transformer2d(p, x, ctx, heads, *, groups=32):
    """diffusers Transformer2DModel (use_linear_projection=False): GN →
    conv proj_in → 1 BasicTransformerBlock (self-attn, cross-attn, GEGLU FF,
    pre-LN) → conv proj_out + residual."""
    b, hh, ww, c = x.shape
    residual = x
    h = _conv2d(p["proj_in"], _group_norm(p["gn"], x, groups, 1e-6))
    h = h.reshape(b, hh * ww, c)
    n1 = _layer_norm(p["norm1"], h)
    h = h + _xattn(p["attn1"], n1, n1, heads)
    h = h + _xattn(p["attn2"], _layer_norm(p["norm2"], h), ctx, heads)
    ff = dense(p["ff_proj"], _layer_norm(p["norm3"], h))
    val, gate = jnp.split(ff, 2, axis=-1)
    h = h + dense(p["ff_out"], val * jax.nn.gelu(gate, approximate=False))
    return residual + _conv2d(p["proj_out"], h.reshape(b, hh, ww, c))


# ----------------------------------------------------------------------- UNet


def timestep_embedding(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """diffusers Timesteps(dim, flip_sin_to_cos=True, freq_shift=0):
    [cos | sin] ordering, denominator ``half``."""
    half = dim // 2
    freqs = jnp.exp(-np.log(10_000.0) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def init_unet(key, cfg: MuseTalkConfig) -> Params:
    ks = _Keys(key)
    chans = cfg.unet_channels
    te = cfg.time_embed_dim
    n = len(chans)
    p: Dict[str, Any] = {
        "conv_in": _init_conv2d(ks(), 3, 2 * cfg.latent_channels, chans[0]),
        "time_mlp": {"lin1": init_dense(ks(), chans[0], te),
                     "lin2": init_dense(ks(), te, te)},
        "down": [], "up": [],
    }
    in_ch = chans[0]
    for i, ch in enumerate(chans):
        cross = i < n - 1          # last down block is a plain DownBlock2D
        resnets, attns = [], []
        for _ in range(cfg.unet_layers):
            resnets.append(_init_resblock(ks(), in_ch, ch, temb_dim=te))
            in_ch = ch
            if cross:
                attns.append(_init_transformer2d(ks(), ch, cfg.audio_dim, cfg.heads))
        p["down"].append({
            "resnets": resnets, "attns": attns if cross else None,
            "downsample": _init_conv2d(ks(), 3, ch, ch) if i < n - 1 else None,
        })
    p["mid"] = {
        "res1": _init_resblock(ks(), chans[-1], chans[-1], temb_dim=te),
        "attn": _init_transformer2d(ks(), chans[-1], cfg.audio_dim, cfg.heads),
        "res2": _init_resblock(ks(), chans[-1], chans[-1], temb_dim=te),
    }
    rev = list(reversed(chans))
    prev = rev[0]
    for i, ch in enumerate(rev):
        cross = i > 0              # first up block is a plain UpBlock2D
        skip_in = rev[min(i + 1, n - 1)]
        resnets, attns = [], []
        for j in range(cfg.unet_layers + 1):
            skip_ch = skip_in if j == cfg.unet_layers else ch
            res_in = prev if j == 0 else ch
            resnets.append(_init_resblock(ks(), res_in + skip_ch, ch, temb_dim=te))
            if cross:
                attns.append(_init_transformer2d(ks(), ch, cfg.audio_dim, cfg.heads))
        prev = ch
        p["up"].append({
            "resnets": resnets, "attns": attns if cross else None,
            "upsample": _init_conv2d(ks(), 3, ch, ch) if i < n - 1 else None,
        })
    p["norm_out"] = _init_gn(chans[0])
    p["conv_out"] = _init_conv2d(ks(), 3, chans[0], cfg.latent_channels)
    return p


def unet_apply(
    params: Params, cfg: MuseTalkConfig, latents8: jnp.ndarray,
    audio_ctx: jnp.ndarray, timestep: float | jnp.ndarray = 0.0,
) -> jnp.ndarray:
    """UNet2DConditionModel forward: [B, H, W, 8] + audio [B, S, audio_dim]
    (+ scalar timestep, fixed 0 in MuseTalk — api_inference_logic.py:122)
    → predicted latents [B, H, W, 4]."""
    g = cfg.norm_groups
    b = latents8.shape[0]
    t = jnp.broadcast_to(jnp.asarray(timestep, jnp.float32), (b,))
    temb = timestep_embedding(t, cfg.unet_channels[0])
    temb = dense(params["time_mlp"]["lin2"],
                 jax.nn.silu(dense(params["time_mlp"]["lin1"], temb)))

    x = _conv2d(params["conv_in"], latents8)
    skips: List[jnp.ndarray] = [x]
    for down in params["down"]:
        for j, res in enumerate(down["resnets"]):
            x = _resblock(res, x, temb, groups=g, eps=1e-5)
            if down["attns"] is not None:
                x = _transformer2d(down["attns"][j], x, audio_ctx, cfg.heads, groups=g)
            skips.append(x)
        if down["downsample"] is not None:
            x = _conv2d(down["downsample"], x, stride=2)
            skips.append(x)

    x = _resblock(params["mid"]["res1"], x, temb, groups=g, eps=1e-5)
    x = _transformer2d(params["mid"]["attn"], x, audio_ctx, cfg.heads, groups=g)
    x = _resblock(params["mid"]["res2"], x, temb, groups=g, eps=1e-5)

    for up in params["up"]:
        for j, res in enumerate(up["resnets"]):
            x = _resblock(res, jnp.concatenate([x, skips.pop()], axis=-1),
                          temb, groups=g, eps=1e-5)
            if up["attns"] is not None:
                x = _transformer2d(up["attns"][j], x, audio_ctx, cfg.heads, groups=g)
        if up["upsample"] is not None:
            x = _conv2d(up["upsample"], _upsample2x(x))
    return _conv2d(params["conv_out"],
                   jax.nn.silu(_group_norm(params["norm_out"], x, g, 1e-5)))


# ------------------------------------------------------------------ converters


def _t(w) -> jnp.ndarray:
    import torch

    if isinstance(w, torch.Tensor):
        w = w.detach().to(torch.float32).cpu().numpy()
    return jnp.asarray(np.asarray(w, np.float32))


def _conv_p(sd, prefix) -> Params:
    # torch Conv2d [out, in, kh, kw] → HWIO
    return {"kernel": _t(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0),
            "bias": _t(sd[f"{prefix}.bias"])}


def _dense_p(sd, prefix, *, bias=True) -> Params:
    p = {"kernel": _t(sd[f"{prefix}.weight"]).T}
    if bias:
        p["bias"] = _t(sd[f"{prefix}.bias"])
    return p


def _gn_p(sd, prefix) -> Params:
    return {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}


def _res_p(sd, prefix, *, temb=False) -> Params:
    p = {
        "norm1": _gn_p(sd, f"{prefix}.norm1"), "conv1": _conv_p(sd, f"{prefix}.conv1"),
        "norm2": _gn_p(sd, f"{prefix}.norm2"), "conv2": _conv_p(sd, f"{prefix}.conv2"),
    }
    if temb and f"{prefix}.time_emb_proj.weight" in sd:
        p["temb"] = _dense_p(sd, f"{prefix}.time_emb_proj")
    if f"{prefix}.conv_shortcut.weight" in sd:
        p["shortcut"] = _conv_p(sd, f"{prefix}.conv_shortcut")
    return p


def _vae_attn_p(sd, prefix) -> Params:
    # modern: group_norm/to_q/to_k/to_v/to_out.0; legacy: query/key/value/
    # proj_attn (1×1 convs stored as [out,in] or [out,in,1,1])
    def lin(modern, legacy):
        key = f"{prefix}.{modern}.weight"
        if key not in sd:
            key = f"{prefix}.{legacy}.weight"
            modern = legacy
        w = _t(sd[key])
        if w.ndim == 4:
            w = w[:, :, 0, 0]
        return {"kernel": w.T, "bias": _t(sd[f"{prefix}.{modern}.bias"])}

    gn = "group_norm" if f"{prefix}.group_norm.weight" in sd else "norm"
    return {
        "gn": _gn_p(sd, f"{prefix}.{gn}"),
        "q": lin("to_q", "query"), "k": lin("to_k", "key"),
        "v": lin("to_v", "value"), "o": lin("to_out.0", "proj_attn"),
    }


def vae_from_hf_state_dict(sd: Dict[str, Any], cfg: MuseTalkConfig) -> Params:
    """diffusers AutoencoderKL state dict (sd-vae-ft-mse) → VAE params."""
    chans = cfg.vae_channels
    enc: Dict[str, Any] = {"conv_in": _conv_p(sd, "encoder.conv_in"), "down": []}
    for i in range(len(chans)):
        block = {
            "resnets": [_res_p(sd, f"encoder.down_blocks.{i}.resnets.{j}")
                        for j in range(cfg.vae_layers)],
            "downsample": (_conv_p(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv")
                           if f"encoder.down_blocks.{i}.downsamplers.0.conv.weight" in sd
                           else None),
        }
        enc["down"].append(block)
    enc["mid"] = {
        "res1": _res_p(sd, "encoder.mid_block.resnets.0"),
        "attn": _vae_attn_p(sd, "encoder.mid_block.attentions.0"),
        "res2": _res_p(sd, "encoder.mid_block.resnets.1"),
    }
    enc["norm_out"] = _gn_p(sd, "encoder.conv_norm_out")
    enc["conv_out"] = _conv_p(sd, "encoder.conv_out")

    dec: Dict[str, Any] = {
        "conv_in": _conv_p(sd, "decoder.conv_in"),
        "mid": {
            "res1": _res_p(sd, "decoder.mid_block.resnets.0"),
            "attn": _vae_attn_p(sd, "decoder.mid_block.attentions.0"),
            "res2": _res_p(sd, "decoder.mid_block.resnets.1"),
        },
        "up": [],
    }
    for i in range(len(chans)):
        dec["up"].append({
            "resnets": [_res_p(sd, f"decoder.up_blocks.{i}.resnets.{j}")
                        for j in range(cfg.vae_layers + 1)],
            "upsample": (_conv_p(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv")
                         if f"decoder.up_blocks.{i}.upsamplers.0.conv.weight" in sd
                         else None),
        })
    dec["norm_out"] = _gn_p(sd, "decoder.conv_norm_out")
    dec["conv_out"] = _conv_p(sd, "decoder.conv_out")
    return {
        "encoder": enc, "decoder": dec,
        "quant_conv": _conv_p(sd, "quant_conv"),
        "post_quant_conv": _conv_p(sd, "post_quant_conv"),
    }


def _tfm_p(sd, prefix) -> Params:
    tb = f"{prefix}.transformer_blocks.0"

    def attn(name):
        return {
            "q": _dense_p(sd, f"{tb}.{name}.to_q", bias=False),
            "k": _dense_p(sd, f"{tb}.{name}.to_k", bias=False),
            "v": _dense_p(sd, f"{tb}.{name}.to_v", bias=False),
            "o": _dense_p(sd, f"{tb}.{name}.to_out.0"),
        }

    return {
        "gn": _gn_p(sd, f"{prefix}.norm"),
        "proj_in": _conv_p(sd, f"{prefix}.proj_in"),
        "norm1": _gn_p(sd, f"{tb}.norm1"), "attn1": attn("attn1"),
        "norm2": _gn_p(sd, f"{tb}.norm2"), "attn2": attn("attn2"),
        "norm3": _gn_p(sd, f"{tb}.norm3"),
        "ff_proj": _dense_p(sd, f"{tb}.ff.net.0.proj"),
        "ff_out": _dense_p(sd, f"{tb}.ff.net.2"),
        "proj_out": _conv_p(sd, f"{prefix}.proj_out"),
    }


def unet_from_hf_state_dict(sd: Dict[str, Any], cfg: MuseTalkConfig) -> Params:
    """diffusers UNet2DConditionModel state dict (MuseTalk pytorch_model.bin /
    musetalk.json geometry) → UNet params."""
    n = len(cfg.unet_channels)
    p: Dict[str, Any] = {
        "conv_in": _conv_p(sd, "conv_in"),
        "time_mlp": {"lin1": _dense_p(sd, "time_embedding.linear_1"),
                     "lin2": _dense_p(sd, "time_embedding.linear_2")},
        "down": [], "up": [],
    }
    for i in range(n):
        cross = i < n - 1
        p["down"].append({
            "resnets": [_res_p(sd, f"down_blocks.{i}.resnets.{j}", temb=True)
                        for j in range(cfg.unet_layers)],
            "attns": ([_tfm_p(sd, f"down_blocks.{i}.attentions.{j}")
                       for j in range(cfg.unet_layers)] if cross else None),
            "downsample": (_conv_p(sd, f"down_blocks.{i}.downsamplers.0.conv")
                           if f"down_blocks.{i}.downsamplers.0.conv.weight" in sd
                           else None),
        })
    p["mid"] = {
        "res1": _res_p(sd, "mid_block.resnets.0", temb=True),
        "attn": _tfm_p(sd, "mid_block.attentions.0"),
        "res2": _res_p(sd, "mid_block.resnets.1", temb=True),
    }
    for i in range(n):
        cross = i > 0
        p["up"].append({
            "resnets": [_res_p(sd, f"up_blocks.{i}.resnets.{j}", temb=True)
                        for j in range(cfg.unet_layers + 1)],
            "attns": ([_tfm_p(sd, f"up_blocks.{i}.attentions.{j}")
                       for j in range(cfg.unet_layers + 1)] if cross else None),
            "upsample": (_conv_p(sd, f"up_blocks.{i}.upsamplers.0.conv")
                         if f"up_blocks.{i}.upsamplers.0.conv.weight" in sd
                         else None),
        })
    p["norm_out"] = _gn_p(sd, "conv_norm_out")
    p["conv_out"] = _conv_p(sd, "conv_out")
    return p


def from_hf_state_dict(vae_sd: Dict[str, Any], unet_sd: Dict[str, Any],
                       cfg: MuseTalkConfig) -> Params:
    return {"vae": vae_from_hf_state_dict(vae_sd, cfg),
            "unet": unet_from_hf_state_dict(unet_sd, cfg)}


# ------------------------------------------------------------------- pipeline


def init_musetalk(key, cfg: MuseTalkConfig = MuseTalkConfig()) -> Params:
    k1, k2 = jax.random.split(key)
    return {"vae": init_vae(k1, cfg), "unet": init_unet(k2, cfg)}


def positional_encoding(x: jnp.ndarray) -> jnp.ndarray:
    """MuseTalk's parameter-free sinusoidal PositionalEncoding over the audio
    feature window (the ``pe`` model of api_inference_logic.py:121-134):
    x [..., S, D] + PE[S, D]."""
    s, d = x.shape[-2], x.shape[-1]
    pos = np.arange(s, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d, 2, dtype=np.float32) * (-np.log(10_000.0) / d))
    pe = np.zeros((s, d), np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div[: d // 2])
    return x + jnp.asarray(pe, x.dtype)


def whisper_chunks_for_video(
    audio_features: jnp.ndarray, n_frames: int, fps: float, *, feature_rate: float = 50.0,
    ctx: int = 50,
) -> jnp.ndarray:
    """Align whisper encoder features [T_feat, D] to video frames: for each
    frame, a window of ``ctx`` feature steps centred at the frame time
    (api_inference_logic.py:99-102 / musetalk get_whisper_chunk semantics —
    ±2 video frames of 50 Hz features around each frame). → [n_frames, ctx, D]."""
    t_feat = audio_features.shape[0]
    centers = (np.arange(n_frames) / fps * feature_rate).astype(np.int64)
    starts = np.clip(centers - ctx // 2, 0, max(t_feat - ctx, 0))
    idx = starts[:, None] + np.arange(ctx)[None, :]
    idx = np.clip(idx, 0, t_feat - 1)
    return audio_features[idx]


def lipsync_frames(
    params: Params,
    cfg: MuseTalkConfig,
    face_crops: jnp.ndarray,      # [N, S, S, 3] in [-1, 1]
    audio_windows: jnp.ndarray,   # [N, ctx, audio_dim]
    *,
    batch_size: int = 8,          # api_inference_logic.py:130
) -> jnp.ndarray:
    """Re-render mouths: per frame, mask the lower half, UNet-inpaint from the
    reference latent + PE'd audio window at timestep 0, VAE-decode.
    Returns [N, S, S, 3]."""
    n = face_crops.shape[0]
    pad = (-n) % batch_size
    crops = jnp.pad(face_crops, ((0, pad), (0, 0), (0, 0), (0, 0)))
    audio = jnp.pad(audio_windows, ((0, pad), (0, 0), (0, 0)))
    n_batches = crops.shape[0] // batch_size

    # lower-half mask (jaw region) in image space
    img_mask = np.ones((cfg.image_size, cfg.image_size, 1), np.float32)
    img_mask[cfg.image_size // 2:] = 0.0
    img_mask = jnp.asarray(img_mask, face_crops.dtype)

    def body(i, out):
        sl = jax.lax.dynamic_slice_in_dim(crops, i * batch_size, batch_size, 0)
        au = jax.lax.dynamic_slice_in_dim(audio, i * batch_size, batch_size, 0)
        ref_lat = vae_encode(params["vae"], cfg, sl)
        masked_lat = vae_encode(params["vae"], cfg, sl * img_mask)
        pred = unet_apply(params["unet"], cfg,
                          jnp.concatenate([masked_lat, ref_lat], -1),
                          positional_encoding(au))
        frames = vae_decode(params["vae"], cfg, pred)
        return jax.lax.dynamic_update_slice_in_dim(out, frames, i * batch_size, 0)

    out = jax.lax.fori_loop(0, n_batches, body, jnp.zeros_like(crops))
    return out[:n]


def blend_face(
    frame: jnp.ndarray,        # [H, W, 3] full video frame in [-1, 1]
    face: jnp.ndarray,         # [S, S, 3] re-rendered crop
    bbox: Tuple[int, int, int, int],   # (y0, x0, y1, x1) — static per shot
    *,
    feather: int = 16,
    jaw_only: bool = True,
) -> jnp.ndarray:
    """Feathered compositing of the re-rendered face into the frame (jaw-mode
    blending, api_inference_logic.py:145-170)."""
    y0, x0, y1, x1 = bbox
    h, w = y1 - y0, x1 - x0
    face_resized = jax.image.resize(face, (h, w, 3), "linear")

    yy = np.arange(h)[:, None].astype(np.float32)
    xx = np.arange(w)[None, :].astype(np.float32)
    edge = np.minimum(np.minimum(yy + 1, h - yy), np.minimum(xx + 1, w - xx)) / max(feather, 1)
    alpha = np.clip(edge, 0.0, 1.0)
    if jaw_only:
        # keep the original upper face; blend only the lower half
        jaw = np.clip((yy - h * 0.45) / (h * 0.1), 0.0, 1.0)
        alpha = alpha * jaw
    alpha = jnp.asarray(alpha)[..., None]

    region = frame[y0:y1, x0:x1]
    blended = region * (1 - alpha) + face_resized * alpha
    return frame.at[y0:y1, x0:x1].set(blended)
