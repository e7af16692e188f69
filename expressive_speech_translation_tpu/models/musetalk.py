"""MuseTalk-style lip-sync: VAE + single-step conditional UNet + blending.

Replaces the reference's MuseTalk container (Docker/musetalk_api.py +
api_inference_logic.py): VAE-encode 256×256 face crops to latents (:104-116),
batched single-timestep UNet inference conditioned on whisper audio features
(:118-143, batch 8), VAE-decode, jaw-mode feathered blending back into frames
(:145-170). Face detection/parsing stays host-side (pipeline layer); this
module is the device compute.

Architecture notes (TPU-first):
- VAE: SD-style AutoencoderKL geometry — 256×256×3 → 32×32×4 latents with the
  0.18215 scaling; GroupNorm+SiLU resblocks, strided-conv downsampling.
- UNet: UNet2DCondition-style — input 8ch (masked latent ⊕ reference latent),
  cross-attention to audio feature sequences, run at a single fixed timestep
  (MuseTalk inference is one denoise step, not a diffusion loop).
- NHWC layout throughout (XLA:TPU's native conv layout).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .common import Params, dense, init_dense

VAE_SCALE = 0.18215


@dataclasses.dataclass(frozen=True)
class MuseTalkConfig:
    image_size: int = 256
    latent_channels: int = 4
    vae_channels: Tuple[int, ...] = (64, 128, 256)     # 3 downsamples → 32×32
    unet_channels: Tuple[int, ...] = (64, 128, 256)
    audio_dim: int = 384          # whisper feature dim (tiny=384; medium=1024)
    audio_ctx: int = 10           # audio feature frames per video frame window
    heads: int = 4


# ------------------------------------------------------------------ conv utils


def _init_conv2d(key, width, in_ch, out_ch):
    scale = 1.0 / np.sqrt(in_ch * width * width)
    return {
        "kernel": jax.random.uniform(
            key, (width, width, in_ch, out_ch), jnp.float32, -scale, scale
        ),
        "bias": jnp.zeros((out_ch,)),
    }


def _conv2d(p, x, *, stride=1):
    x = x.astype(p["kernel"].dtype)
    width = p["kernel"].shape[0]
    pad = (width - 1) // 2
    return jax.lax.conv_general_dilated(
        x, p["kernel"], (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["bias"]


def _group_norm(p, x, groups=8):
    b, h, w, c = x.shape
    g = x.reshape(b, h, w, groups, c // groups)
    mean = g.mean(axis=(1, 2, 4), keepdims=True)
    var = g.var(axis=(1, 2, 4), keepdims=True)
    g = (g - mean) * jax.lax.rsqrt(var + 1e-6)
    return g.reshape(b, h, w, c) * p["scale"] + p["bias"]


def _init_gn(ch):
    return {"scale": jnp.ones((ch,)), "bias": jnp.zeros((ch,))}


def _init_resblock(key, in_ch, out_ch):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "gn1": _init_gn(in_ch), "conv1": _init_conv2d(k1, 3, in_ch, out_ch),
        "gn2": _init_gn(out_ch), "conv2": _init_conv2d(k2, 3, out_ch, out_ch),
    }
    if in_ch != out_ch:
        p["skip"] = _init_conv2d(k3, 1, in_ch, out_ch)
    return p


def _resblock(p, x):
    h = _conv2d(p["conv1"], jax.nn.silu(_group_norm(p["gn1"], x)))
    h = _conv2d(p["conv2"], jax.nn.silu(_group_norm(p["gn2"], h)))
    skip = _conv2d(p["skip"], x) if "skip" in p else x
    return skip + h


def _upsample2x(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), "nearest")


# ------------------------------------------------------------------------ VAE


def init_vae(key, cfg: MuseTalkConfig) -> Params:
    ks = iter(jax.random.split(key, 64))
    chans = cfg.vae_channels
    enc: Dict[str, Any] = {"conv_in": _init_conv2d(next(ks), 3, 3, chans[0]), "downs": []}
    for i, ch in enumerate(chans):
        prev = chans[max(i - 1, 0)]
        enc["downs"].append({
            "res": _init_resblock(next(ks), prev if i else chans[0], ch),
            "down": _init_conv2d(next(ks), 3, ch, ch),
        })
    enc["mid"] = _init_resblock(next(ks), chans[-1], chans[-1])
    enc["gn_out"] = _init_gn(chans[-1])
    enc["conv_out"] = _init_conv2d(next(ks), 3, chans[-1], 2 * cfg.latent_channels)

    dec: Dict[str, Any] = {
        "conv_in": _init_conv2d(next(ks), 3, cfg.latent_channels, chans[-1]),
        "mid": _init_resblock(next(ks), chans[-1], chans[-1]),
        "ups": [],
    }
    for i, ch in enumerate(reversed(chans)):
        nxt = list(reversed(chans))[min(i + 1, len(chans) - 1)]
        dec["ups"].append({
            "res": _init_resblock(next(ks), ch, nxt),
        })
    dec["gn_out"] = _init_gn(chans[0])
    dec["conv_out"] = _init_conv2d(next(ks), 3, chans[0], 3)
    return {"encoder": enc, "decoder": dec}


def vae_encode(params: Params, cfg: MuseTalkConfig, images: jnp.ndarray) -> jnp.ndarray:
    """[B, 256, 256, 3] in [-1,1] → latents [B, 32, 32, 4] (mode of the
    posterior, × 0.18215 — diffusers convention)."""
    enc = params["encoder"]
    x = _conv2d(enc["conv_in"], images)
    for down in enc["downs"]:
        x = _resblock(down["res"], x)
        x = _conv2d(down["down"], x, stride=2)
    x = _resblock(enc["mid"], x)
    x = _conv2d(enc["conv_out"], jax.nn.silu(_group_norm(enc["gn_out"], x)))
    mean, _logvar = jnp.split(x, 2, axis=-1)
    return mean * VAE_SCALE


def vae_decode(params: Params, cfg: MuseTalkConfig, latents: jnp.ndarray) -> jnp.ndarray:
    dec = params["decoder"]
    x = _conv2d(dec["conv_in"], latents / VAE_SCALE)
    x = _resblock(dec["mid"], x)
    for up in dec["ups"]:
        x = _resblock(up["res"], x)
        x = _upsample2x(x)
    x = _conv2d(dec["conv_out"], jax.nn.silu(_group_norm(dec["gn_out"], x)))
    return jnp.tanh(x)


# ----------------------------------------------------------------------- UNet


def _init_cross_attn(key, ch, ctx_dim, heads):
    ks = jax.random.split(key, 5)
    return {
        "gn": _init_gn(ch),
        "q": init_dense(ks[0], ch, ch, bias=False),
        "k": init_dense(ks[1], ctx_dim, ch, bias=False),
        "v": init_dense(ks[2], ctx_dim, ch, bias=False),
        "o": init_dense(ks[3], ch, ch),
    }


def _cross_attn(p, x, ctx, heads):
    """x [B,H,W,C] attends to ctx [B,S,D]. ``heads`` is static (config, not
    params — params must stay a pure array pytree for jit)."""
    b, h, w, c = x.shape
    q = dense(p["q"], _group_norm(p["gn"], x)).reshape(b, h * w, heads, c // heads)
    k = dense(p["k"], ctx).reshape(b, -1, heads, c // heads)
    v = dense(p["v"], ctx).reshape(b, -1, heads, c // heads)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(c // heads)
    wts = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", wts, v).reshape(b, h, w, c)
    return x + dense(p["o"], out)


def init_unet(key, cfg: MuseTalkConfig) -> Params:
    ks = iter(jax.random.split(key, 64))
    chans = cfg.unet_channels
    p: Dict[str, Any] = {
        # 8 input channels: masked-face latent ⊕ reference latent
        "conv_in": _init_conv2d(next(ks), 3, 2 * cfg.latent_channels, chans[0]),
        "downs": [], "ups": [],
    }
    for i, ch in enumerate(chans):
        prev = chans[max(i - 1, 0)]
        p["downs"].append({
            "res": _init_resblock(next(ks), prev if i else chans[0], ch),
            "attn": _init_cross_attn(next(ks), ch, cfg.audio_dim, cfg.heads),
            "down": _init_conv2d(next(ks), 3, ch, ch) if i < len(chans) - 1 else None,
        })
    p["mid_res"] = _init_resblock(next(ks), chans[-1], chans[-1])
    p["mid_attn"] = _init_cross_attn(next(ks), chans[-1], cfg.audio_dim, cfg.heads)
    for i, ch in enumerate(reversed(chans)):
        nxt = list(reversed(chans))[min(i + 1, len(chans) - 1)]
        p["ups"].append({
            "res": _init_resblock(next(ks), 2 * ch, nxt),   # skip concat
            "attn": _init_cross_attn(next(ks), nxt, cfg.audio_dim, cfg.heads),
        })
    p["gn_out"] = _init_gn(chans[0])
    p["conv_out"] = _init_conv2d(next(ks), 3, chans[0], cfg.latent_channels)
    return p


def unet_apply(params: Params, cfg: MuseTalkConfig, latents8: jnp.ndarray, audio_ctx: jnp.ndarray) -> jnp.ndarray:
    """Single-step UNet: [B, 32, 32, 8] + audio [B, S, audio_dim] → [B, 32, 32, 4]."""
    x = _conv2d(params["conv_in"], latents8)
    skips: List[jnp.ndarray] = []
    for down in params["downs"]:
        x = _resblock(down["res"], x)
        x = _cross_attn(down["attn"], x, audio_ctx, cfg.heads)
        skips.append(x)
        if down["down"] is not None:
            x = _conv2d(down["down"], x, stride=2)
    x = _cross_attn(params["mid_attn"], _resblock(params["mid_res"], x), audio_ctx, cfg.heads)
    for up in params["ups"]:
        skip = skips.pop()
        if x.shape[1] != skip.shape[1]:
            x = _upsample2x(x)
        x = _resblock(up["res"], jnp.concatenate([x, skip], axis=-1))
        x = _cross_attn(up["attn"], x, audio_ctx, cfg.heads)
    return _conv2d(params["conv_out"], jax.nn.silu(_group_norm(params["gn_out"], x)))


# ------------------------------------------------------------------- pipeline


def init_musetalk(key, cfg: MuseTalkConfig = MuseTalkConfig()) -> Params:
    k1, k2 = jax.random.split(key)
    return {"vae": init_vae(k1, cfg), "unet": init_unet(k2, cfg)}


def whisper_chunks_for_video(
    audio_features: jnp.ndarray, n_frames: int, fps: float, *, feature_rate: float = 50.0,
    ctx: int = 10,
) -> jnp.ndarray:
    """Align whisper encoder features [T_feat, D] to video frames: for each
    frame, a window of ``ctx`` feature steps centred at the frame time
    (api_inference_logic.py:99-102). → [n_frames, ctx, D]."""
    t_feat = audio_features.shape[0]
    centers = (np.arange(n_frames) / fps * feature_rate).astype(np.int64)
    starts = np.clip(centers - ctx // 2, 0, max(t_feat - ctx, 0))
    idx = starts[:, None] + np.arange(ctx)[None, :]
    idx = np.clip(idx, 0, t_feat - 1)
    return audio_features[idx]


def lipsync_frames(
    params: Params,
    cfg: MuseTalkConfig,
    face_crops: jnp.ndarray,      # [N, 256, 256, 3] in [-1, 1]
    audio_windows: jnp.ndarray,   # [N, ctx, audio_dim]
    *,
    batch_size: int = 8,          # api_inference_logic.py:130
) -> jnp.ndarray:
    """Re-render mouths: per frame, mask the lower half, UNet-inpaint from the
    reference latent + audio, VAE-decode. Returns [N, 256, 256, 3]."""
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
        pred = unet_apply(params["unet"], cfg, jnp.concatenate([masked_lat, ref_lat], -1), au)
        frames = vae_decode(params["vae"], cfg, pred)
        return jax.lax.dynamic_update_slice_in_dim(out, frames, i * batch_size, 0)

    out = jax.lax.fori_loop(0, n_batches, body, jnp.zeros_like(crops))
    return out[:n]


def blend_face(
    frame: jnp.ndarray,        # [H, W, 3] full video frame in [-1, 1]
    face: jnp.ndarray,         # [256, 256, 3] re-rendered crop
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
