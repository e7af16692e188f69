"""guided-diffusion UNet (TFG variant) for diff2lip — checkpoint-exact.

Re-implements the denoiser the reference's legacy lip-sync path samples
(Backend/diff2lip/guided_diffusion/unet.py, 1275 LoC): the multi-resolution
UNetModel with scale-shift GroupNorm ResBlocks, QKV attention at configured
downsample factors, conv up/downsampling — plus the TFGModel talking-face
wrapper (unet.py:907-1070): 9-channel input (masked-noisy ⊕ cond ⊕ reference
frame), and the audio-as-style TFGAudioEncoder (unet.py:1077-1270) whose
pooled embedding is ADDED to the timestep embedding.

Checkpoint fidelity notes:
- Param tree mirrors the torch ModuleList indices (input_blocks.k / middle /
  output_blocks.k), so :func:`from_tfg_state_dict` is a mechanical remap of
  Backend/diff2lip's pickled checkpoints (Backend/diff2lip_loader.py:12-40).
- Attention uses the LEGACY qkv layout (unet.py QKVAttentionLegacy: channels
  ordered head-major [h0:q|k|v, h1:q|k|v, …]); the converter de-interleaves
  into per-head q/k/v so the JAX forward is a standard fused MHA.
- ResBlock: use_scale_shift_norm=True (script_util.py:60) — emb projects to
  2·ch, out_norm(h)·(1+scale)+shift.
- GroupNorm32: 32 groups, fp32 statistics (config ``norm_groups`` relaxes
  this for tiny test models only).

TPU-first: NHWC convs, bf16-safe (softmax/GN stats in fp32), static shapes.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .common import Params, dense, init_dense
from .diffusion import timestep_embedding


@dataclasses.dataclass(frozen=True)
class GDUNetConfig:
    image_size: int = 128
    in_channels: int = 9          # TFG use_ref nrefer=1: 3·(noisy⊕cond⊕ref)
    model_channels: int = 128
    out_channels: int = 3
    num_res_blocks: int = 2
    attention_ds: Tuple[int, ...] = (8, 16)   # attention_resolutions "16,8" @128
    channel_mult: Tuple[int, ...] = (1, 1, 2, 3, 4)   # script_util.py @128
    num_heads: int = 4
    use_scale_shift_norm: bool = True
    norm_groups: int = 32
    # TFG audio-as-style encoder (unet.py:1108-1127)
    use_audio: bool = True
    audio_dim: int = 80
    audio_frames: int = 16
    audio_model_channels: int = 32
    audio_channel_mult: Tuple[int, ...] = (1, 2, 3, 4)
    audio_init_spatial: int = 64

    @property
    def time_embed_dim(self) -> int:
        return 4 * self.model_channels


class _Keys:
    def __init__(self, key):
        self._key = key

    def __call__(self):
        self._key, sub = jax.random.split(self._key)
        return sub


# ------------------------------------------------------------------ primitives


def _init_conv(key, width, in_ch, out_ch, *, ndim=2):
    fan = in_ch * width**ndim
    shape = (width,) * ndim + (in_ch, out_ch)
    scale = 1.0 / np.sqrt(fan)
    return {"kernel": jax.random.uniform(key, shape, jnp.float32, -scale, scale),
            "bias": jnp.zeros((out_ch,))}


def _conv2d(p, x, *, stride=(1, 1)):
    x = x.astype(p["kernel"].dtype)
    w = p["kernel"].shape[0]
    pad = (w - 1) // 2
    return jax.lax.conv_general_dilated(
        x, p["kernel"], stride, [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["bias"]


def _conv1d(p, x):
    w = p["kernel"].shape[0]
    pad = (w - 1) // 2
    return jax.lax.conv_general_dilated(
        x.astype(p["kernel"].dtype), p["kernel"], (1,), [(pad, pad)],
        dimension_numbers=("NHC", "HIO", "NHC")) + p["bias"]


def _init_gn(ch):
    return {"scale": jnp.ones((ch,)), "bias": jnp.zeros((ch,))}


def _gn(p, x, groups):
    """GroupNorm32 (fp32 statistics, eps 1e-5 — torch GroupNorm default)."""
    orig = x.dtype
    x = x.astype(jnp.float32)
    shape = x.shape
    c = shape[-1]
    g = x.reshape(shape[:-1] + (groups, c // groups))
    axes = tuple(range(1, len(shape) - 1)) + (len(shape),)
    mean = g.mean(axis=axes, keepdims=True)
    var = g.var(axis=axes, keepdims=True)
    g = (g - mean) * jax.lax.rsqrt(var + 1e-5)
    return (g.reshape(shape) * p["scale"] + p["bias"]).astype(orig)


def _upsample2x(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), "nearest")


# -------------------------------------------------------------------- ResBlock


def _init_res(key, in_ch, out_ch, emb_dim, *, scale_shift=True):
    ks = _Keys(key)
    p: Dict[str, Any] = {
        "in_norm": _init_gn(in_ch), "in_conv": _init_conv(ks(), 3, in_ch, out_ch),
        "emb": init_dense(ks(), emb_dim, 2 * out_ch if scale_shift else out_ch),
        "out_norm": _init_gn(out_ch), "out_conv": _init_conv(ks(), 3, out_ch, out_ch),
    }
    if in_ch != out_ch:
        p["skip"] = _init_conv(ks(), 1, in_ch, out_ch)
    return p


def _res(p, x, emb, groups, *, scale_shift=True):
    """guided-diffusion ResBlock (unet.py:145-260), use_scale_shift_norm."""
    h = _conv2d(p["in_conv"], jax.nn.silu(_gn(p["in_norm"], x, groups)))
    emb_out = dense(p["emb"], jax.nn.silu(emb)).astype(h.dtype)[:, None, None, :]
    if scale_shift:
        scale, shift = jnp.split(emb_out, 2, axis=-1)
        h = _gn(p["out_norm"], h, groups) * (1 + scale) + shift
        h = _conv2d(p["out_conv"], jax.nn.silu(h))
    else:
        h = h + emb_out
        h = _conv2d(p["out_conv"], jax.nn.silu(_gn(p["out_norm"], h, groups)))
    skip = _conv2d(p["skip"], x) if "skip" in p else x
    return skip + h


# ------------------------------------------------------------------- attention


def _init_attn(key, ch, heads):
    ks = _Keys(key)
    return {
        "norm": _init_gn(ch),
        "q": init_dense(ks(), ch, ch), "k": init_dense(ks(), ch, ch),
        "v": init_dense(ks(), ch, ch), "o": init_dense(ks(), ch, ch),
    }


def _attn(p, x, heads, groups):
    """AttentionBlock (unet.py:263-330): spatial self-attention + residual.
    Equivalent to QKVAttentionLegacy with scale 1/√√d applied to q AND k
    (= standard 1/√d on the logits)."""
    b, h, w, c = x.shape
    hd = c // heads
    n = _gn(p["norm"], x, groups).reshape(b, h * w, c)
    q = dense(p["q"], n).reshape(b, h * w, heads, hd)
    k = dense(p["k"], n).reshape(b, h * w, heads, hd)
    v = dense(p["v"], n).reshape(b, h * w, heads, hd)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
    wts = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", wts, v).reshape(b, h, w, c)
    return x + dense(p["o"], out)


# ------------------------------------------------------------------ block plan


def _plan(cfg: GDUNetConfig):
    """Static block descriptors mirroring UNetModel's ModuleList construction
    (unet.py:400-640) — shared by init, apply, and the converter so the three
    can never drift."""
    mc, mults, nres = cfg.model_channels, cfg.channel_mult, cfg.num_res_blocks
    inputs: List[Dict[str, Any]] = [{"kind": "conv", "in": cfg.in_channels,
                                     "out": mults[0] * mc}]
    ch = mults[0] * mc
    chans = [ch]
    ds = 1
    for level, mult in enumerate(mults):
        for _ in range(nres):
            inputs.append({"kind": "res", "in": ch, "out": mult * mc,
                           "attn": ds in cfg.attention_ds})
            ch = mult * mc
            chans.append(ch)
        if level != len(mults) - 1:
            inputs.append({"kind": "down", "in": ch, "out": ch})
            chans.append(ch)
            ds *= 2
    middle = {"ch": ch}
    outputs: List[Dict[str, Any]] = []
    for level, mult in reversed(list(enumerate(mults))):
        for i in range(nres + 1):
            ich = chans.pop()
            outputs.append({
                "kind": "res", "in": ch + ich, "out": mult * mc,
                "attn": ds in cfg.attention_ds,
                "up": bool(level) and i == nres,
            })
            ch = mult * mc
            if outputs[-1]["up"]:
                ds //= 2
    return inputs, middle, outputs


def _audio_plan(cfg: GDUNetConfig):
    """TFGAudioEncoder encoder_blocks descriptors (unet.py:1160-1220)."""
    mc, mults = cfg.audio_model_channels, cfg.audio_channel_mult
    blocks: List[Dict[str, Any]] = [{"kind": "conv", "in": 1, "out": mults[0] * mc}]
    ch = mults[0] * mc
    ds = 1
    for level, mult in enumerate(mults):
        for _ in range(2):   # num_res_blocks=2 fixed (unet.py:1116)
            blocks.append({"kind": "res", "in": ch, "out": mult * mc})
            ch = mult * mc
        if level != len(mults) - 1:
            stride = (2, 1) if (cfg.audio_init_spatial // ds) > cfg.audio_frames else (2, 2)
            blocks.append({"kind": "down", "in": ch, "out": ch, "stride": stride})
            ds *= 2
    out_ch = mc * mults[-1]
    return blocks, ch, out_ch


# ------------------------------------------------------------------------ init


def init_gd_unet(key, cfg: GDUNetConfig) -> Params:
    ks = _Keys(key)
    te = cfg.time_embed_dim
    inputs, middle, outputs = _plan(cfg)
    sal = cfg.use_scale_shift_norm

    def make(desc):
        if desc["kind"] == "conv":
            return {"conv": _init_conv(ks(), 3, desc["in"], desc["out"])}
        if desc["kind"] == "down":
            return {"down": _init_conv(ks(), 3, desc["in"], desc["out"])}
        blk = {"res": _init_res(ks(), desc["in"], desc["out"], te, scale_shift=sal)}
        if desc.get("attn"):
            blk["attn"] = _init_attn(ks(), desc["out"], cfg.num_heads)
        if desc.get("up"):
            blk["up"] = _init_conv(ks(), 3, desc["out"], desc["out"])
        return blk

    p: Dict[str, Any] = {
        "time_embed": {"lin1": init_dense(ks(), cfg.model_channels, te),
                       "lin2": init_dense(ks(), te, te)},
        "input": [make(d) for d in inputs],
        "middle": {
            "res1": _init_res(ks(), middle["ch"], middle["ch"], te, scale_shift=sal),
            "attn": _init_attn(ks(), middle["ch"], cfg.num_heads),
            "res2": _init_res(ks(), middle["ch"], middle["ch"], te, scale_shift=sal),
        },
        "output": [make(d) for d in outputs],
        "out": {"norm": _init_gn(cfg.channel_mult[0] * cfg.model_channels),
                "conv": _init_conv(ks(), 3, cfg.channel_mult[0] * cfg.model_channels,
                                   cfg.out_channels)},
    }
    if cfg.use_audio:
        amc = cfg.audio_model_channels
        blocks, mid_in, out_ch = _audio_plan(cfg)

        def amake(desc):
            if desc["kind"] == "conv":
                return {"conv": _init_conv(ks(), 3, desc["in"], desc["out"])}
            if desc["kind"] == "down":
                return {"down": _init_conv(ks(), 3, desc["in"], desc["out"])}
            return {"res": _init_res(ks(), desc["in"], desc["out"], amc, scale_shift=sal)}

        p["audio"] = {
            "time_embed": {"lin1": init_dense(ks(), amc, amc),
                           "lin2": init_dense(ks(), amc, amc)},
            "in_conv": _init_conv(ks(), 3, cfg.audio_dim, cfg.audio_init_spatial, ndim=1),
            "in_norm": _init_gn(cfg.audio_init_spatial),
            "blocks": [amake(d) for d in blocks],
            "mid_res": _init_res(ks(), mid_in, out_ch, amc, scale_shift=sal),
            "style_norm": _init_gn(out_ch),
            "style_conv": _init_conv(ks(), 1, out_ch, te),
        }
    return p


# --------------------------------------------------------------------- forward


def audio_style_embed(params: Params, cfg: GDUNetConfig, mel: jnp.ndarray) -> jnp.ndarray:
    """TFGAudioEncoder + audio_encoder_to_style (unet.py:1253-1270, :986-994):
    mel [B, T=audio_frames, n_mels] → style embedding [B, time_embed_dim]."""
    a = params["audio"]
    g = cfg.norm_groups
    b = mel.shape[0]
    # fixed t=0 embedding through the encoder's own (trained) MLP
    t0 = timestep_embedding(jnp.zeros((b,), jnp.float32), cfg.audio_model_channels)
    emb = dense(a["time_embed"]["lin2"],
                jax.nn.silu(dense(a["time_embed"]["lin1"], t0)))

    h = jax.nn.silu(_gn(a["in_norm"], _conv1d(a["in_conv"], mel), g))   # [B,T,64]
    h = h.transpose(0, 2, 1)[..., None]   # → NHWC [B, 64(spectral), T, 1]
    blocks, _, _ = _audio_plan(cfg)
    ga = cfg.norm_groups
    for desc, bp in zip(blocks, a["blocks"]):
        if desc["kind"] == "conv":
            h = _conv2d(bp["conv"], h)
        elif desc["kind"] == "down":
            h = _conv2d(bp["down"], h, stride=desc["stride"])
        else:
            h = _res(bp["res"], h, emb, ga, scale_shift=cfg.use_scale_shift_norm)
    h = _res(a["mid_res"], h, emb, ga, scale_shift=cfg.use_scale_shift_norm)
    # style head: GN → SiLU → global average pool → 1×1 conv → flatten
    h = jax.nn.silu(_gn(a["style_norm"], h, ga))
    h = h.mean(axis=(1, 2), keepdims=True)
    return _conv2d(a["style_conv"], h)[:, 0, 0, :]


def gd_unet_apply(
    params: Params, cfg: GDUNetConfig, x: jnp.ndarray, t: jnp.ndarray, *,
    cond_img: jnp.ndarray, mask: jnp.ndarray,
    ref_img: Optional[jnp.ndarray] = None, mel: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """TFGModel.forward (unet.py:1022-1070): merge the noisy sample with the
    visible conditioning region, concat channels, run the UNet with
    (timestep + audio-style) embedding."""
    g = cfg.norm_groups
    sal = cfg.use_scale_shift_norm
    x = x * mask + (1.0 - mask) * cond_img
    parts = [x, cond_img] + ([ref_img] if ref_img is not None else [])
    h = jnp.concatenate(parts, axis=-1)

    temb = timestep_embedding(t.astype(jnp.float32), cfg.model_channels)
    emb = dense(params["time_embed"]["lin2"],
                jax.nn.silu(dense(params["time_embed"]["lin1"], temb)))
    if cfg.use_audio and mel is not None:
        emb = emb + audio_style_embed(params, cfg, mel)

    inputs, _, outputs = _plan(cfg)
    skips: List[jnp.ndarray] = []
    for desc, bp in zip(inputs, params["input"]):
        if desc["kind"] == "conv":
            h = _conv2d(bp["conv"], h)
        elif desc["kind"] == "down":
            h = _conv2d(bp["down"], h, stride=(2, 2))
        else:
            h = _res(bp["res"], h, emb, g, scale_shift=sal)
            if "attn" in bp:
                h = _attn(bp["attn"], h, cfg.num_heads, g)
        skips.append(h)

    mid = params["middle"]
    h = _res(mid["res1"], h, emb, g, scale_shift=sal)
    h = _attn(mid["attn"], h, cfg.num_heads, g)
    h = _res(mid["res2"], h, emb, g, scale_shift=sal)

    for desc, bp in zip(outputs, params["output"]):
        h = jnp.concatenate([h, skips.pop()], axis=-1)
        h = _res(bp["res"], h, emb, g, scale_shift=sal)
        if "attn" in bp:
            h = _attn(bp["attn"], h, cfg.num_heads, g)
        if "up" in bp:
            h = _conv2d(bp["up"], _upsample2x(h))
    return _conv2d(params["out"]["conv"],
                   jax.nn.silu(_gn(params["out"]["norm"], h, g)))


# ------------------------------------------------------------------ converter


def _t(w) -> np.ndarray:
    import torch

    if isinstance(w, torch.Tensor):
        w = w.detach().to(torch.float32).cpu().numpy()
    return np.asarray(w, np.float32)


def _conv_p(sd, prefix):
    w = _t(sd[f"{prefix}.weight"])
    if w.ndim == 4:       # [out,in,kh,kw] → HWIO
        w = w.transpose(2, 3, 1, 0)
    else:                 # conv1d [out,in,k] → HIO
        w = w.transpose(2, 1, 0)
    return {"kernel": jnp.asarray(w), "bias": jnp.asarray(_t(sd[f"{prefix}.bias"]))}


def _lin_p(sd, prefix):
    return {"kernel": jnp.asarray(_t(sd[f"{prefix}.weight"]).T),
            "bias": jnp.asarray(_t(sd[f"{prefix}.bias"]))}


def _gn_p(sd, prefix):
    return {"scale": jnp.asarray(_t(sd[f"{prefix}.weight"])),
            "bias": jnp.asarray(_t(sd[f"{prefix}.bias"]))}


def _res_p(sd, prefix):
    p = {
        "in_norm": _gn_p(sd, f"{prefix}.in_layers.0"),
        "in_conv": _conv_p(sd, f"{prefix}.in_layers.2"),
        "emb": _lin_p(sd, f"{prefix}.emb_layers.1"),
        "out_norm": _gn_p(sd, f"{prefix}.out_layers.0"),
        "out_conv": _conv_p(sd, f"{prefix}.out_layers.3"),
    }
    if f"{prefix}.skip_connection.weight" in sd:
        p["skip"] = _conv_p(sd, f"{prefix}.skip_connection")
    return p


def _attn_p(sd, prefix, heads):
    """De-interleave the legacy head-major qkv conv (unet.py:332-363) into
    per-head q/k/v dense params."""
    w = _t(sd[f"{prefix}.qkv.weight"])[:, :, 0]     # [3C, C]
    b = _t(sd[f"{prefix}.qkv.bias"])
    c = w.shape[1]
    hd = c // heads
    w = w.reshape(heads, 3, hd, c)
    b = b.reshape(heads, 3, hd)

    def part(i):
        return {"kernel": jnp.asarray(w[:, i].reshape(heads * hd, c).T),
                "bias": jnp.asarray(b[:, i].reshape(heads * hd))}

    po = _t(sd[f"{prefix}.proj_out.weight"])[:, :, 0]
    return {
        "norm": _gn_p(sd, f"{prefix}.norm"),
        "q": part(0), "k": part(1), "v": part(2),
        "o": {"kernel": jnp.asarray(po.T),
              "bias": jnp.asarray(_t(sd[f"{prefix}.proj_out.bias"]))},
    }


def from_tfg_state_dict(sd: Dict[str, Any], cfg: GDUNetConfig) -> Params:
    """diff2lip TFGModel checkpoint (torch, possibly DDP 'module.'-prefixed)
    → params. Layout follows the same _plan() the forward uses."""
    sd = {k[7:] if k.startswith("module.") else k: v for k, v in sd.items()}
    inputs, _, outputs = _plan(cfg)

    def block(prefix, desc):
        if desc["kind"] == "conv":
            return {"conv": _conv_p(sd, f"{prefix}.0")}
        if desc["kind"] == "down":
            return {"down": _conv_p(sd, f"{prefix}.0.op")}
        blk = {"res": _res_p(sd, f"{prefix}.0")}
        j = 1
        if desc.get("attn"):
            blk["attn"] = _attn_p(sd, f"{prefix}.{j}", cfg.num_heads)
            j += 1
        if desc.get("up"):
            blk["up"] = _conv_p(sd, f"{prefix}.{j}.conv")
        return blk

    p: Dict[str, Any] = {
        "time_embed": {"lin1": _lin_p(sd, "time_embed.0"),
                       "lin2": _lin_p(sd, "time_embed.2")},
        "input": [block(f"input_blocks.{i}", d) for i, d in enumerate(inputs)],
        "middle": {
            "res1": _res_p(sd, "middle_block.0"),
            "attn": _attn_p(sd, "middle_block.1", cfg.num_heads),
            "res2": _res_p(sd, "middle_block.2"),
        },
        "output": [block(f"output_blocks.{i}", d) for i, d in enumerate(outputs)],
        "out": {"norm": _gn_p(sd, "out.0"), "conv": _conv_p(sd, "out.2")},
    }
    if cfg.use_audio and "audio_encoder.input_block.0.weight" in sd:
        blocks, _, _ = _audio_plan(cfg)

        def ablock(prefix, desc):
            if desc["kind"] == "conv":
                return {"conv": _conv_p(sd, f"{prefix}.0")}
            if desc["kind"] == "down":
                return {"down": _conv_p(sd, f"{prefix}.0.op")}
            return {"res": _res_p(sd, f"{prefix}.0")}

        p["audio"] = {
            "time_embed": {"lin1": _lin_p(sd, "audio_encoder.time_embed.0"),
                           "lin2": _lin_p(sd, "audio_encoder.time_embed.2")},
            "in_conv": _conv_p(sd, "audio_encoder.input_block.0"),
            "in_norm": _gn_p(sd, "audio_encoder.input_block.1"),
            "blocks": [ablock(f"audio_encoder.encoder_blocks.{i}", d)
                       for i, d in enumerate(blocks)],
            "mid_res": _res_p(sd, "audio_encoder.middle_block.0"),
            "style_norm": _gn_p(sd, "audio_encoder_to_style.0"),
            "style_conv": _conv_p(sd, "audio_encoder_to_style.3"),
        }
    return p
