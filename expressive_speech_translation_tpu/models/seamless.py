"""Direct speech-to-speech translation model (SeamlessM4T-v2-style).

The reference's alternate backend path: ``facebook/seamless-m4t-v2-large``
direct S2ST with ``num_beams=5`` (Backend/translate_speech.py:79-154, the
pyc-only SeamlessBackend §2.4). Architecture family, TPU-first:

  speech encoder (conv subsample ×4 + transformer)
    → text decoder (translation transcript, beam search)
    → unit decoder (discrete speech units conditioned on text-decoder states)
    → unit vocoder (HiFi-GAN from models/cosyvoice blocks)

Weightless mode runs with random init for structure/perf; converters follow
the same param-tree pattern as whisper/nllb when checkpoints are available.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

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
    mha,
    mha_step,
    mlp,
)
from .cosyvoice import VocoderConfig, init_vocoder, vocode


@dataclasses.dataclass(frozen=True)
class SeamlessConfig:
    n_mels: int = 80
    d_model: int = 512
    encoder_layers: int = 6
    text_decoder_layers: int = 4
    unit_decoder_layers: int = 4
    heads: int = 8
    ffn_dim: int = 2048
    text_vocab: int = 384
    unit_vocab: int = 1000          # speech units (km-style clusters)
    max_text_positions: int = 256
    max_unit_positions: int = 1024
    pad_token: int = 1
    eos_token: int = 2
    decoder_start_token: int = 2
    unit_eos: int = 999
    sample_rate_out: int = 16_000
    units_per_second: float = 50.0

    @property
    def attn(self) -> AttnConfig:
        return AttnConfig(self.d_model, self.heads, k_bias=True)

    @property
    def vocoder(self) -> VocoderConfig:
        # 16 kHz out at 50 unit/s → hop 320 = 8×5×8
        return VocoderConfig(
            n_mels=self.d_model, base_channels=256,
            upsample_rates=(8, 5, 8), upsample_kernels=(16, 10, 16),
        )


def _init_block(key, cfg: SeamlessConfig, *, cross: bool) -> Params:
    ks = jax.random.split(key, 3)
    p = {
        "self_attn": init_attention(ks[0], cfg.attn),
        "self_attn_ln": init_layer_norm(cfg.d_model),
        "mlp": init_mlp(ks[1], cfg.d_model, cfg.ffn_dim),
        "mlp_ln": init_layer_norm(cfg.d_model),
    }
    if cross:
        p["cross_attn"] = init_attention(ks[2], cfg.attn)
        p["cross_attn_ln"] = init_layer_norm(cfg.d_model)
    return p


def init_seamless(key, cfg: SeamlessConfig = SeamlessConfig()) -> Params:
    n = cfg.encoder_layers + cfg.text_decoder_layers + cfg.unit_decoder_layers
    ks = jax.random.split(key, n + 8)
    i = iter(range(n + 8))
    conv_scale = 1.0 / np.sqrt(cfg.n_mels * 5)
    return {
        "encoder": {
            "conv1": {
                "kernel": jax.random.uniform(ks[next(i)], (5, cfg.n_mels, cfg.d_model),
                                             jnp.float32, -conv_scale, conv_scale),
                "bias": jnp.zeros((cfg.d_model,)),
            },
            "conv2": {
                "kernel": jax.random.uniform(ks[next(i)], (5, cfg.d_model, cfg.d_model),
                                             jnp.float32, -1 / np.sqrt(cfg.d_model * 5),
                                             1 / np.sqrt(cfg.d_model * 5)),
                "bias": jnp.zeros((cfg.d_model,)),
            },
            "layers": [_init_block(ks[next(i)], cfg, cross=False) for _ in range(cfg.encoder_layers)],
            "ln": init_layer_norm(cfg.d_model),
        },
        "text_decoder": {
            "embed": jax.random.normal(ks[next(i)], (cfg.text_vocab, cfg.d_model)) * 0.02,
            "pos": jax.random.normal(ks[next(i)], (cfg.max_text_positions, cfg.d_model)) * 0.02,
            "layers": [_init_block(ks[next(i)], cfg, cross=True) for _ in range(cfg.text_decoder_layers)],
            "ln": init_layer_norm(cfg.d_model),
        },
        "unit_decoder": {
            "embed": jax.random.normal(ks[next(i)], (cfg.unit_vocab, cfg.d_model)) * 0.02,
            "pos": jax.random.normal(ks[next(i)], (cfg.max_unit_positions, cfg.d_model)) * 0.02,
            "layers": [_init_block(ks[next(i)], cfg, cross=True) for _ in range(cfg.unit_decoder_layers)],
            "ln": init_layer_norm(cfg.d_model),
        },
        "unit_embed_out": init_dense(ks[next(i)], cfg.d_model, cfg.d_model),
        "vocoder": init_vocoder(ks[next(i)], cfg.vocoder),
    }


def encode_speech(params: Params, cfg: SeamlessConfig, mel: jnp.ndarray) -> jnp.ndarray:
    """mel [B, T, n_mels] → encoder states [B, T//4, D] (two stride-2 convs)."""
    enc = params["encoder"]
    x = jax.nn.gelu(jax.lax.conv_general_dilated(
        mel, enc["conv1"]["kernel"], (2,), [(2, 2)],
        dimension_numbers=("NHC", "HIO", "NHC")) + enc["conv1"]["bias"])
    x = jax.nn.gelu(jax.lax.conv_general_dilated(
        x, enc["conv2"]["kernel"], (2,), [(2, 2)],
        dimension_numbers=("NHC", "HIO", "NHC")) + enc["conv2"]["bias"])
    for block in enc["layers"]:
        h = layer_norm(block["self_attn_ln"], x)
        x = x + mha(block["self_attn"], cfg.attn, h, h)
        h = layer_norm(block["mlp_ln"], x)
        x = x + mlp(block["mlp"], h)
    return layer_norm(enc["ln"], x)


def _decoder_step_fn(params_dec, cfg: SeamlessConfig, embed, pos_table, head_t):
    """Shared cached decode step builder for text/unit decoders."""

    def step(token, pos, cache, beam_state):
        cross_kv, = beam_state
        x = embed[token][:, None, :] + jax.lax.dynamic_slice_in_dim(pos_table, pos, 1, 0)[None]
        new_cache = []
        for block, c, (ck, cv) in zip(params_dec["layers"], cache, cross_kv):
            h = layer_norm(block["self_attn_ln"], x)
            attn, k, v = mha_step(block["self_attn"], cfg.attn, h, c["k"], c["v"], pos)
            x = x + attn
            new_cache.append({"k": k, "v": v})
            h = layer_norm(block["cross_attn_ln"], x)
            x = x + mha(block["cross_attn"], cfg.attn, h, None, precomputed_kv=(ck, cv))
            h = layer_norm(block["mlp_ln"], x)
            x = x + mlp(block["mlp"], h)
        x = layer_norm(params_dec["ln"], x)
        return x[:, 0, :] @ head_t, new_cache

    return step


def _init_cache(cfg: SeamlessConfig, layers: int, batch: int, max_len: int, dtype):
    shape = (batch, max_len, cfg.heads, cfg.d_model // cfg.heads)
    return [{"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)} for _ in range(layers)]


def translate_s2st(
    params: Params,
    cfg: SeamlessConfig,
    mel: jnp.ndarray,                 # [B, T, n_mels]
    *,
    num_beams: int = 5,               # translate_speech.py:118
    max_text_tokens: int = 128,
    max_units: int = 512,
) -> Dict[str, jnp.ndarray]:
    """Direct S2ST: speech → translated text tokens → units → waveform."""
    b = mel.shape[0]
    enc = encode_speech(params, cfg, mel)

    # -- text decoding (beam search, SeamlessM4T's num_beams=5 default path)
    tdec = params["text_decoder"]
    cross_t = [attention_kv(blk["cross_attn"], cfg.attn, enc) for blk in tdec["layers"]]
    step_t = _decoder_step_fn(tdec, cfg, tdec["embed"], tdec["pos"], tdec["embed"].T)
    prompt = jnp.full((b, 1), cfg.decoder_start_token, jnp.int32)
    bc = BeamConfig(eos_token=cfg.eos_token, pad_token=cfg.pad_token,
                    max_len=1 + max_text_tokens, num_beams=num_beams)
    if num_beams > 1:
        cache = _init_cache(cfg, cfg.text_decoder_layers, b * num_beams, bc.max_len, enc.dtype)
        text_tokens = beam_search(step_t, prompt, cache, (cross_t,), bc)
    else:
        cache = _init_cache(cfg, cfg.text_decoder_layers, b, bc.max_len, enc.dtype)
        text_tokens = greedy_search(step_t, prompt, cache, (cross_t,), bc)

    # -- unit decoding conditioned on text-decoder cross-attention over encoder
    # states and the decoded text embedding context
    text_ctx = params["text_decoder"]["embed"][jnp.where(
        text_tokens == cfg.pad_token, cfg.eos_token, text_tokens)]
    cond = jnp.concatenate([enc, dense(params["unit_embed_out"], text_ctx)], axis=1)
    udec = params["unit_decoder"]
    cross_u = [attention_kv(blk["cross_attn"], cfg.attn, cond) for blk in udec["layers"]]
    step_u = _decoder_step_fn(udec, cfg, udec["embed"], udec["pos"], udec["embed"].T)
    u_prompt = jnp.zeros((b, 1), jnp.int32)
    ubc = BeamConfig(eos_token=cfg.unit_eos, pad_token=0, max_len=1 + max_units, num_beams=1)
    ucache = _init_cache(cfg, cfg.unit_decoder_layers, b, ubc.max_len, enc.dtype)
    units = greedy_search(step_u, u_prompt, ucache, (cross_u,), ubc)

    # -- unit vocoder: embed units → HiFi-GAN (hop 320 → 16 kHz at 50 u/s).
    # Post-EOS pad slots (pad_token=0) must contribute SILENCE, not the
    # embedding of real unit id 0 — mask POSITIONALLY (pre-EOS, after the
    # BOS slot) so a genuine mid-sequence unit 0 still synthesizes, and
    # report the valid-unit count so callers can trim.
    valid = jnp.cumsum((units == cfg.unit_eos).astype(jnp.int32), axis=1) == 0
    valid = valid & (jnp.arange(units.shape[1])[None, :] > 0)   # skip BOS
    unit_feats = udec["embed"][units] * valid[..., None]
    audio = vocode(params["vocoder"], cfg.vocoder, unit_feats)
    n_units = jnp.sum(valid.astype(jnp.int32), axis=1)
    return {"audio": audio, "text_tokens": text_tokens, "units": units,
            "n_units": n_units}
