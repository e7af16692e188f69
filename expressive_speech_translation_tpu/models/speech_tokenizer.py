"""Speech tokenizer: mel → discrete 25 Hz speech tokens (FSQ, 6561 codes).

CosyVoice2's supervised speech tokenizer produces the discrete tokens the LM
consumes and the SFT data pipeline stores (greek_sft.yaml:24
``speech_token_size: 6561`` — exactly 3⁸, i.e. finite scalar quantisation with
8 dimensions × 3 levels). The reference ships it inside the CosyVoice image;
here it is a first-class model:

  mel 24 kHz (50 Hz frames) → conv stride-2 (→25 Hz, token_frame_rate,
  greek_sft.yaml:16) → transformer encoder → linear to 8 dims → FSQ → token id

FSQ (Mentzer et al. 2023): bound each dim with tanh to (−1, 1), quantise to 3
levels {−1, 0, 1} with a straight-through estimator, and read the id in base 3.
No codebook collapse, trivially invertible id ↔ code, TPU-friendly (pure
elementwise math).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .common import AttnConfig, Params, dense, init_attention, init_dense, init_layer_norm, init_mlp, layer_norm, mha, mlp


@dataclasses.dataclass(frozen=True)
class SpeechTokenizerConfig:
    n_mels: int = 80
    dim: int = 256
    layers: int = 4
    heads: int = 4
    fsq_dims: int = 8
    fsq_levels: int = 3            # 3^8 = 6561 (greek_sft.yaml:24)
    downsample: int = 2            # 50 Hz mel frames → 25 Hz tokens

    @property
    def vocab_size(self) -> int:
        return self.fsq_levels ** self.fsq_dims

    @property
    def attn(self) -> AttnConfig:
        return AttnConfig(self.dim, self.heads, k_bias=True)


def init_speech_tokenizer(key, cfg: SpeechTokenizerConfig = SpeechTokenizerConfig()) -> Params:
    ks = jax.random.split(key, cfg.layers + 4)
    scale = 1.0 / np.sqrt(cfg.n_mels * 5)
    blocks = []
    for i in range(cfg.layers):
        k1, k2 = jax.random.split(ks[i])
        blocks.append({
            "attn": init_attention(k1, cfg.attn),
            "attn_ln": init_layer_norm(cfg.dim),
            "mlp": init_mlp(k2, cfg.dim, 4 * cfg.dim),
            "mlp_ln": init_layer_norm(cfg.dim),
        })
    return {
        "conv_in": {
            "kernel": jax.random.uniform(
                ks[-3], (5, cfg.n_mels, cfg.dim), jnp.float32, -scale, scale),
            "bias": jnp.zeros((cfg.dim,)),
        },
        "blocks": blocks,
        "ln_out": init_layer_norm(cfg.dim),
        "to_fsq": init_dense(ks[-2], cfg.dim, cfg.fsq_dims),
        "from_fsq": init_dense(ks[-1], cfg.fsq_dims, cfg.dim),
    }


def _fsq(z: jnp.ndarray, levels: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Finite scalar quantisation with straight-through gradients.
    z [..., D] → (quantised codes in {-1,0,1,...} scaled, integer levels)."""
    half = (levels - 1) / 2.0
    # EVEN level counts live on a half-integer grid (L=4 → {±0.5, ±1.5}):
    # plain round() would land off-grid and collapse a level; the offset
    # shifts rounding onto the right lattice for both parities
    offset = 0.5 if levels % 2 == 0 else 0.0
    bounded = jnp.tanh(z) * half                   # (-half, half)
    quantised = jnp.round(bounded - offset) + offset
    codes = bounded + jax.lax.stop_gradient(quantised - bounded)  # STE
    ints = jnp.round(quantised + half).astype(jnp.int32)   # 0..levels-1
    return codes / half, ints


def codes_to_ids(ints: jnp.ndarray, levels: int) -> jnp.ndarray:
    """[..., D] base-`levels` digits → scalar token id."""
    d = ints.shape[-1]
    weights = jnp.asarray([levels**i for i in range(d)], jnp.int32)
    return jnp.sum(ints * weights, axis=-1)


def ids_to_codes(ids: jnp.ndarray, *, levels: int = 3, dims: int = 8) -> jnp.ndarray:
    """Inverse of codes_to_ids → normalised codes in [-1, 1]."""
    digits = []
    rem = ids
    for _ in range(dims):
        digits.append(rem % levels)
        rem = rem // levels
    ints = jnp.stack(digits, axis=-1).astype(jnp.float32)
    half = (levels - 1) / 2.0
    return (ints - half) / half


def encode_with_codes(
    params: Params, cfg: SpeechTokenizerConfig, mel: jnp.ndarray, mask: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """mel [B, T, n_mels] (50 Hz frames) + mask → (token ids [B, T//ds],
    token mask, STE codes). ONE forward shared by training (which consumes
    the codes for a reconstruction/distillation objective) and inference
    (:func:`encode` drops them) — the same-audio→same-tokens determinism
    contract depends on the two paths never diverging."""
    x = jax.lax.conv_general_dilated(
        mel * mask[..., None], params["conv_in"]["kernel"], (cfg.downsample,),
        [(2, 2)], dimension_numbers=("NHC", "HIO", "NHC"),
    ) + params["conv_in"]["bias"]
    x = jax.nn.gelu(x)
    tok_mask = mask[:, :: cfg.downsample][:, : x.shape[1]]
    attn_mask = tok_mask[:, None, None, :]
    for blk in params["blocks"]:
        h = layer_norm(blk["attn_ln"], x)
        x = x + mha(blk["attn"], cfg.attn, h, h, mask=attn_mask)
        h = layer_norm(blk["mlp_ln"], x)
        x = x + mlp(blk["mlp"], h)
    z = dense(params["to_fsq"], layer_norm(params["ln_out"], x))
    codes, ints = _fsq(z, cfg.fsq_levels)
    ids = codes_to_ids(ints, cfg.fsq_levels)
    return jnp.where(tok_mask, ids, 0), tok_mask, dense(params["from_fsq"], codes)


def encode(
    params: Params, cfg: SpeechTokenizerConfig, mel: jnp.ndarray, mask: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inference path: ids + mask only (shared forward, codes dropped)."""
    ids, tok_mask, _ = encode_with_codes(params, cfg, mel, mask)
    return ids, tok_mask


def tokenize_audio(
    params: Params, cfg: SpeechTokenizerConfig, audio_24k: jnp.ndarray
) -> jnp.ndarray:
    """Convenience: [T] 24 kHz waveform → [n_tokens] ids at 25 Hz."""
    from ..ops import kaldi_fbank

    mel = kaldi_fbank(audio_24k[None], sr=24_000, frame_length_ms=40.0,
                      frame_shift_ms=20.0, n_mels=cfg.n_mels)  # 50 Hz frames
    mask = jnp.ones(mel.shape[:2], bool)
    ids, _ = encode(params, cfg, mel, mask)
    return ids[0]
