"""VITS-style single-speaker text-to-speech (ESPnet kan-bayashi_ljspeech_vits
family) — the model behind the reference's per-language ESPnet TTS path
(SURVEY §2.4: ``espnet/kan-bayashi_ljspeech_vits``; ESPnetBackend
_load_tts_model loads one such model per language).

Inference graph (VITS, arXiv:2106.06103, deterministic-duration variant):

  char ids → transformer text encoder → prior stats (m_p, logs_p)
           → duration predictor → hard upsample to frame rate
           → z_p = m_p + exp(logs_p)·ε → inverse normalizing flow
           → HiFi-GAN decoder → waveform @ 22.05 kHz

The flow and decoder reuse the VITS modules already built for the OpenVoice
tone converter (models/openvoice.py: same modules.ResidualCouplingBlock /
Generator architecture — OpenVoice IS a VITS derivative); the hard upsample
is the static-shape searchsorted gather from models/seamless.py. Weightless
per-language instances are deterministic in (language, seed) so the ESPnet
backend's per-language cache semantics are observable.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .common import (
    AttnConfig,
    Params,
    init_attention,
    init_dense,
    init_layer_norm,
    init_mlp,
    dense,
    layer_norm,
    mha,
    mlp,
)
from .openvoice import (
    OpenVoiceConfig,
    _init_coupling,
    _init_generator,
    flow_inverse,
    generator_decode,
)
from .seamless import hard_upsample


@dataclasses.dataclass(frozen=True)
class VitsTTSConfig:
    vocab: int = 256                    # byte-level text ids
    hidden: int = 96
    layers: int = 2
    heads: int = 4
    ffn: int = 192
    inter_channels: int = 96            # flow/prior channel count
    max_positions: int = 512
    frames_per_char: float = 4.0        # duration prior at 86 fps (hop 256)
    sample_rate: int = 22_050

    @property
    def attn(self) -> AttnConfig:
        return AttnConfig(self.hidden, self.heads, k_bias=True)

    @property
    def ov(self) -> OpenVoiceConfig:
        # flow + HiFi-GAN geometry shared with the OpenVoice converter
        # modules (VITS family); narrower decoder trunk than the production
        # converter — this is the per-language ESPnet path, not cloning
        return OpenVoiceConfig(inter_channels=self.inter_channels,
                               hidden=self.inter_channels, se_dim=32,
                               upsample_initial=128)


def init_vits(key, cfg: VitsTTSConfig = VitsTTSConfig()) -> Params:
    ks = jax.random.split(key, 8 + cfg.layers)
    from .common import sinusoid_position_embedding

    blocks = []
    for i in range(cfg.layers):
        b1, b2 = jax.random.split(ks[4 + i])
        blocks.append({
            "self_attn": init_attention(b1, cfg.attn),
            "self_attn_ln": init_layer_norm(cfg.hidden),
            "mlp": init_mlp(b2, cfg.hidden, cfg.ffn),
            "mlp_ln": init_layer_norm(cfg.hidden),
        })
    return {
        "embed": jax.random.normal(ks[0], (cfg.vocab, cfg.hidden)) * 0.02,
        "pos": jnp.asarray(sinusoid_position_embedding(cfg.max_positions, cfg.hidden)),
        "encoder": {"layers": blocks, "ln": init_layer_norm(cfg.hidden)},
        "prior_proj": init_dense(ks[1], cfg.hidden, 2 * cfg.inter_channels),
        "dur_proj": init_dense(ks[2], cfg.hidden, 1),
        "se": jax.random.normal(ks[3], (1, cfg.ov.se_dim)) * 0.1,
        # flow_forward/flow_inverse read params["flow"] — a list of coupling
        # layers, same tree shape as the OpenVoice converter
        "flow": [_init_coupling(k, cfg.ov)
                 for k in jax.random.split(ks[-2], cfg.ov.n_flows)],
        "decoder": _init_generator(ks[-1], cfg.ov),
    }


def encode_text(params: Params, cfg: VitsTTSConfig, tokens: jnp.ndarray,
                mask: jnp.ndarray) -> jnp.ndarray:
    x = params["embed"][tokens] + params["pos"][: tokens.shape[1]][None]
    attend = mask[:, None, None, :]
    for blk in params["encoder"]["layers"]:
        h = layer_norm(blk["self_attn_ln"], x)
        x = x + mha(blk["self_attn"], cfg.attn, h, h, mask=attend)
        h = layer_norm(blk["mlp_ln"], x)
        x = x + mlp(blk["mlp"], h)
    return layer_norm(params["encoder"]["ln"], x)


def synthesize(params: Params, cfg: VitsTTSConfig, tokens: jnp.ndarray,
               mask: jnp.ndarray, *, max_frames: int,
               noise_scale: float = 0.667,
               key: jnp.ndarray | None = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[B, T] char ids → (waveform [B, max_frames·hop], n_valid_samples [B])."""
    h = encode_text(params, cfg, tokens, mask)
    stats = dense(params["prior_proj"], h)
    m_p, logs_p = jnp.split(stats, 2, axis=-1)

    log_dur = dense(params["dur_proj"], h)[..., 0]
    # duration prior: softplus centered so a zero-weight predictor still
    # speaks at frames_per_char (weightless instances must produce audio
    # whose length scales with the text)
    dur = jax.nn.softplus(log_dur) + cfg.frames_per_char - jnp.log(2.0)
    dur = jnp.where(mask, jnp.maximum(jnp.round(dur), 1.0), 0.0).astype(jnp.int32)

    m_up = hard_upsample(m_p, dur, max_frames)
    logs_up = hard_upsample(logs_p, dur, max_frames)
    n_frames = jnp.sum(dur, axis=1)
    frame_mask = (jnp.arange(max_frames)[None, :] < n_frames[:, None])

    if key is None:
        key = jax.random.PRNGKey(0)
    eps = jax.random.normal(key, m_up.shape, m_up.dtype)
    z_p = m_up + jnp.exp(logs_up) * eps * noise_scale
    z_p = jnp.where(frame_mask[..., None], z_p, 0.0)

    # openvoice modules run [B, T, C] with se [B, se_dim]
    se = jnp.broadcast_to(params["se"], (tokens.shape[0], params["se"].shape[1]))
    z = flow_inverse(params, cfg.ov, z_p, se)
    wave = generator_decode(params["decoder"], cfg.ov, z, se)
    hop = int(np.prod(cfg.ov.upsample_rates))
    return wave.reshape(tokens.shape[0], -1), n_frames * hop


class VitsTTSModel:
    """ESPnet-TTS-shaped wrapper: ``synthesize(text, language=...) -> wave``.
    One instance per language (the ESPnetBackend per-language cache unit)."""

    def __init__(self, language: str, cfg: VitsTTSConfig = VitsTTSConfig(),
                 *, max_chars: int = 256, max_frames: int = 1024):
        import functools
        import zlib

        from .common import cast_floats, host_init

        self.language = language
        self.cfg = cfg
        self.sample_rate = cfg.sample_rate
        # no checkpoint path exists for this family yet: instances are always
        # randomly initialised — surfaced through ESPnetBackend.weights_info
        # so /available-backends labels the backend "random"
        self.weightless = True
        self.max_chars = max_chars
        self.max_frames = max_frames
        seed = zlib.crc32(f"vits:{language}".encode()) & 0x7FFFFFFF
        self.params = cast_floats(host_init(init_vits, seed, cfg), jnp.bfloat16)

        @functools.partial(jax.jit, static_argnums=(3,))
        def fn(params, tokens, mask, max_frames, key):
            return synthesize(params, cfg, tokens, mask,
                              max_frames=max_frames, key=key)

        self._fn = fn

    def synthesize(self, text: str, language: str | None = None) -> np.ndarray:
        ids = np.frombuffer(text.encode("utf-8")[: self.max_chars],
                            np.uint8).astype(np.int32)
        n = max(len(ids), 1)
        tokens = np.zeros((1, self.max_chars), np.int32)
        tokens[0, :len(ids)] = ids
        mask = np.zeros((1, self.max_chars), bool)
        mask[0, :n] = True
        wave, n_samples = self._fn(self.params, jnp.asarray(tokens),
                                   jnp.asarray(mask), self.max_frames,
                                   jax.random.PRNGKey(0))
        m = int(np.clip(int(n_samples[0]), 1, wave.shape[1]))
        out = np.asarray(wave, np.float32)[0, :m]
        peak = float(np.abs(out).max()) or 1.0
        return (0.95 * out / max(peak, 0.95)).astype(np.float32)
