"""OpenVoice-style tone-color converter.

Replaces the reference's OpenVoice service (Docker/openvoice_api.py:39-288):
256-d speaker embeddings ("SE", shape-normalised to [1,256,1], :50-69 and
Docker/create_embedding.py), ``/clone-voice`` converting a source utterance's
timbre toward a target SE while keeping content/prosody, native 22 050 Hz.

VITS-style architecture, TPU-first: a spectrogram posterior encoder
(WaveNet-ish dilated conv stack), a normalising flow of affine coupling layers
conditioned on the SE (tone conversion = decode through the flow with the
source SE forward and the target SE inverse), and a HiFi-GAN decoder (reuses
models/cosyvoice vocoder blocks at the 22.05 kHz geometry: hop 256 = 4×8×8).

Converter maths: z_src = flow(enc(spec_src) | se_src); ŷ = dec(flow⁻¹(z_src |
se_tgt)) — the flow is exactly invertible, verified in tests.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .common import Params, dense, init_dense
from .cosyvoice import VocoderConfig, init_vocoder, vocode


@dataclasses.dataclass(frozen=True)
class OpenVoiceConfig:
    n_spec: int = 513              # 1024-point STFT bins
    hidden: int = 192
    se_dim: int = 256              # gin_channels=256 (openvoice_api.py:50-69)
    flow_layers: int = 4
    wn_layers: int = 4
    wn_kernel: int = 5
    sample_rate: int = 22_050
    hop: int = 256

    @property
    def vocoder(self) -> VocoderConfig:
        return VocoderConfig(
            n_mels=self.hidden,
            base_channels=256,
            upsample_rates=(8, 8, 4),
            upsample_kernels=(16, 16, 8),
        )


def _init_conv1d(key, width, in_ch, out_ch):
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


def _init_wn(key, cfg: OpenVoiceConfig, in_ch: int, out_ch: int) -> Params:
    """WaveNet-ish stack with gated tanh units and SE conditioning."""
    ks = iter(jax.random.split(key, 4 * cfg.wn_layers + 4))
    h = cfg.hidden
    return {
        "pre": _init_conv1d(next(ks), 1, in_ch, h),
        "layers": [
            {
                "dil": _init_conv1d(next(ks), cfg.wn_kernel, h, 2 * h),
                "cond": init_dense(next(ks), cfg.se_dim, 2 * h),
                "res": _init_conv1d(next(ks), 1, h, h),
            }
            for i in range(cfg.wn_layers)
        ],
        "post": _init_conv1d(next(ks), 1, h, out_ch),
    }


def _wn(p: Params, x: jnp.ndarray, se: jnp.ndarray, *, dilation_base: int = 2) -> jnp.ndarray:
    h = _conv1d(p["pre"], x)
    for i, layer in enumerate(p["layers"]):
        z = _conv1d(layer["dil"], h, dilation=dilation_base**i) + dense(layer["cond"], se)[:, None, :]
        a, b = jnp.split(z, 2, axis=-1)
        gated = jnp.tanh(a) * jax.nn.sigmoid(b)
        h = h + _conv1d(layer["res"], gated)
    return _conv1d(p["post"], h)


# ------------------------------------------------------------------ flow


def _init_coupling(key, cfg: OpenVoiceConfig) -> Params:
    half = cfg.hidden // 2
    return {"wn": _init_wn(key, cfg, half, half)}  # shift-only (mean) coupling


def init_openvoice(key, cfg: OpenVoiceConfig = OpenVoiceConfig()) -> Params:
    ks = iter(jax.random.split(key, cfg.flow_layers + 4))
    return {
        "enc": _init_wn(next(ks), cfg, cfg.n_spec, cfg.hidden),
        "flow": [_init_coupling(next(ks), cfg) for _ in range(cfg.flow_layers)],
        "se_encoder": _init_wn(next(ks), cfg, cfg.n_spec, cfg.se_dim),
        "dec": init_vocoder(next(ks), cfg.vocoder),
    }


def _coupling_fwd(p, cfg, x, se):
    """Additive coupling (VITS ResidualCouplingLayer, mean-only): exactly invertible."""
    a, b = jnp.split(x, 2, axis=-1)
    m = _wn(p["wn"], a, se)
    return jnp.concatenate([a, b + m], axis=-1)


def _coupling_inv(p, cfg, y, se):
    a, bm = jnp.split(y, 2, axis=-1)
    m = _wn(p["wn"], a, se)
    return jnp.concatenate([a, bm - m], axis=-1)


def _flip(x):
    return jnp.flip(x, axis=-1)


def flow_forward(params: Params, cfg: OpenVoiceConfig, z: jnp.ndarray, se: jnp.ndarray) -> jnp.ndarray:
    for layer in params["flow"]:
        z = _coupling_fwd(layer, cfg, z, se)
        z = _flip(z)
    return z


def flow_inverse(params: Params, cfg: OpenVoiceConfig, z: jnp.ndarray, se: jnp.ndarray) -> jnp.ndarray:
    for layer in reversed(params["flow"]):
        z = _flip(z)
        z = _coupling_inv(layer, cfg, z, se)
    return z


# ------------------------------------------------------------------ public API


def extract_se(params: Params, cfg: OpenVoiceConfig, spec: jnp.ndarray) -> jnp.ndarray:
    """Speaker embedding from a spectrogram [B, T, n_spec] → [B, se_dim]
    (se_extractor.get_se parity; reference normalises to [1,256,1] —
    create_embedding.py)."""
    h = _wn(params["se_encoder"], spec, jnp.zeros((spec.shape[0], cfg.se_dim)))
    return jnp.mean(h, axis=1)


def spectrogram_22k(audio: jnp.ndarray) -> jnp.ndarray:
    """Linear magnitude spectrogram at the converter's native geometry."""
    from ..ops import spectrogram

    return spectrogram(audio, 1024, 256, power=1.0)


def convert_tone(
    params: Params,
    cfg: OpenVoiceConfig,
    source_audio_22k: jnp.ndarray,    # [B, T]
    se_source: jnp.ndarray,           # [B, se_dim]
    se_target: jnp.ndarray,           # [B, se_dim]
) -> jnp.ndarray:
    """Timbre conversion at 22 050 Hz (openvoice_api.py:141-155 semantics)."""
    spec = spectrogram_22k(source_audio_22k)
    h = _wn(params["enc"], spec, se_source)
    z = flow_forward(params, cfg, h, se_source)
    h_tgt = flow_inverse(params, cfg, z, se_target)
    return vocode(params["dec"], cfg.vocoder, h_tgt)
