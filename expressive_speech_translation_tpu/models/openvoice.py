"""OpenVoice v2 tone-color converter — checkpoint-exact.

Replaces the reference's OpenVoice service (Docker/openvoice_api.py:39-288):
256-d speaker embeddings ("SE", shape-normalised to [1,256,1], :50-69 and
Docker/create_embedding.py), ``/clone-voice`` converting a source utterance's
timbre toward a target SE while keeping content/prosody, native 22 050 Hz.

The architecture matches the surviving converter spec
(/root/reference/checkpoints_v2/converter/config.json: inter/hidden 192,
gin_channels 256, zero_g, HiFi-GAN upsample (8,8,2,2)@512, resblocks
(3,7,11)×(1,3,5)) — the VITS SynthesizerTrn voice-conversion subset:

- PosteriorEncoder: 1×1 pre-conv → 16-layer gated WaveNet (kernel 5,
  dilation 1, per-layer SE conditioning via a shared cond projection) →
  1×1 proj to (mean, logσ); z = m + ε·exp(logσ)·τ (τ=0.3 at the API,
  ε=0 → deterministic mode here).
- ResidualCouplingBlock: 4 mean-only coupling layers (4-layer WN each,
  SE-conditioned) with channel flips — exactly invertible.
- HiFi-GAN Generator: conv_pre 7 → 4 transposed-conv upsamples → 3-kernel
  ResBlock1 banks (leaky 0.1) → conv_post 7 (no bias) → tanh; SE enters
  through a 1×1 cond conv (zeroed when zero_g).
- ReferenceEncoder: six stride-2 2-D convs over the spectrogram → GRU →
  linear → the 256-d SE (se_extractor.get_se's model path).

Conversion (models.py voice_conversion, zero_g=True): enc_q and the decoder
see ZERO conditioning; only the flow carries speaker identity —
z = enc(spec); z_p = flow(z | se_src); ẑ = flow⁻¹(z_p | se_tgt); ŷ = dec(ẑ).

TPU-first: NHC/NHWC layouts, weight-norm resolved at conversion time, GRU as
a lax.scan. Converter: :func:`from_openvoice_state_dict`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .common import Params, dense, init_dense


@dataclasses.dataclass(frozen=True)
class OpenVoiceConfig:
    # data (config.json "data")
    sample_rate: int = 22_050
    n_fft: int = 1024
    hop: int = 256
    # model (config.json "model")
    n_spec: int = 513
    inter_channels: int = 192
    hidden: int = 192
    se_dim: int = 256              # gin_channels
    zero_g: bool = True
    n_flows: int = 4
    flow_wn_layers: int = 4
    post_wn_layers: int = 16
    wn_kernel: int = 5
    resblock_kernels: Tuple[int, ...] = (3, 7, 11)
    resblock_dilations: Tuple[Tuple[int, ...], ...] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    upsample_rates: Tuple[int, ...] = (8, 8, 2, 2)
    upsample_kernels: Tuple[int, ...] = (16, 16, 4, 4)
    upsample_initial: int = 512
    ref_filters: Tuple[int, ...] = (32, 32, 64, 64, 128, 128)
    tau: float = 0.3               # openvoice_api convert(tau=0.3)


class _Keys:
    def __init__(self, key):
        self._key = key

    def __call__(self):
        self._key, sub = jax.random.split(self._key)
        return sub


# ------------------------------------------------------------------ primitives


def _init_conv1d(key, width, in_ch, out_ch, *, bias=True):
    scale = 1.0 / np.sqrt(in_ch * width)
    p = {"kernel": jax.random.uniform(key, (width, in_ch, out_ch), jnp.float32, -scale, scale)}
    if bias:
        p["bias"] = jnp.zeros((out_ch,))
    return p


def _conv1d(p, x, *, dilation=1, pad: Optional[int] = None):
    x = x.astype(p["kernel"].dtype)
    width = p["kernel"].shape[0]
    if pad is None:
        pad = dilation * (width - 1) // 2
    y = jax.lax.conv_general_dilated(
        x, p["kernel"], (1,), [(pad, pad)], rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"))
    return y + p["bias"] if "bias" in p else y


def _conv_transpose1d(p, x, *, stride, torch_pad):
    """torch ConvTranspose1d parity via lhs-dilated conv. The converter
    stores the kernel already k-flipped/axis-swapped to HIO."""
    k = p["kernel"].shape[0]
    edge = k - 1 - torch_pad
    return jax.lax.conv_general_dilated(
        x.astype(p["kernel"].dtype), p["kernel"], (1,), [(edge, edge)],
        lhs_dilation=(stride,), dimension_numbers=("NHC", "HIO", "NHC"),
    ) + p["bias"]


def _init_conv2d(key, width, in_ch, out_ch):
    scale = 1.0 / np.sqrt(in_ch * width * width)
    return {"kernel": jax.random.uniform(key, (width, width, in_ch, out_ch), jnp.float32, -scale, scale),
            "bias": jnp.zeros((out_ch,))}


def _conv2d_s2(p, x):
    """3×3 stride-2 pad-1 conv (ReferenceEncoder stack)."""
    return jax.lax.conv_general_dilated(
        x.astype(p["kernel"].dtype), p["kernel"], (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["bias"]


# ----------------------------------------------------------------- WaveNet WN


def _init_wn(key, cfg: OpenVoiceConfig, n_layers: int) -> Params:
    """VITS modules.WN: gated tanh units, shared cond projection (one 1×1
    conv gin → 2·h·n_layers), residual+skip 1×1 convs (skip-only last)."""
    ks = _Keys(key)
    h = cfg.hidden
    return {
        "cond": _init_conv1d(ks(), 1, cfg.se_dim, 2 * h * n_layers),
        "in": [_init_conv1d(ks(), cfg.wn_kernel, h, 2 * h) for _ in range(n_layers)],
        "res_skip": [
            _init_conv1d(ks(), 1, h, 2 * h if i < n_layers - 1 else h)
            for i in range(n_layers)
        ],
    }


def _wn(p: Params, x: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """x [B,T,h], g [B,se_dim] → [B,T,h] (modules.WN.forward, dilation 1)."""
    h = x.shape[-1]
    n_layers = len(p["in"])
    cond = _conv1d(p["cond"], g[:, None, :])   # [B,1,2h·L]
    out = jnp.zeros_like(x)
    for i in range(n_layers):
        z = _conv1d(p["in"][i], x) + cond[..., 2 * h * i: 2 * h * (i + 1)]
        acts = jnp.tanh(z[..., :h]) * jax.nn.sigmoid(z[..., h:])
        rs = _conv1d(p["res_skip"][i], acts)
        if i < n_layers - 1:
            x = x + rs[..., :h]
            out = out + rs[..., h:]
        else:
            out = out + rs
    return out


# ---------------------------------------------------------- posterior encoder


def _init_posterior(key, cfg: OpenVoiceConfig) -> Params:
    ks = _Keys(key)
    return {
        "pre": _init_conv1d(ks(), 1, cfg.n_spec, cfg.hidden),
        "wn": _init_wn(ks(), cfg, cfg.post_wn_layers),
        "proj": _init_conv1d(ks(), 1, cfg.hidden, 2 * cfg.inter_channels),
    }


def posterior_encode(
    params: Params, cfg: OpenVoiceConfig, spec: jnp.ndarray, g: jnp.ndarray,
    *, tau: float = 0.0, key=None,
) -> jnp.ndarray:
    """spec [B,T,n_spec] → z [B,T,inter] (models.py PosteriorEncoder: m + ε·σ·τ;
    deterministic mode — ε=0 — when no key is given)."""
    h = _conv1d(params["pre"], spec)
    h = _wn(params["wn"], h, g)
    stats = _conv1d(params["proj"], h)
    m, logs = jnp.split(stats, 2, axis=-1)
    if key is None or tau == 0.0:
        return m
    return m + jax.random.normal(key, m.shape, m.dtype) * jnp.exp(logs) * tau


# ------------------------------------------------------------------------ flow


def _init_coupling(key, cfg: OpenVoiceConfig) -> Params:
    ks = _Keys(key)
    half = cfg.inter_channels // 2
    return {
        "pre": _init_conv1d(ks(), 1, half, cfg.hidden),
        "wn": _init_wn(ks(), cfg, cfg.flow_wn_layers),
        # post is zero-initialised in VITS (identity flow at init)
        "post": {"kernel": jnp.zeros((1, cfg.hidden, half)), "bias": jnp.zeros((half,))},
    }


def init_openvoice(key, cfg: OpenVoiceConfig = OpenVoiceConfig()) -> Params:
    ks = _Keys(key)
    return {
        "enc_q": _init_posterior(ks(), cfg),
        "flow": [_init_coupling(ks(), cfg) for _ in range(cfg.n_flows)],
        "dec": _init_generator(ks(), cfg),
        "ref_enc": _init_ref_encoder(ks(), cfg),
    }


def _coupling_mean(p, x0, g):
    return _conv1d(p["post"], _wn(p["wn"], _conv1d(p["pre"], x0), g))


def flow_forward(params: Params, cfg: OpenVoiceConfig, z: jnp.ndarray, se: jnp.ndarray) -> jnp.ndarray:
    """Mean-only residual coupling (+ channel flip per layer) — exactly
    invertible; conditioning carries the speaker identity."""
    for layer in params["flow"]:
        x0, x1 = jnp.split(z, 2, axis=-1)
        z = jnp.concatenate([x0, x1 + _coupling_mean(layer, x0, se)], axis=-1)
        z = jnp.flip(z, axis=-1)   # modules.Flip (channel dim)
    return z


def flow_inverse(params: Params, cfg: OpenVoiceConfig, z: jnp.ndarray, se: jnp.ndarray) -> jnp.ndarray:
    for layer in reversed(params["flow"]):
        z = jnp.flip(z, axis=-1)
        x0, x1 = jnp.split(z, 2, axis=-1)
        z = jnp.concatenate([x0, x1 - _coupling_mean(layer, x0, se)], axis=-1)
    return z


# ------------------------------------------------------------ HiFi-GAN decoder


def _init_generator(key, cfg: OpenVoiceConfig) -> Params:
    ks = _Keys(key)
    u0 = cfg.upsample_initial
    p: Dict[str, Any] = {
        "conv_pre": _init_conv1d(ks(), 7, cfg.inter_channels, u0),
        "cond": _init_conv1d(ks(), 1, cfg.se_dim, u0),
        "ups": [], "resblocks": [],
    }
    ch = u0
    for u, k in zip(cfg.upsample_rates, cfg.upsample_kernels):
        p["ups"].append(_init_conv1d(ks(), k, ch, ch // 2))   # stored HIO post-flip
        ch //= 2
        for kr, dils in zip(cfg.resblock_kernels, cfg.resblock_dilations):
            p["resblocks"].append({
                "convs1": [_init_conv1d(ks(), kr, ch, ch) for _ in dils],
                "convs2": [_init_conv1d(ks(), kr, ch, ch) for _ in dils],
            })
    p["conv_post"] = _init_conv1d(ks(), 7, ch, 1, bias=False)
    return p


def _resblock1(p, x, kernel, dils):
    """HiFi-GAN ResBlock1: (lrelu → dilated conv → lrelu → conv) ×3 residual."""
    for c1, c2, d in zip(p["convs1"], p["convs2"], dils):
        xt = _conv1d(c1, jax.nn.leaky_relu(x, 0.1), dilation=d)
        xt = _conv1d(c2, jax.nn.leaky_relu(xt, 0.1))
        x = x + xt
    return x


def generator_decode(params: Params, cfg: OpenVoiceConfig, z: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """z [B,T,inter] + SE [B,se_dim] → waveform [B, T·prod(rates)]."""
    x = _conv1d(params["conv_pre"], z)
    x = x + _conv1d(params["cond"], g[:, None, :])
    n_k = len(cfg.resblock_kernels)
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernels)):
        x = jax.nn.leaky_relu(x, 0.1)
        x = _conv_transpose1d(params["ups"][i], x, stride=u, torch_pad=(k - u) // 2)
        acc = None
        for j, (kr, dils) in enumerate(zip(cfg.resblock_kernels, cfg.resblock_dilations)):
            y = _resblock1(params["resblocks"][i * n_k + j], x, kr, dils)
            acc = y if acc is None else acc + y
        x = acc / n_k
    x = _conv1d(params["conv_post"], jax.nn.leaky_relu(x))   # default slope 0.01
    return jnp.tanh(x)[..., 0]


# --------------------------------------------------------- reference encoder


def _init_ref_encoder(key, cfg: OpenVoiceConfig) -> Params:
    ks = _Keys(key)
    filters = (1,) + cfg.ref_filters
    gru_h = cfg.se_dim // 2
    # post-conv frequency size after len(filters)-1 stride-2 convs
    f = cfg.n_spec
    for _ in cfg.ref_filters:
        f = (f - 1) // 2 + 1
    return {
        "convs": [_init_conv2d(ks(), 3, filters[i], filters[i + 1])
                  for i in range(len(cfg.ref_filters))],
        "gru": {
            "wi": init_dense(ks(), cfg.ref_filters[-1] * f, 3 * gru_h),
            "wh": init_dense(ks(), gru_h, 3 * gru_h),
        },
        "proj": init_dense(ks(), gru_h, cfg.se_dim),
    }


def _gru(p, x):
    """torch nn.GRU (single layer, batch_first) as a lax.scan; returns the
    final hidden state [B, H]. Gate order r|z|n (torch weight layout)."""
    h_dim = p["wh"]["kernel"].shape[0]
    xw = dense(p["wi"], x)   # [B,T,3H]

    def step(h, xt):
        hw = dense(p["wh"], h)
        r = jax.nn.sigmoid(xt[..., :h_dim] + hw[..., :h_dim])
        z = jax.nn.sigmoid(xt[..., h_dim:2 * h_dim] + hw[..., h_dim:2 * h_dim])
        n = jnp.tanh(xt[..., 2 * h_dim:] + r * hw[..., 2 * h_dim:])
        h = (1 - z) * n + z * h
        return h, None

    h0 = jnp.zeros((x.shape[0], h_dim), x.dtype)
    h_final, _ = jax.lax.scan(step, h0, jnp.swapaxes(xw, 0, 1))
    return h_final


def extract_se(params: Params, cfg: OpenVoiceConfig, spec: jnp.ndarray) -> jnp.ndarray:
    """Speaker embedding from a spectrogram [B, T, n_spec] → [B, se_dim]
    (models.py ReferenceEncoder: 6 stride-2 convs → GRU → linear; the
    se_extractor.get_se model path; reference normalises to [1,256,1] —
    create_embedding.py)."""
    x = spec[..., None]   # [B, T, F, 1]
    for conv in params["ref_enc"]["convs"]:
        x = jax.nn.relu(_conv2d_s2(conv, x))
    b, t, f, c = x.shape
    # torch flattens [N, T', C, F'].view(N, T', -1) — channel-major — so the
    # GRU's weight_ih_l0 input ordering is (c, f); transpose before reshape
    # or converted checkpoints see a permuted input (observable once F' > 1).
    x = x.transpose(0, 1, 3, 2).reshape(b, t, c * f)
    h = _gru(params["ref_enc"]["gru"], x)
    return dense(params["ref_enc"]["proj"], h)


# ------------------------------------------------------------------ public API


def spectrogram_22k(audio: jnp.ndarray, cfg: OpenVoiceConfig = OpenVoiceConfig()) -> jnp.ndarray:
    """VITS spectrogram_torch parity: reflect pad (n_fft−hop)/2, center=False,
    hann, magnitude √(re²+im²+1e-6). [B,T] → [B, frames, n_spec]."""
    from ..ops.stft import stft

    pad = (cfg.n_fft - cfg.hop) // 2
    x = jnp.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(pad, pad)], mode="reflect")
    real, imag = stft(x, cfg.n_fft, cfg.hop, center=False)
    return jnp.sqrt(real * real + imag * imag + 1e-6)


def convert_tone(
    params: Params,
    cfg: OpenVoiceConfig,
    source_audio_22k: jnp.ndarray,    # [B, T]
    se_source: jnp.ndarray,           # [B, se_dim]
    se_target: jnp.ndarray,           # [B, se_dim]
    *,
    tau: Optional[float] = None,
    key=None,
) -> jnp.ndarray:
    """Timbre conversion at 22 050 Hz (models.py voice_conversion /
    openvoice_api.py:141-155 semantics). zero_g: enc_q and the decoder take
    zero conditioning; identity flows only through the coupling layers."""
    spec = spectrogram_22k(source_audio_22k, cfg)
    zeros = jnp.zeros_like(se_source)
    g_enc = zeros if cfg.zero_g else se_source
    g_dec = zeros if cfg.zero_g else se_target
    z = posterior_encode(params["enc_q"], cfg, spec, g_enc,
                         tau=cfg.tau if tau is None else tau, key=key)
    z_p = flow_forward(params, cfg, z, se_source)
    z_hat = flow_inverse(params, cfg, z_p, se_target)
    return generator_decode(params["dec"], cfg, z_hat, g_dec)


# ------------------------------------------------------------------ converter


def _t(w) -> np.ndarray:
    import torch

    if isinstance(w, torch.Tensor):
        w = w.detach().to(torch.float32).cpu().numpy()
    return np.asarray(w, np.float32)


def _resolve_wn_weight(sd, prefix) -> np.ndarray:
    """weight_norm(conv).weight = g · v/‖v‖ (norm over (in,k) per out-chan)."""
    if f"{prefix}.weight" in sd:
        return _t(sd[f"{prefix}.weight"])
    g = _t(sd[f"{prefix}.weight_g"])
    v = _t(sd[f"{prefix}.weight_v"])
    norm = np.sqrt((v ** 2).sum(axis=tuple(range(1, v.ndim)), keepdims=True))
    return g * v / np.maximum(norm, 1e-12)


def _conv1d_p(sd, prefix, *, bias=True) -> Params:
    w = _resolve_wn_weight(sd, prefix)      # [out, in, k]
    p = {"kernel": jnp.asarray(w.transpose(2, 1, 0))}
    if bias and f"{prefix}.bias" in sd:
        p["bias"] = jnp.asarray(_t(sd[f"{prefix}.bias"]))
    return p


def _convT1d_p(sd, prefix) -> Params:
    # torch ConvTranspose1d weight [in, out, k] → flip k → HIO [k, in, out]
    w = _resolve_wn_weight(sd, prefix)
    w = w[:, :, ::-1].transpose(2, 0, 1)
    return {"kernel": jnp.asarray(np.ascontiguousarray(w)),
            "bias": jnp.asarray(_t(sd[f"{prefix}.bias"]))}


def _conv2d_p(sd, prefix) -> Params:
    w = _resolve_wn_weight(sd, prefix)      # [out, in, kh, kw]
    return {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(_t(sd[f"{prefix}.bias"]))}


def _wn_p(sd, prefix, n_layers) -> Params:
    return {
        "cond": _conv1d_p(sd, f"{prefix}.cond_layer"),
        "in": [_conv1d_p(sd, f"{prefix}.in_layers.{i}") for i in range(n_layers)],
        "res_skip": [_conv1d_p(sd, f"{prefix}.res_skip_layers.{i}")
                     for i in range(n_layers)],
    }


def from_openvoice_state_dict(sd: Dict[str, Any], cfg: OpenVoiceConfig) -> Params:
    """OpenVoice v2 converter checkpoint (checkpoint.pth 'model' tree,
    SynthesizerTrn naming) → params. Weight norm resolved; flows keep only
    the even indices (odd entries are parameter-free Flips)."""
    sd = dict(sd)
    if "model" in sd and not hasattr(sd["model"], "shape"):
        sd = sd["model"]

    enc_q = {
        "pre": _conv1d_p(sd, "enc_q.pre"),
        "wn": _wn_p(sd, "enc_q.enc", cfg.post_wn_layers),
        "proj": _conv1d_p(sd, "enc_q.proj"),
    }
    flows = []
    for i in range(0, 2 * cfg.n_flows, 2):   # VITS stores [coupling, Flip]×n
        flows.append({
            "pre": _conv1d_p(sd, f"flow.flows.{i}.pre"),
            "wn": _wn_p(sd, f"flow.flows.{i}.enc", cfg.flow_wn_layers),
            "post": _conv1d_p(sd, f"flow.flows.{i}.post"),
        })
    n_k = len(cfg.resblock_kernels)
    dec = {
        "conv_pre": _conv1d_p(sd, "dec.conv_pre"),
        "cond": _conv1d_p(sd, "dec.cond"),
        "ups": [_convT1d_p(sd, f"dec.ups.{i}")
                for i in range(len(cfg.upsample_rates))],
        "resblocks": [
            {"convs1": [_conv1d_p(sd, f"dec.resblocks.{r}.convs1.{j}")
                        for j in range(len(cfg.resblock_dilations[r % n_k]))],
             "convs2": [_conv1d_p(sd, f"dec.resblocks.{r}.convs2.{j}")
                        for j in range(len(cfg.resblock_dilations[r % n_k]))]}
            for r in range(len(cfg.upsample_rates) * n_k)
        ],
        "conv_post": _conv1d_p(sd, "dec.conv_post", bias=False),
    }
    ref = {
        "convs": [_conv2d_p(sd, f"ref_enc.convs.{i}")
                  for i in range(len(cfg.ref_filters))],
        "gru": {
            "wi": {"kernel": jnp.asarray(_t(sd["ref_enc.gru.weight_ih_l0"]).T),
                   "bias": jnp.asarray(_t(sd["ref_enc.gru.bias_ih_l0"]))},
            "wh": {"kernel": jnp.asarray(_t(sd["ref_enc.gru.weight_hh_l0"]).T),
                   "bias": jnp.asarray(_t(sd["ref_enc.gru.bias_hh_l0"]))},
        },
        "proj": {"kernel": jnp.asarray(_t(sd["ref_enc.proj.weight"]).T),
                 "bias": jnp.asarray(_t(sd["ref_enc.proj.bias"]))},
    }
    return {"enc_q": enc_q, "flow": flows, "dec": dec, "ref_enc": ref}
