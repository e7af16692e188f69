"""HiFT vocoder (models/hift.py) — official CosyVoice2 HiFTGenerator rebuild.

Validation strategy (no real hift.pt ships in either repo):
1. The tiny iSTFT head is checked against **real torch.stft/istft** — exact
   external ground truth for the head's math.
2. A torch mirror of the generator, built with the official module naming
   (weight-normed convs, Snake resblocks, NSF source), provides (a) a real
   ``state_dict()`` to drive :func:`from_hift_state_dict` and (b) independent
   numerics for the full decode path.
3. Converter round-trip: our tree → official naming → our tree, identity.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from expressive_speech_translation_tpu.models import hift as hm

torch.manual_seed(0)


# ---------------------------------------------------------------- iSTFT head


def test_stft_small_matches_torch():
    g = np.random.default_rng(0)
    x = g.standard_normal((2, 480)).astype(np.float32)
    real, imag = hm.stft_small(jnp.asarray(x), 16, 4)
    win = torch.hann_window(16, periodic=True)
    spec = torch.stft(torch.from_numpy(x), 16, 4, 16, window=win,
                      return_complex=True)          # [B, 9, F]
    np.testing.assert_allclose(np.asarray(real),
                               spec.real.numpy().transpose(0, 2, 1),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(imag),
                               spec.imag.numpy().transpose(0, 2, 1),
                               atol=1e-4)


def test_istft_small_matches_torch():
    g = np.random.default_rng(1)
    real = g.standard_normal((2, 31, 9)).astype(np.float32)
    imag = g.standard_normal((2, 31, 9)).astype(np.float32)
    out = hm.istft_small(jnp.asarray(real), jnp.asarray(imag), 16, 4)
    win = torch.hann_window(16, periodic=True)
    ref = torch.istft(torch.complex(torch.from_numpy(real),
                                    torch.from_numpy(imag)).transpose(1, 2),
                      16, 4, 16, window=win)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-4)


def test_stft_istft_roundtrip():
    g = np.random.default_rng(2)
    x = g.standard_normal((1, 960)).astype(np.float32)
    real, imag = hm.stft_small(jnp.asarray(x), 16, 4)
    y = hm.istft_small(real, imag, 16, 4)
    np.testing.assert_allclose(np.asarray(y)[0, 8:-8], x[0, 8:-8], atol=1e-4)


# ------------------------------------------------------------- torch mirror


class Snake(nn.Module):
    def __init__(self, channels):
        super().__init__()
        # official cosyvoice Snake: 1-D (in_features,) parameter — the
        # mirror must use the REAL layout or the to_hift_state_dict
        # round-trip can't catch an export-shape regression
        self.alpha = nn.Parameter(torch.ones(channels))

    def forward(self, x):
        a = self.alpha[None, :, None]
        return x + torch.sin(a * x) ** 2 / (a + 1e-9)


class ResBlock(nn.Module):
    """cosyvoice.hifigan.generator.ResBlock (Snake activations)."""

    def __init__(self, channels, kernel_size, dilations):
        super().__init__()
        self.convs1 = nn.ModuleList([
            nn.utils.weight_norm(nn.Conv1d(
                channels, channels, kernel_size, 1, dilation=d,
                padding=d * (kernel_size - 1) // 2)) for d in dilations])
        self.convs2 = nn.ModuleList([
            nn.utils.weight_norm(nn.Conv1d(
                channels, channels, kernel_size, 1,
                padding=(kernel_size - 1) // 2)) for _ in dilations])
        self.activations1 = nn.ModuleList([Snake(channels) for _ in dilations])
        self.activations2 = nn.ModuleList([Snake(channels) for _ in dilations])

    def forward(self, x):
        for c1, c2, a1, a2 in zip(self.convs1, self.convs2,
                                  self.activations1, self.activations2):
            xt = a1(x)
            xt = c1(xt)
            xt = a2(xt)
            xt = c2(xt)
            x = x + xt
        return x


class ConvRNNF0Predictor(nn.Module):
    def __init__(self, in_channels, cond_channels):
        super().__init__()
        layers = []
        ch = in_channels
        for _ in range(5):
            layers += [nn.utils.weight_norm(
                nn.Conv1d(ch, cond_channels, 3, padding=1)), nn.ELU()]
            ch = cond_channels
        self.condnet = nn.Sequential(*layers)
        self.classifier = nn.Linear(cond_channels, 1)

    def forward(self, x):
        x = self.condnet(x)
        x = x.transpose(1, 2)
        return torch.abs(self.classifier(x).squeeze(-1))


class SourceModuleHnNSF(nn.Module):
    def __init__(self, harmonic_num):
        super().__init__()
        self.l_linear = nn.Linear(harmonic_num + 1, 1)


class HiFTMirror(nn.Module):
    """Official-naming torch mirror of HiFTGenerator (inference pieces)."""

    def __init__(self, cfg: hm.HiFTConfig):
        super().__init__()
        self.cfg = cfg
        ch = cfg.base_channels
        self.f0_predictor = ConvRNNF0Predictor(cfg.in_channels,
                                               cfg.f0_cond_channels)
        self.m_source = SourceModuleHnNSF(cfg.nb_harmonics)
        self.conv_pre = nn.utils.weight_norm(
            nn.Conv1d(cfg.in_channels, ch, 7, 1, padding=3))
        self.ups = nn.ModuleList()
        self.source_downs = nn.ModuleList()
        self.source_resblocks = nn.ModuleList()
        self.resblocks = nn.ModuleList()
        n_spec2 = cfg.istft_n_fft + 2
        downsample_rates = (1,) + tuple(reversed(cfg.upsample_rates))[:-1]
        down_cum = np.cumprod(downsample_rates)[::-1]
        for i, (r, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernels)):
            out_ch = ch // (2 ** (i + 1))
            self.ups.append(nn.utils.weight_norm(nn.ConvTranspose1d(
                ch // (2 ** i), out_ch, k, r, padding=(k - r) // 2)))
            u = int(down_cum[i])
            if u == 1:
                self.source_downs.append(nn.Conv1d(n_spec2, out_ch, 1, 1))
            else:
                self.source_downs.append(
                    nn.Conv1d(n_spec2, out_ch, u * 2, u, padding=u // 2))
            self.source_resblocks.append(ResBlock(
                out_ch, cfg.source_resblock_kernels[i],
                cfg.source_resblock_dilations[i]))
            for kk, dd in zip(cfg.resblock_kernels, cfg.resblock_dilations):
                self.resblocks.append(ResBlock(out_ch, kk, dd))
        self.conv_post = nn.utils.weight_norm(nn.Conv1d(
            ch // (2 ** len(cfg.upsample_rates)), n_spec2, 7, 1, padding=3))
        self.reflection_pad = nn.ReflectionPad1d((1, 0))
        self.stft_window = torch.hann_window(cfg.istft_n_fft, periodic=True)

    def _stft(self, x):
        spec = torch.stft(x, self.cfg.istft_n_fft, self.cfg.istft_hop,
                          self.cfg.istft_n_fft, window=self.stft_window,
                          return_complex=True)
        return spec.real, spec.imag

    def _istft(self, magnitude, phase):
        magnitude = torch.clip(magnitude, max=1e2)
        real = magnitude * torch.cos(phase)
        img = magnitude * torch.sin(phase)
        return torch.istft(torch.complex(real, img), self.cfg.istft_n_fft,
                           self.cfg.istft_hop, self.cfg.istft_n_fft,
                           window=self.stft_window)

    def decode(self, x, s):
        cfg = self.cfg
        sr, si = self._stft(s.squeeze(1))
        s_stft = torch.cat([sr, si], dim=1)
        x = self.conv_pre(x)
        nk = len(cfg.resblock_kernels)
        for i in range(len(cfg.upsample_rates)):
            x = F.leaky_relu(x, cfg.lrelu_slope)
            x = self.ups[i](x)
            if i == len(cfg.upsample_rates) - 1:
                x = self.reflection_pad(x)
            s_i = self.source_downs[i](s_stft)
            s_i = self.source_resblocks[i](s_i)
            x = x + s_i
            xs = None
            for j in range(nk):
                y = self.resblocks[i * nk + j](x)
                xs = y if xs is None else xs + y
            x = xs / nk
        x = F.leaky_relu(x)
        x = self.conv_post(x)
        n_spec = cfg.n_spec
        magnitude = torch.exp(x[:, :n_spec, :])
        phase = torch.sin(x[:, n_spec:, :])
        out = self._istft(magnitude, phase)
        return torch.clamp(out, -cfg.audio_limit, cfg.audio_limit)


@pytest.fixture(scope="module")
def mirror_and_params():
    cfg = hm.HiFTConfig.tiny()
    mirror = HiFTMirror(cfg).eval()
    params = hm.from_hift_state_dict(
        {k: v for k, v in mirror.state_dict().items()}, cfg)
    return cfg, mirror, params


def test_converter_consumes_real_torch_state_dict(mirror_and_params):
    cfg, mirror, params = mirror_and_params
    assert len(params["resblocks"]) == 9
    assert params["conv_pre"]["kernel"].shape == (7, cfg.in_channels,
                                                  cfg.base_channels)


def test_f0_predictor_matches_torch(mirror_and_params):
    cfg, mirror, params = mirror_and_params
    g = np.random.default_rng(3)
    mel = g.standard_normal((2, 7, cfg.in_channels)).astype(np.float32)
    ours = hm.f0_predict(params, cfg, jnp.asarray(mel))
    with torch.no_grad():
        ref = mirror.f0_predictor(torch.from_numpy(mel).transpose(1, 2))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=2e-5)


def test_decode_matches_torch(mirror_and_params):
    """Full generator trunk (ups + source fusion + Snake resblocks + iSTFT
    head) vs the torch mirror on the same mel + source."""
    cfg, mirror, params = mirror_and_params
    g = np.random.default_rng(4)
    t = 6
    mel = g.standard_normal((2, t, cfg.in_channels)).astype(np.float32)
    src = (0.1 * g.standard_normal((2, t * cfg.hop, 1))).astype(np.float32)
    ours = hm.hift_decode(params, cfg, jnp.asarray(mel), jnp.asarray(src))
    with torch.no_grad():
        ref = mirror.decode(torch.from_numpy(mel).transpose(1, 2),
                            torch.from_numpy(src).transpose(1, 2))
    assert ours.shape == tuple(ref.shape)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=2e-3)


def test_harmonic_source_deterministic_math(mirror_and_params):
    """NSF sine source vs an independent numpy transcription of the official
    cumsum-phase construction (phases and noise zeroed)."""
    cfg, mirror, params = mirror_and_params
    f0 = np.asarray([[120.0, 120.0, 0.0, 200.0]], np.float32)
    ours = hm.harmonic_source(params, cfg, jax.random.PRNGKey(0),
                              jnp.asarray(f0), deterministic=True)
    # numpy reference
    f0_up = np.repeat(f0, cfg.hop, axis=1)
    mult = np.arange(1, cfg.nb_harmonics + 2, dtype=np.float64)
    f_mat = f0_up[:, None, :] * mult[None, :, None] / cfg.sampling_rate
    theta = 2 * np.pi * (np.cumsum(f_mat, axis=-1) % 1.0)
    sines = cfg.nsf_alpha * np.sin(theta)
    uv = (f0_up > cfg.nsf_voiced_threshold).astype(np.float64)[:, None, :]
    sines = sines * uv
    w = np.asarray(params["m_source"]["l_linear"]["kernel"])
    b = np.asarray(params["m_source"]["l_linear"]["bias"])
    ref = np.tanh(np.einsum("bht,ho->bto", sines, w) + b)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4)


def test_hift_roundtrip_and_inference(mirror_and_params):
    cfg, mirror, params = mirror_and_params
    state = hm.to_hift_state_dict(params, cfg)
    params2 = hm.from_hift_state_dict(state, cfg)
    l1 = jax.tree_util.tree_leaves(params)
    l2 = jax.tree_util.tree_leaves(params2)
    assert len(l1) == len(l2)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    g = np.random.default_rng(5)
    mel = g.standard_normal((1, 5, cfg.in_channels)).astype(np.float32)
    wave = hm.hift_inference(params, cfg, jax.random.PRNGKey(1), jnp.asarray(mel))
    assert wave.shape == (1, 5 * cfg.hop)
    assert np.isfinite(np.asarray(wave)).all()


def test_full_scale_shape_contract():
    """Official CosyVoice2-0.5B hift shapes (cosyvoice2.yaml hift:) — the
    emitted official-name keys must carry the documented shapes, so a real
    hift.pt maps 1:1."""
    cfg = hm.HiFTConfig()
    shapes = jax.eval_shape(lambda k: hm.init_hift(k, cfg),
                            jax.random.PRNGKey(0))
    assert shapes["conv_pre"]["kernel"].shape == (7, 80, 512)
    assert shapes["ups"][0]["kernel"].shape == (16, 512, 256)
    assert shapes["ups"][1]["kernel"].shape == (11, 256, 128)
    assert shapes["ups"][2]["kernel"].shape == (7, 128, 64)
    assert shapes["source_downs"][0]["kernel"].shape == (30, 18, 256)
    assert shapes["source_downs"][1]["kernel"].shape == (6, 18, 128)
    assert shapes["source_downs"][2]["kernel"].shape == (1, 18, 64)
    assert shapes["conv_post"]["kernel"].shape == (7, 64, 18)
    assert shapes["m_source"]["l_linear"]["kernel"].shape == (9, 1)
    assert len(shapes["resblocks"]) == 9
    assert cfg.hop == 480 and cfg.n_spec == 9
