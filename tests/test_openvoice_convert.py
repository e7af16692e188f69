"""OpenVoice converter parity: JAX tone-color converter vs a torch mirror of
the VITS SynthesizerTrn voice-conversion subset on SHARED tiny random weights.

The mirror re-states OpenVoice's models.py (PosteriorEncoder / WN /
ResidualCouplingBlock / HiFi-GAN Generator / ReferenceEncoder) in plain torch
with EXACT checkpoint naming — weight_norm applied where OpenVoice applies it,
so from_openvoice_state_dict's weight_g/weight_v resolution is exercised.
The default OpenVoiceConfig is additionally pinned against the SURVIVING
reference spec (/root/reference/checkpoints_v2/converter/config.json,
openvoice_api.py:50-69's gin_channels=256 validation)."""

import json
import math
import pathlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from expressive_speech_translation_tpu.models import openvoice as ov

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402
from torch.nn.utils import weight_norm  # noqa: E402

# n_spec=65 keeps F'=2 after the six stride-2 convs so the ReferenceEncoder
# flatten order (channel-major, torch .transpose(1,2).view) is observable —
# with F'=1 a frequency-major flatten would pass this test while corrupting
# real-checkpoint speaker embeddings.
CFG = ov.OpenVoiceConfig(
    n_spec=65, inter_channels=8, hidden=16, se_dim=16, n_flows=2,
    flow_wn_layers=2, post_wn_layers=3, upsample_initial=32,
    upsample_rates=(8, 8, 2, 2), upsample_kernels=(16, 16, 4, 4),
    resblock_kernels=(3, 7), resblock_dilations=((1, 3), (1, 3)),
    ref_filters=(4, 4, 8, 8, 16, 16),
)


# ------------------------------------------------------------- torch mirrors


class WN(nn.Module):
    def __init__(self, hidden, kernel, n_layers, gin):
        super().__init__()
        self.hidden = hidden
        self.n_layers = n_layers
        self.in_layers = nn.ModuleList(
            [weight_norm(nn.Conv1d(hidden, 2 * hidden, kernel,
                                   padding=(kernel - 1) // 2))
             for _ in range(n_layers)])
        self.res_skip_layers = nn.ModuleList(
            [weight_norm(nn.Conv1d(hidden, 2 * hidden if i < n_layers - 1 else hidden, 1))
             for i in range(n_layers)])
        self.cond_layer = weight_norm(nn.Conv1d(gin, 2 * hidden * n_layers, 1))

    def forward(self, x, g):
        out = torch.zeros_like(x)
        if g.dim() == 2:          # [B, gin] → [B, gin, 1] (VITS passes 3-D g)
            g = g.unsqueeze(-1)
        g = self.cond_layer(g)
        h = self.hidden
        for i in range(self.n_layers):
            z = self.in_layers[i](x) + g[:, 2 * h * i: 2 * h * (i + 1)]
            acts = torch.tanh(z[:, :h]) * torch.sigmoid(z[:, h:])
            rs = self.res_skip_layers[i](acts)
            if i < self.n_layers - 1:
                x = x + rs[:, :h]
                out = out + rs[:, h:]
            else:
                out = out + rs
        return out


class PosteriorEncoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.pre = nn.Conv1d(cfg.n_spec, cfg.hidden, 1)
        self.enc = WN(cfg.hidden, cfg.wn_kernel, cfg.post_wn_layers, cfg.se_dim)
        self.proj = nn.Conv1d(cfg.hidden, 2 * cfg.inter_channels, 1)

    def forward(self, spec, g):   # deterministic: returns the mean
        h = self.enc(self.pre(spec), g)
        m, _ = self.proj(h).chunk(2, dim=1)
        return m


class Coupling(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        half = cfg.inter_channels // 2
        self.pre = nn.Conv1d(half, cfg.hidden, 1)
        self.enc = WN(cfg.hidden, cfg.wn_kernel, cfg.flow_wn_layers, cfg.se_dim)
        self.post = nn.Conv1d(cfg.hidden, half, 1)

    def forward(self, x, g, reverse=False):
        half = x.shape[1] // 2
        x0, x1 = x[:, :half], x[:, half:]
        m = self.post(self.enc(self.pre(x0), g))
        x1 = x1 - m if reverse else x1 + m
        return torch.cat([x0, x1], dim=1)


class Flip(nn.Module):
    def forward(self, x, g=None, reverse=False):
        return torch.flip(x, [1])


class Flow(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        mods = []
        for _ in range(cfg.n_flows):
            mods += [Coupling(cfg), Flip()]
        self.flows = nn.ModuleList(mods)

    def forward(self, x, g, reverse=False):
        flows = reversed(self.flows) if reverse else self.flows
        for f in flows:
            x = f(x, g, reverse=reverse) if isinstance(f, Coupling) else f(x)
        return x


class ResBlock1(nn.Module):
    def __init__(self, ch, kernel, dils):
        super().__init__()
        self.convs1 = nn.ModuleList(
            [weight_norm(nn.Conv1d(ch, ch, kernel, dilation=d,
                                   padding=d * (kernel - 1) // 2)) for d in dils])
        self.convs2 = nn.ModuleList(
            [weight_norm(nn.Conv1d(ch, ch, kernel, padding=(kernel - 1) // 2))
             for _ in dils])

    def forward(self, x):
        for c1, c2 in zip(self.convs1, self.convs2):
            xt = c1(F.leaky_relu(x, 0.1))
            xt = c2(F.leaky_relu(xt, 0.1))
            x = x + xt
        return x


class Generator(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        u0 = cfg.upsample_initial
        self.conv_pre = nn.Conv1d(cfg.inter_channels, u0, 7, padding=3)
        self.cond = nn.Conv1d(cfg.se_dim, u0, 1)
        self.ups = nn.ModuleList()
        self.resblocks = nn.ModuleList()
        ch = u0
        for u, k in zip(cfg.upsample_rates, cfg.upsample_kernels):
            self.ups.append(weight_norm(
                nn.ConvTranspose1d(ch, ch // 2, k, stride=u, padding=(k - u) // 2)))
            ch //= 2
            for kr, dils in zip(cfg.resblock_kernels, cfg.resblock_dilations):
                self.resblocks.append(ResBlock1(ch, kr, dils))
        self.conv_post = nn.Conv1d(ch, 1, 7, padding=3, bias=False)
        self._nk = len(cfg.resblock_kernels)

    def forward(self, z, g):
        if g.dim() == 2:
            g = g.unsqueeze(-1)
        x = self.conv_pre(z) + self.cond(g)
        for i, up in enumerate(self.ups):
            x = up(F.leaky_relu(x, 0.1))
            acc = None
            for j in range(self._nk):
                y = self.resblocks[i * self._nk + j](x)
                acc = y if acc is None else acc + y
            x = acc / self._nk
        return torch.tanh(self.conv_post(F.leaky_relu(x))).squeeze(1)


class ReferenceEncoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        filters = (1,) + cfg.ref_filters
        self.convs = nn.ModuleList(
            [weight_norm(nn.Conv2d(filters[i], filters[i + 1], 3, stride=2, padding=1))
             for i in range(len(cfg.ref_filters))])
        f = cfg.n_spec
        for _ in cfg.ref_filters:
            f = (f - 1) // 2 + 1
        self.gru = nn.GRU(cfg.ref_filters[-1] * f, cfg.se_dim // 2, batch_first=True)
        self.proj = nn.Linear(cfg.se_dim // 2, cfg.se_dim)

    def forward(self, spec):     # [B, T, n_spec]
        b = spec.shape[0]
        out = spec.unsqueeze(1)
        for conv in self.convs:
            out = F.relu(conv(out))
        out = out.transpose(1, 2)                    # [B, T', C, F']
        out = out.reshape(b, out.shape[1], -1)
        _, h = self.gru(out)
        return self.proj(h.squeeze(0))


class TorchConverter(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.enc_q = PosteriorEncoder(cfg)
        self.flow = Flow(cfg)
        self.dec = Generator(cfg)
        self.ref_enc = ReferenceEncoder(cfg)

    def voice_conversion(self, spec, se_src, se_tgt):
        zeros = torch.zeros_like(se_src)
        z = self.enc_q(spec, zeros)                  # zero_g
        z_p = self.flow(z, se_src)
        z_hat = self.flow(z_p, se_tgt, reverse=True)
        return self.dec(z_hat, torch.zeros_like(se_tgt))


# ---------------------------------------------------------------------- tests


def test_default_config_matches_surviving_reference_spec():
    ref = pathlib.Path("/root/reference/checkpoints_v2/converter/config.json")
    if not ref.exists():
        pytest.skip("reference config not present")
    spec = json.loads(ref.read_text())
    cfg = ov.OpenVoiceConfig()
    m, d = spec["model"], spec["data"]
    assert cfg.se_dim == m["gin_channels"] == 256
    assert cfg.inter_channels == m["inter_channels"]
    assert cfg.hidden == m["hidden_channels"]
    assert cfg.zero_g == m["zero_g"]
    assert cfg.resblock_kernels == tuple(m["resblock_kernel_sizes"])
    assert cfg.upsample_rates == tuple(m["upsample_rates"])
    assert cfg.upsample_kernels == tuple(m["upsample_kernel_sizes"])
    assert cfg.upsample_initial == m["upsample_initial_channel"]
    assert cfg.sample_rate == d["sampling_rate"]
    assert cfg.n_fft == d["filter_length"]
    assert cfg.hop == d["hop_length"]
    assert cfg.n_spec == d["filter_length"] // 2 + 1


@pytest.mark.slow
def test_openvoice_converter_parity():
    torch.manual_seed(7)
    tm = TorchConverter(CFG).eval()
    # zero-init post convs are VITS-faithful but make the flow a no-op;
    # randomise them so the parity check exercises SE-dependent coupling
    with torch.no_grad():
        for f in tm.flow.flows:
            if isinstance(f, Coupling):
                f.post.weight.normal_(0, 0.3)
                f.post.bias.normal_(0, 0.1)
    params = ov.from_openvoice_state_dict(tm.state_dict(), CFG)

    g = np.random.default_rng(9)
    t_frames = 17
    spec = g.uniform(0.0, 1.0, (2, t_frames, CFG.n_spec)).astype(np.float32)
    se_src = g.standard_normal((2, CFG.se_dim)).astype(np.float32)
    se_tgt = g.standard_normal((2, CFG.se_dim)).astype(np.float32)

    # 1) reference encoder (SE extraction)
    with torch.no_grad():
        se_t = tm.ref_enc(torch.as_tensor(spec))
    se_j = ov.extract_se(params, CFG, jnp.asarray(spec))
    np.testing.assert_allclose(np.asarray(se_j), se_t.numpy(), atol=2e-4)

    # 2) full conversion (posterior mean → flow fwd → flow inv → generator)
    def t3(a):   # [B,T,C] → [B,C,T]
        return torch.as_tensor(a).transpose(1, 2)

    with torch.no_grad():
        out_t = tm.voice_conversion(t3(spec), torch.as_tensor(se_src),
                                    torch.as_tensor(se_tgt))
    z_j = ov.posterior_encode(params["enc_q"], CFG, jnp.asarray(spec),
                              jnp.zeros((2, CFG.se_dim)))
    zp_j = ov.flow_forward(params, CFG, z_j, jnp.asarray(se_src))
    zh_j = ov.flow_inverse(params, CFG, zp_j, jnp.asarray(se_tgt))
    out_j = ov.generator_decode(params["dec"], CFG, zh_j,
                                jnp.zeros((2, CFG.se_dim)))
    assert out_j.shape == (2, t_frames * int(np.prod(CFG.upsample_rates)))
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(), atol=2e-4)

    # 3) checkpoint wrapper format ({"model": …} as openvoice saves)
    params2 = ov.from_openvoice_state_dict({"model": tm.state_dict()}, CFG)
    out_j2 = ov.generator_decode(params2["dec"], CFG, zh_j,
                                 jnp.zeros((2, CFG.se_dim)))
    np.testing.assert_allclose(np.asarray(out_j2), np.asarray(out_j), atol=0)
