"""MuseTalk checkpoint-converter parity: JAX VAE/UNet vs a torch mirror of
the diffusers architectures on SHARED tiny random weights.

The reference loads sd-vae-ft-mse (diffusers AutoencoderKL) and MuseTalk's
UNet2DConditionModel (Docker/api_inference_logic.py:42-73 via
utils.load_all_model). diffusers is not installed in this environment, so the
mirrors below re-state those architectures in plain torch with EXACT diffusers
state-dict naming — models/musetalk.vae_from_hf_state_dict /
unet_from_hf_state_dict consume mirror.state_dict() directly, which pins both
the key mapping and the forward semantics (GN eps values, GEGLU, head layout,
asymmetric VAE downsample padding, scale factor 0.18215, cos|sin timestep
ordering)."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from expressive_speech_translation_tpu.models import musetalk as mt

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

CFG = mt.MuseTalkConfig(
    image_size=32, latent_channels=4,
    vae_channels=(8, 16), vae_layers=2,
    unet_channels=(8, 16), unet_layers=2,
    audio_dim=12, audio_ctx=10, heads=2, norm_groups=4,
)
G = CFG.norm_groups


# ------------------------------------------------------------- torch mirrors


class Resnet(nn.Module):
    def __init__(self, cin, cout, temb_dim=None, eps=1e-6):
        super().__init__()
        self.eps = eps
        self.norm1 = nn.GroupNorm(G, cin, eps=eps)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        if temb_dim is not None:
            self.time_emb_proj = nn.Linear(temb_dim, cout)
        self.norm2 = nn.GroupNorm(G, cout, eps=eps)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.conv_shortcut = nn.Conv2d(cin, cout, 1)

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if temb is not None and hasattr(self, "time_emb_proj"):
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        s = self.conv_shortcut(x) if hasattr(self, "conv_shortcut") else x
        return s + h


class VAEAttn(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.group_norm = nn.GroupNorm(G, ch, eps=1e-6)
        self.to_q = nn.Linear(ch, ch)
        self.to_k = nn.Linear(ch, ch)
        self.to_v = nn.Linear(ch, ch)
        self.to_out = nn.ModuleList([nn.Linear(ch, ch)])

    def forward(self, x):
        b, c, h, w = x.shape
        n = self.group_norm(x).reshape(b, c, h * w).transpose(1, 2)
        q, k, v = self.to_q(n), self.to_k(n), self.to_v(n)
        wts = torch.softmax(q @ k.transpose(1, 2) / math.sqrt(c), dim=-1)
        o = self.to_out[0](wts @ v)
        return x + o.transpose(1, 2).reshape(b, c, h, w)


class Down(nn.Module):
    """diffusers VAE Downsample2D: pad (0,1,0,1) + stride-2 valid conv."""

    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, stride=2, padding=0)

    def forward(self, x):
        return self.conv(F.pad(x, (0, 1, 0, 1)))


class DownBlock(nn.Module):
    def __init__(self, cin, cout, n, last):
        super().__init__()
        self.resnets = nn.ModuleList(
            [Resnet(cin if j == 0 else cout, cout) for j in range(n)])
        if not last:
            self.downsamplers = nn.ModuleList([Down(cout)])

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if hasattr(self, "downsamplers"):
            x = self.downsamplers[0](x)
        return x


class UpBlock(nn.Module):
    def __init__(self, cin, cout, n, last):
        super().__init__()
        self.resnets = nn.ModuleList(
            [Resnet(cin if j == 0 else cout, cout) for j in range(n)])
        if not last:
            class Up(nn.Module):
                def __init__(self, ch):
                    super().__init__()
                    self.conv = nn.Conv2d(ch, ch, 3, padding=1)

                def forward(self, x):
                    return self.conv(F.interpolate(x, scale_factor=2, mode="nearest"))

            self.upsamplers = nn.ModuleList([Up(cout)])

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if hasattr(self, "upsamplers"):
            x = self.upsamplers[0](x)
        return x


class Mid(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.resnets = nn.ModuleList([Resnet(ch, ch), Resnet(ch, ch)])
        self.attentions = nn.ModuleList([VAEAttn(ch)])

    def forward(self, x, temb=None):
        x = self.resnets[0](x, temb)
        x = self.attentions[0](x)
        return self.resnets[1](x, temb)


class Encoder(nn.Module):
    def __init__(self, chans, layers, lat):
        super().__init__()
        self.conv_in = nn.Conv2d(3, chans[0], 3, padding=1)
        self.down_blocks = nn.ModuleList()
        cin = chans[0]
        for i, ch in enumerate(chans):
            self.down_blocks.append(DownBlock(cin, ch, layers, i == len(chans) - 1))
            cin = ch
        self.mid_block = Mid(chans[-1])
        self.conv_norm_out = nn.GroupNorm(G, chans[-1], eps=1e-6)
        self.conv_out = nn.Conv2d(chans[-1], 2 * lat, 3, padding=1)

    def forward(self, x):
        x = self.conv_in(x)
        for b in self.down_blocks:
            x = b(x)
        x = self.mid_block(x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class Decoder(nn.Module):
    def __init__(self, chans, layers, lat):
        super().__init__()
        rev = list(reversed(chans))
        self.conv_in = nn.Conv2d(lat, rev[0], 3, padding=1)
        self.mid_block = Mid(rev[0])
        self.up_blocks = nn.ModuleList()
        cin = rev[0]
        for i, ch in enumerate(rev):
            self.up_blocks.append(UpBlock(cin, ch, layers + 1, i == len(rev) - 1))
            cin = ch
        self.conv_norm_out = nn.GroupNorm(G, chans[0], eps=1e-6)
        self.conv_out = nn.Conv2d(chans[0], 3, 3, padding=1)

    def forward(self, z):
        x = self.conv_in(z)
        x = self.mid_block(x)
        for b in self.up_blocks:
            x = b(x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class TorchVAE(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        lat = cfg.latent_channels
        self.encoder = Encoder(cfg.vae_channels, cfg.vae_layers, lat)
        self.decoder = Decoder(cfg.vae_channels, cfg.vae_layers, lat)
        self.quant_conv = nn.Conv2d(2 * lat, 2 * lat, 1)
        self.post_quant_conv = nn.Conv2d(lat, lat, 1)

    def encode_mode(self, x):
        moments = self.quant_conv(self.encoder(x))
        mean, _ = moments.chunk(2, dim=1)
        return mean * mt.VAE_SCALE

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z / mt.VAE_SCALE))


# ----------------------------------------------------------------- UNet mirror


class GEGLU(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.proj = nn.Linear(ch, 8 * ch)

    def forward(self, x):
        val, gate = self.proj(x).chunk(2, dim=-1)
        return val * F.gelu(gate)


class FF(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.net = nn.ModuleList([GEGLU(ch), nn.Identity(), nn.Linear(4 * ch, ch)])

    def forward(self, x):
        for m in self.net:
            x = m(x)
        return x


class CrossAttn(nn.Module):
    def __init__(self, ch, ctx, heads):
        super().__init__()
        self.heads = heads
        self.to_q = nn.Linear(ch, ch, bias=False)
        self.to_k = nn.Linear(ctx, ch, bias=False)
        self.to_v = nn.Linear(ctx, ch, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(ch, ch)])

    def forward(self, x, ctx=None):
        ctx = x if ctx is None else ctx
        b, n, c = x.shape
        h = self.heads
        q = self.to_q(x).reshape(b, n, h, c // h).transpose(1, 2)
        k = self.to_k(ctx).reshape(b, -1, h, c // h).transpose(1, 2)
        v = self.to_v(ctx).reshape(b, -1, h, c // h).transpose(1, 2)
        wts = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(c // h), dim=-1)
        o = (wts @ v).transpose(1, 2).reshape(b, n, c)
        return self.to_out[0](o)


class Basic(nn.Module):
    def __init__(self, ch, ctx, heads):
        super().__init__()
        self.norm1 = nn.LayerNorm(ch)
        self.attn1 = CrossAttn(ch, ch, heads)
        self.norm2 = nn.LayerNorm(ch)
        self.attn2 = CrossAttn(ch, ctx, heads)
        self.norm3 = nn.LayerNorm(ch)
        self.ff = FF(ch)

    def forward(self, x, ctx):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), ctx)
        return x + self.ff(self.norm3(x))


class Tfm2D(nn.Module):
    def __init__(self, ch, ctx, heads):
        super().__init__()
        self.norm = nn.GroupNorm(G, ch, eps=1e-6)
        self.proj_in = nn.Conv2d(ch, ch, 1)
        self.transformer_blocks = nn.ModuleList([Basic(ch, ctx, heads)])
        self.proj_out = nn.Conv2d(ch, ch, 1)

    def forward(self, x, ctx):
        b, c, h, w = x.shape
        res = x
        y = self.proj_in(self.norm(x))
        y = y.reshape(b, c, h * w).transpose(1, 2)
        y = self.transformer_blocks[0](y, ctx)
        y = y.transpose(1, 2).reshape(b, c, h, w)
        return res + self.proj_out(y)


class TorchUNet(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        chans = cfg.unet_channels
        te = cfg.time_embed_dim
        n = len(chans)
        self.conv_in = nn.Conv2d(2 * cfg.latent_channels, chans[0], 3, padding=1)

        class TE(nn.Module):
            def __init__(self):
                super().__init__()
                self.linear_1 = nn.Linear(chans[0], te)
                self.linear_2 = nn.Linear(te, te)

            def forward(self, x):
                return self.linear_2(F.silu(self.linear_1(x)))

        self.time_embedding = TE()

        self.down_blocks = nn.ModuleList()
        cin = chans[0]
        for i, ch in enumerate(chans):
            cross = i < n - 1
            blk = nn.Module()
            blk.resnets = nn.ModuleList(
                [Resnet(cin if j == 0 else ch, ch, temb_dim=te, eps=1e-5)
                 for j in range(cfg.unet_layers)])
            if cross:
                blk.attentions = nn.ModuleList(
                    [Tfm2D(ch, cfg.audio_dim, cfg.heads) for _ in range(cfg.unet_layers)])
            if i < n - 1:
                ds = nn.Module()
                ds.conv = nn.Conv2d(ch, ch, 3, stride=2, padding=1)
                blk.downsamplers = nn.ModuleList([ds])
            self.down_blocks.append(blk)
            cin = ch

        self.mid_block = nn.Module()
        self.mid_block.resnets = nn.ModuleList(
            [Resnet(chans[-1], chans[-1], temb_dim=te, eps=1e-5),
             Resnet(chans[-1], chans[-1], temb_dim=te, eps=1e-5)])
        self.mid_block.attentions = nn.ModuleList(
            [Tfm2D(chans[-1], cfg.audio_dim, cfg.heads)])

        rev = list(reversed(chans))
        self.up_blocks = nn.ModuleList()
        prev = rev[0]
        for i, ch in enumerate(rev):
            cross = i > 0
            skip_in = rev[min(i + 1, n - 1)]
            blk = nn.Module()
            resnets = []
            for j in range(cfg.unet_layers + 1):
                skip_ch = skip_in if j == cfg.unet_layers else ch
                res_in = prev if j == 0 else ch
                resnets.append(Resnet(res_in + skip_ch, ch, temb_dim=te, eps=1e-5))
            blk.resnets = nn.ModuleList(resnets)
            if cross:
                blk.attentions = nn.ModuleList(
                    [Tfm2D(ch, cfg.audio_dim, cfg.heads) for _ in range(cfg.unet_layers + 1)])
            if i < n - 1:
                us = nn.Module()
                us.conv = nn.Conv2d(ch, ch, 3, padding=1)
                blk.upsamplers = nn.ModuleList([us])
            prev = ch
            self.up_blocks.append(blk)

        self.conv_norm_out = nn.GroupNorm(G, chans[0], eps=1e-5)
        self.conv_out = nn.Conv2d(chans[0], cfg.latent_channels, 3, padding=1)
        self._cfg = cfg

    def forward(self, sample, t, ctx):
        cfg = self._cfg
        temb = torch.as_tensor(
            np.asarray(mt.timestep_embedding(jnp.asarray(t, jnp.float32),
                                             cfg.unet_channels[0])))
        emb = self.time_embedding(temb)

        x = self.conv_in(sample)
        skips = [x]
        for blk in self.down_blocks:
            for j, r in enumerate(blk.resnets):
                x = r(x, emb)
                if hasattr(blk, "attentions"):
                    x = blk.attentions[j](x, ctx)
                skips.append(x)
            if hasattr(blk, "downsamplers"):
                x = blk.downsamplers[0].conv(x)
                skips.append(x)

        x = self.mid_block.resnets[0](x, emb)
        x = self.mid_block.attentions[0](x, ctx)
        x = self.mid_block.resnets[1](x, emb)

        for blk in self.up_blocks:
            for j, r in enumerate(blk.resnets):
                x = r(torch.cat([x, skips.pop()], dim=1), emb)
                if hasattr(blk, "attentions"):
                    x = blk.attentions[j](x, ctx)
            if hasattr(blk, "upsamplers"):
                x = blk.upsamplers[0].conv(
                    F.interpolate(x, scale_factor=2, mode="nearest"))
        return self.conv_out(F.silu(self.conv_norm_out(x)))


# ---------------------------------------------------------------------- tests


@pytest.mark.slow
def test_vae_converter_parity():
    torch.manual_seed(0)
    tv = TorchVAE(CFG).eval()
    params = mt.vae_from_hf_state_dict(tv.state_dict(), CFG)

    g = np.random.default_rng(0)
    imgs = g.uniform(-1, 1, (2, CFG.image_size, CFG.image_size, 3)).astype(np.float32)
    with torch.no_grad():
        lat_t = tv.encode_mode(torch.as_tensor(imgs).permute(0, 3, 1, 2))
        rec_t = tv.decode(lat_t)
    lat_j = mt.vae_encode(params, CFG, jnp.asarray(imgs))
    rec_j = mt.vae_decode(params, CFG, lat_j)

    np.testing.assert_allclose(
        np.asarray(lat_j), lat_t.permute(0, 2, 3, 1).numpy(), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(rec_j), rec_t.permute(0, 2, 3, 1).numpy(), atol=2e-4)
    # geometry: 32×32 in → 8× downsample (sd-vae-ft-mse: 256→32 latents)
    assert lat_j.shape == (2, CFG.image_size // 2 ** (len(CFG.vae_channels) - 1),
                           CFG.image_size // 2 ** (len(CFG.vae_channels) - 1), 4)


@pytest.mark.slow
def test_unet_converter_parity_nonzero_timestep():
    torch.manual_seed(1)
    tu = TorchUNet(CFG).eval()
    params = mt.unet_from_hf_state_dict(tu.state_dict(), CFG)

    g = np.random.default_rng(1)
    size = CFG.image_size // 2 ** (len(CFG.vae_channels) - 1)
    lat8 = g.standard_normal((2, size, size, 8)).astype(np.float32)
    audio = g.standard_normal((2, CFG.audio_ctx, CFG.audio_dim)).astype(np.float32)

    # nonzero timestep exercises the full [cos|sin] embedding path, not just
    # the constant-at-0 row MuseTalk inference uses
    for t in (0.0, 7.0):
        with torch.no_grad():
            out_t = tu(torch.as_tensor(lat8).permute(0, 3, 1, 2),
                       np.full((2,), t, np.float32), torch.as_tensor(audio))
        out_j = mt.unet_apply(params, CFG, jnp.asarray(lat8), jnp.asarray(audio),
                              timestep=t)
        np.testing.assert_allclose(
            np.asarray(out_j), out_t.permute(0, 2, 3, 1).numpy(), atol=2e-4)


def test_positional_encoding_matches_reference_formula():
    """MuseTalk PositionalEncoding: additive sinusoid, no scaling."""
    x = jnp.zeros((1, 4, 6))
    pe = np.asarray(mt.positional_encoding(x))[0]
    d = 6
    pos = np.arange(4)[:, None]
    div = np.exp(np.arange(0, d, 2) * (-np.log(10_000.0) / d))
    np.testing.assert_allclose(pe[:, 0::2], np.sin(pos * div), atol=1e-6)
    np.testing.assert_allclose(pe[:, 1::2], np.cos(pos * div), atol=1e-6)
