"""diff2lip TFG UNet converter parity: models/gd_unet vs a torch mirror of
guided-diffusion's UNetModel/TFGModel on SHARED tiny random weights.

The mirror re-states Backend/diff2lip/guided_diffusion/unet.py's architecture
in plain torch with EXACT checkpoint key naming (input_blocks.k.j.in_layers.0,
qkv/proj_out attention convs, audio_encoder.encoder_blocks…,
audio_encoder_to_style…), including the LEGACY head-major qkv layout
(QKVAttentionLegacy, unet.py:332-363) and scale-shift GroupNorm ResBlocks —
so from_tfg_state_dict(mirror.state_dict()) pins both the key mapping and the
forward semantics the published Diff2Lip checkpoint needs."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from expressive_speech_translation_tpu.models import gd_unet as gd
from expressive_speech_translation_tpu.models.diffusion import timestep_embedding

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

CFG = gd.GDUNetConfig(
    image_size=16, in_channels=9, model_channels=8, out_channels=3,
    num_res_blocks=2, attention_ds=(2,), channel_mult=(1, 2), num_heads=2,
    norm_groups=4, audio_dim=12, audio_frames=8, audio_model_channels=8,
    audio_channel_mult=(1, 2), audio_init_spatial=16,
)
G = CFG.norm_groups


# ------------------------------------------------------------- torch mirrors


class ResBlock(nn.Module):
    def __init__(self, cin, cout, emb_dim):
        super().__init__()
        self.in_layers = nn.Sequential(
            nn.GroupNorm(G, cin), nn.SiLU(), nn.Conv2d(cin, cout, 3, padding=1))
        self.emb_layers = nn.Sequential(nn.SiLU(), nn.Linear(emb_dim, 2 * cout))
        self.out_layers = nn.Sequential(
            nn.GroupNorm(G, cout), nn.SiLU(), nn.Dropout(0.0),
            nn.Conv2d(cout, cout, 3, padding=1))
        if cin != cout:
            self.skip_connection = nn.Conv2d(cin, cout, 1)

    def forward(self, x, emb):
        h = self.in_layers(x)
        emb_out = self.emb_layers(emb)[:, :, None, None]
        scale, shift = emb_out.chunk(2, dim=1)
        h = self.out_layers[0](h) * (1 + scale) + shift
        h = self.out_layers[3](self.out_layers[2](self.out_layers[1](h)))
        s = self.skip_connection(x) if hasattr(self, "skip_connection") else x
        return s + h


class AttnBlock(nn.Module):
    """guided-diffusion AttentionBlock with QKVAttentionLegacy semantics."""

    def __init__(self, ch, heads):
        super().__init__()
        self.heads = heads
        self.norm = nn.GroupNorm(G, ch)
        self.qkv = nn.Conv1d(ch, 3 * ch, 1)
        self.proj_out = nn.Conv1d(ch, ch, 1)

    def forward(self, x, emb=None):
        b, c, *sp = x.shape
        x_ = x.reshape(b, c, -1)
        qkv = self.qkv(self.norm(x_))
        bs, width, length = qkv.shape
        ch = width // (3 * self.heads)
        q, k, v = qkv.reshape(bs * self.heads, ch * 3, length).split(ch, dim=1)
        scale = 1 / math.sqrt(math.sqrt(ch))
        weight = torch.einsum("bct,bcs->bts", q * scale, k * scale)
        weight = torch.softmax(weight.float(), dim=-1).type(weight.dtype)
        a = torch.einsum("bts,bcs->bct", weight, v)
        h = self.proj_out(a.reshape(bs, -1, length))
        return (x_ + h).reshape(b, c, *sp)


class Downsample(nn.Module):
    def __init__(self, ch, out_ch, stride=(2, 2)):
        super().__init__()
        self.op = nn.Conv2d(ch, out_ch, 3, stride=stride, padding=1)

    def forward(self, x, emb=None):
        return self.op(x)


class Upsample(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x, emb=None):
        return self.conv(F.interpolate(x, scale_factor=2, mode="nearest"))


class Seq(nn.Module):
    """TimestepEmbedSequential mirror: forwards emb to every child."""

    def __init__(self, *mods):
        super().__init__()
        for i, m in enumerate(mods):
            self.add_module(str(i), m)
        self._mods = mods

    def forward(self, x, emb):
        for m in self._mods:
            x = m(x, emb) if isinstance(m, (ResBlock,)) else (
                m(x) if isinstance(m, nn.Conv2d) else m(x, emb))
        return x


class TorchAudioEncoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        amc = cfg.audio_model_channels
        self.time_embed = nn.Sequential(
            nn.Linear(amc, amc), nn.SiLU(), nn.Linear(amc, amc))
        self.input_block = nn.Sequential(
            nn.Conv1d(cfg.audio_dim, cfg.audio_init_spatial, 3, padding=1),
            nn.GroupNorm(G, cfg.audio_init_spatial), nn.SiLU())
        blocks, mid_in, out_ch = gd._audio_plan(cfg)
        mods = []
        for d in blocks:
            if d["kind"] == "conv":
                mods.append(Seq(nn.Conv2d(d["in"], d["out"], 3, padding=1)))
            elif d["kind"] == "down":
                mods.append(Seq(Downsample(d["in"], d["out"], d["stride"])))
            else:
                mods.append(Seq(ResBlock(d["in"], d["out"], amc)))
        self.encoder_blocks = nn.ModuleList(mods)
        self.middle_block = Seq(ResBlock(mid_in, out_ch, amc))
        self._cfg = cfg

    def forward(self, mel):     # [B, n_mels, T]
        cfg = self._cfg
        b = mel.shape[0]
        t0 = torch.as_tensor(np.asarray(timestep_embedding(
            jnp.zeros((b,), jnp.float32), cfg.audio_model_channels)))
        emb = self.time_embed(t0)
        h = self.input_block(mel)
        h = h.reshape(b, 1, h.shape[1], h.shape[2])
        for m in self.encoder_blocks:
            h = m(h, emb)
        return self.middle_block(h, emb)


class TorchTFG(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        te = cfg.time_embed_dim
        self.time_embed = nn.Sequential(
            nn.Linear(cfg.model_channels, te), nn.SiLU(), nn.Linear(te, te))
        inputs, middle, outputs = gd._plan(cfg)

        def build(d):
            if d["kind"] == "conv":
                return Seq(nn.Conv2d(d["in"], d["out"], 3, padding=1))
            if d["kind"] == "down":
                return Seq(Downsample(d["in"], d["out"]))
            mods = [ResBlock(d["in"], d["out"], te)]
            if d.get("attn"):
                mods.append(AttnBlock(d["out"], cfg.num_heads))
            if d.get("up"):
                mods.append(Upsample(d["out"]))
            return Seq(*mods)

        self.input_blocks = nn.ModuleList([build(d) for d in inputs])
        self.middle_block = Seq(ResBlock(middle["ch"], middle["ch"], te),
                                AttnBlock(middle["ch"], cfg.num_heads),
                                ResBlock(middle["ch"], middle["ch"], te))
        self.output_blocks = nn.ModuleList([build(d) for d in outputs])
        ch0 = cfg.channel_mult[0] * cfg.model_channels
        self.out = nn.Sequential(
            nn.GroupNorm(G, ch0), nn.SiLU(),
            nn.Conv2d(ch0, cfg.out_channels, 3, padding=1))
        self.audio_encoder = TorchAudioEncoder(cfg)
        out_ch = cfg.audio_model_channels * cfg.audio_channel_mult[-1]
        self.audio_encoder_to_style = nn.Sequential(
            nn.GroupNorm(G, out_ch), nn.SiLU(), nn.AdaptiveAvgPool2d((1, 1)),
            nn.Conv2d(out_ch, te, 1), nn.Flatten())
        self._cfg = cfg

    def forward(self, x, t, cond_img, mask, ref_img, mel):
        cfg = self._cfg
        x = x * mask + (1.0 - mask) * cond_img
        h = torch.cat([x, cond_img, ref_img], dim=1)
        temb = torch.as_tensor(np.asarray(timestep_embedding(
            jnp.asarray(t, jnp.float32), cfg.model_channels)))
        emb = self.time_embed(temb)
        emb = emb + self.audio_encoder_to_style(self.audio_encoder(mel))

        hs = []
        for m in self.input_blocks:
            h = m(h, emb)
            hs.append(h)
        h = self.middle_block(h, emb)
        for m in self.output_blocks:
            h = torch.cat([h, hs.pop()], dim=1)
            h = m(h, emb)
        return self.out(h)


# ---------------------------------------------------------------------- tests


@pytest.mark.slow
def test_tfg_converter_parity():
    torch.manual_seed(3)
    tm = TorchTFG(CFG).eval()
    params = gd.from_tfg_state_dict(tm.state_dict(), CFG)

    g = np.random.default_rng(3)
    s = CFG.image_size
    x = g.standard_normal((2, s, s, 3)).astype(np.float32)
    cond = g.standard_normal((2, s, s, 3)).astype(np.float32)
    ref = g.standard_normal((2, s, s, 3)).astype(np.float32)
    mel = g.standard_normal((2, CFG.audio_frames, CFG.audio_dim)).astype(np.float32)
    mask = np.zeros((s, s, 1), np.float32)
    mask[s // 2:] = 1.0
    t = np.asarray([5.0, 900.0], np.float32)

    def nchw(a):
        return torch.as_tensor(a).permute(0, 3, 1, 2)

    with torch.no_grad():
        out_t = tm(nchw(x), t, nchw(cond),
                   torch.as_tensor(mask).permute(2, 0, 1)[None],
                   nchw(ref), torch.as_tensor(mel).transpose(1, 2))
    out_j = gd.gd_unet_apply(params, CFG, jnp.asarray(x), jnp.asarray(t),
                             cond_img=jnp.asarray(cond), mask=jnp.asarray(mask),
                             ref_img=jnp.asarray(ref), mel=jnp.asarray(mel))
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.permute(0, 2, 3, 1).numpy(), atol=2e-4)


@pytest.mark.slow
def test_tfg_ddp_prefix_and_audio_optional():
    """'module.'-prefixed (DDP-saved) checkpoints convert; the audio branch
    is skipped when the checkpoint has none (use_audio=False models)."""
    torch.manual_seed(4)
    tm = TorchTFG(CFG).eval()
    sd = {f"module.{k}": v for k, v in tm.state_dict().items()}
    params = gd.from_tfg_state_dict(sd, CFG)
    assert "audio" in params

    sd_noaudio = {k: v for k, v in tm.state_dict().items()
                  if not k.startswith(("audio_encoder", "audio_encoder_to_style"))}
    params2 = gd.from_tfg_state_dict(sd_noaudio, CFG)
    assert "audio" not in params2
    # forward works without mel (emb = timestep only)
    g = np.random.default_rng(4)
    s = CFG.image_size
    x = jnp.asarray(g.standard_normal((1, s, s, 3)), jnp.float32)
    mask = jnp.ones((s, s, 1), jnp.float32)
    out = gd.gd_unet_apply(params2, CFG, x, jnp.zeros((1,)), cond_img=x,
                           mask=mask, ref_img=x, mel=None)
    assert out.shape == (1, s, s, 3)
