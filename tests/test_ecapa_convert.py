"""ECAPA converter parity: JAX ECAPA-TDNN vs a torch mirror of speechbrain's
``spkrec-ecapa-voxceleb`` architecture on SHARED tiny random weights.

The mirror re-states speechbrain.lobes.models.ECAPA_TDNN (TDNNBlock /
Res2NetBlock / SEBlock / SERes2NetBlock / AttentiveStatisticsPooling with
global context) in plain torch with speechbrain's EXACT checkpoint naming
(``…conv.conv``, ``…norm.norm``, ``blocks.{b}.res2net_block.blocks.{i}``,
``asp.tdnn``, ``asp_bn.norm``, ``fc.conv``) so
``from_speechbrain_state_dict``'s key resolution is exercised end to end.
Reference behavior: services/voice_similarity_analyser.py:26-33 (192-d
embeddings, cosine score)."""

import numpy as np
import pytest

import jax.numpy as jnp

from expressive_speech_translation_tpu.models import ecapa as ec

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

CFG = ec.EcapaConfig(n_mels=10, channels=16, mfa_out=48, bottleneck=8,
                     scale=4, embed_dim=12, attn_channels=8)


# ------------------------------------------------------------- torch mirrors
# Module attribute names reproduce speechbrain's state-dict keys exactly.


class _Conv(nn.Module):
    """speechbrain.nnet.CNN.Conv1d wraps torch Conv1d as ``.conv``."""

    def __init__(self, in_ch, out_ch, k, dilation=1, bias=True):
        super().__init__()
        pad = dilation * (k - 1) // 2
        self.conv = nn.Conv1d(in_ch, out_ch, k, dilation=dilation,
                              padding=pad, bias=bias)

    def forward(self, x):
        return self.conv(x)


class _BN(nn.Module):
    """speechbrain.nnet.normalization.BatchNorm1d wraps as ``.norm``."""

    def __init__(self, ch):
        super().__init__()
        self.norm = nn.BatchNorm1d(ch)

    def forward(self, x):
        return self.norm(x)


class TDNNBlock(nn.Module):
    def __init__(self, in_ch, out_ch, k, dilation=1):
        super().__init__()
        self.conv = _Conv(in_ch, out_ch, k, dilation)
        self.norm = _BN(out_ch)

    def forward(self, x):
        return self.norm(F.relu(self.conv(x)))


class Res2NetBlock(nn.Module):
    def __init__(self, ch, scale, k, dilation):
        super().__init__()
        w = ch // scale
        self.scale = scale
        self.blocks = nn.ModuleList(
            [TDNNBlock(w, w, k, dilation) for _ in range(scale - 1)])

    def forward(self, x):
        y = []
        for i, x_i in enumerate(torch.chunk(x, self.scale, dim=1)):
            if i == 0:
                y_i = x_i
            elif i == 1:
                y_i = self.blocks[i - 1](x_i)
            else:
                y_i = self.blocks[i - 1](x_i + y_i)
            y.append(y_i)
        return torch.cat(y, dim=1)


class SEBlock(nn.Module):
    def __init__(self, ch, bottleneck):
        super().__init__()
        self.conv1 = _Conv(ch, bottleneck, 1)
        self.conv2 = _Conv(bottleneck, ch, 1)

    def forward(self, x):
        s = x.mean(dim=2, keepdim=True)
        s = torch.sigmoid(self.conv2(F.relu(self.conv1(s))))
        return x * s


class SERes2NetBlock(nn.Module):
    def __init__(self, ch, scale, bottleneck, k, dilation):
        super().__init__()
        self.tdnn1 = TDNNBlock(ch, ch, 1)
        self.res2net_block = Res2NetBlock(ch, scale, k, dilation)
        self.tdnn2 = TDNNBlock(ch, ch, 1)
        self.se_block = SEBlock(ch, bottleneck)

    def forward(self, x):
        residual = x
        x = self.tdnn1(x)
        x = self.res2net_block(x)
        x = self.tdnn2(x)
        x = self.se_block(x)
        return x + residual


class ASP(nn.Module):
    """AttentiveStatisticsPooling with global_context=True."""

    def __init__(self, ch, attn_ch):
        super().__init__()
        self.tdnn = TDNNBlock(3 * ch, attn_ch, 1)
        self.conv = _Conv(attn_ch, ch, 1)

    @staticmethod
    def _stats(x, w, eps=1e-12):
        mean = (w * x).sum(dim=2)
        std = torch.sqrt(((w * (x - mean.unsqueeze(2)) ** 2).sum(dim=2)).clamp(eps))
        return mean, std

    def forward(self, x):
        L = x.shape[2]
        w = torch.full((x.shape[0], 1, L), 1.0 / L)
        mean, std = self._stats(x, w)
        attn = torch.cat(
            [x, mean.unsqueeze(2).repeat(1, 1, L), std.unsqueeze(2).repeat(1, 1, L)],
            dim=1)
        attn = self.conv(torch.tanh(self.tdnn(attn)))
        attn = F.softmax(attn, dim=2)
        mean, std = self._stats(x, attn)
        return torch.cat([mean, std], dim=1).unsqueeze(2)


class TorchEcapa(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        c = cfg.channels
        self.blocks = nn.ModuleList(
            [TDNNBlock(cfg.n_mels, c, 5)]
            + [SERes2NetBlock(c, cfg.scale, cfg.bottleneck, 3, d)
               for d in (2, 3, 4)])
        self.mfa = TDNNBlock(3 * c, cfg.mfa_out, 1)
        self.asp = ASP(cfg.mfa_out, cfg.attn_channels)
        self.asp_bn = _BN(2 * cfg.mfa_out)
        self.fc = _Conv(2 * cfg.mfa_out, cfg.embed_dim, 1)

    def forward(self, x):               # [B, T, n_mels] → [B, embed_dim]
        x = x.transpose(1, 2)
        xl = []
        for layer in self.blocks:
            x = layer(x)
            xl.append(x)
        x = self.mfa(torch.cat(xl[1:], dim=1))
        x = self.asp_bn(self.asp(x))
        return self.fc(x).squeeze(2)


# ---------------------------------------------------------------------- tests


@pytest.mark.slow
def test_ecapa_converter_parity():
    torch.manual_seed(11)
    tm = TorchEcapa(CFG).eval()
    # randomise BN running stats so the converter's mean/var mapping is
    # actually exercised (fresh BNs have mean 0 / var 1 — a silent no-op)
    with torch.no_grad():
        for mod in tm.modules():
            if isinstance(mod, nn.BatchNorm1d):
                mod.running_mean.normal_(0, 0.2)
                mod.running_var.uniform_(0.5, 1.5)

    params = ec.from_speechbrain_state_dict(tm.state_dict(), CFG)

    g = np.random.default_rng(3)
    feats = g.standard_normal((2, 23, CFG.n_mels)).astype(np.float32)
    with torch.no_grad():
        emb_t = tm(torch.as_tensor(feats)).numpy()
    mask = jnp.ones(feats.shape[:2], bool)
    emb_j = np.asarray(
        ec.embed(params, CFG, jnp.asarray(feats), mask, normalize=False))
    np.testing.assert_allclose(emb_j, emb_t, atol=2e-4)

    # embedding_model.-prefixed full-model save resolves identically
    sd2 = {f"embedding_model.{k}": v for k, v in tm.state_dict().items()}
    emb_j2 = np.asarray(
        ec.embed(ec.from_speechbrain_state_dict(sd2, CFG), CFG,
                 jnp.asarray(feats), mask, normalize=False))
    np.testing.assert_allclose(emb_j2, emb_j, atol=0)

    # cosine scoring is invariant to the embed-time L2 normalisation
    emb_n = ec.embed(params, CFG, jnp.asarray(feats), mask)
    s_raw = ec.cosine_similarity(jnp.asarray(emb_j[0]), jnp.asarray(emb_j[1]))
    s_norm = ec.cosine_similarity(emb_n[0], emb_n[1])
    np.testing.assert_allclose(float(s_raw), float(s_norm), atol=1e-5)


@pytest.mark.slow


def test_masked_embed_matches_unpadded():
    """The mask-aware JAX forward must make a padded batch entry equal the
    same utterance embedded alone (speechbrain gets this only approximately;
    the re-zeroing design makes it exact for k1-dominated stages)."""
    import jax

    params = ec.init_ecapa(jax.random.PRNGKey(0), CFG)
    g = np.random.default_rng(5)
    t_short, t_long = 15, 24
    a = g.standard_normal((t_short, CFG.n_mels)).astype(np.float32)
    b = g.standard_normal((t_long, CFG.n_mels)).astype(np.float32)

    feats = np.zeros((2, t_long, CFG.n_mels), np.float32)
    feats[0, :t_short] = a
    feats[1] = b
    mask = np.zeros((2, t_long), bool)
    mask[0, :t_short] = True
    mask[1] = True

    batched = ec.embed(params, CFG, jnp.asarray(feats), jnp.asarray(mask))
    solo = ec.embed(params, CFG, jnp.asarray(a[None]),
                    jnp.ones((1, t_short), bool))
    # conv kernel support (k5/k3 dilated) still sees a handful of padded
    # frames near the boundary; re-zeroing bounds the effect — cosine between
    # padded-batch and solo embeddings must be ≈ 1
    cos = float(ec.cosine_similarity(batched[0], solo[0]))
    assert cos > 0.999
    np.testing.assert_allclose(np.asarray(batched[1]),
                               np.asarray(ec.embed(params, CFG, jnp.asarray(b[None]),
                                                   jnp.ones((1, t_long), bool))[0]),
                               atol=1e-5)
