"""Fused vocoder resblock stage (ops/pallas_vocoder.py) — blocked
channel-time Pallas kernel vs the XLA stage loop, interpret mode (the device
path is exercised by bench.py on the real chip: 5.1 ms vs 13.7 ms XLA for
the C=64/T=240k stage)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from expressive_speech_translation_tpu.models import cosyvoice as cv
from expressive_speech_translation_tpu.ops import pallas_vocoder as pv


def xla_stage(x, stage, cfg):
    lrelu = lambda v: jax.nn.leaky_relu(v, 0.1)

    def conv1d(p, xx, *, dilation=1):
        width = p["kernel"].shape[0]
        pad = dilation * (width - 1) // 2
        return jax.lax.conv_general_dilated(
            xx, p["kernel"], (1,), [(pad, pad)], rhs_dilation=(dilation,),
            dimension_numbers=("NHC", "HIO", "NHC")) + p["bias"]

    acc = None
    for block, dils in zip(stage, cfg.resblock_dilations):
        h = x
        for unit, d in zip(block, dils):
            y = conv1d(unit["c1"], lrelu(h), dilation=d)
            y = conv1d(unit["c2"], lrelu(y))
            h = h + y
        acc = h if acc is None else acc + h
    return acc / len(stage)


@pytest.mark.parametrize("t,tile", [(1000, 256), (130, 128), (700, 4096)])
def test_fused_stage_matches_xla(t, tile):
    cfg = cv.VocoderConfig(base_channels=512)
    params = cv.init_vocoder(jax.random.PRNGKey(0), cfg)
    stage = params["res"][2]                      # C = 64 tail stage
    g = np.random.default_rng(0)
    x = jnp.asarray(g.standard_normal((2, t, 64)), jnp.float32) * 0.3

    ref = xla_stage(x, stage, cfg)
    out = pv.fused_resblock_stage(
        x, pv.stage_weights_flat(stage, cfg.resblock_kernels,
                                 cfg.resblock_dilations),
        kernels=cfg.resblock_kernels, dilations=cfg.resblock_dilations,
        tile=tile, interpret=True)
    assert out.shape == ref.shape
    rel = float(jnp.max(jnp.abs(out - ref))) / float(jnp.max(jnp.abs(ref)))
    assert rel < 1e-5, rel


def test_stage_halo():
    assert pv.stage_halo((3, 7, 11), ((1, 3, 5),) * 3) == 60
    assert pv.stage_halo((3,), ((1,),)) == 2


def test_vocode_uses_fused_only_on_tpu():
    """On the CPU test backend vocode must keep the XLA loop (the Mosaic
    kernel neither compiles nor should interpret at full scale)."""
    cfg = cv.VocoderConfig(base_channels=64)       # tiny: C stages 8/4/...
    params = cv.init_vocoder(jax.random.PRNGKey(1), cfg)
    g = np.random.default_rng(1)
    mel = jnp.asarray(g.standard_normal((1, 12, cfg.n_mels)), jnp.float32)
    wave = cv.vocode(params, cfg, mel)
    assert wave.shape == (1, 12 * cfg.hop)
    assert np.isfinite(np.asarray(wave)).all()
