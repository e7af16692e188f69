"""Fused norm→matvec decode kernels (ops/pallas_decode.py) vs the unfused op
chains, interpret mode. The device path is exercised by bench.py and the
decode integration tests on the real chip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from expressive_speech_translation_tpu.ops import pallas_decode as pd
from expressive_speech_translation_tpu.models.common import layer_norm, gelu
from expressive_speech_translation_tpu.models.qwen2 import _rms


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _mk(g, *shape, s=0.05):
    return jnp.asarray(g.standard_normal(shape) * s, jnp.float32)


@pytest.mark.parametrize("bsz", [1, 4])
def test_fused_ln_mlp_matches_chain(rng, bsz):
    D, F = 256, 1024
    x = _mk(rng, bsz, D, s=1.0)
    sc, bi = _mk(rng, D, s=1.0), _mk(rng, D)
    w1, b1 = _mk(rng, D, F), _mk(rng, F)
    w2, b2 = _mk(rng, F, D), _mk(rng, D)
    ref = x + (gelu(layer_norm({"scale": sc, "bias": bi}, x) @ w1 + b1) @ w2 + b2)
    out = pd.fused_ln_mlp(x, sc, bi, pd.pack_mlp(w1, w2), b1, b2, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_fused_ln_mlp_no_residual(rng):
    D, F = 128, 512
    x = _mk(rng, 2, D, s=1.0)
    sc, bi = _mk(rng, D, s=1.0), _mk(rng, D)
    w1, b1 = _mk(rng, D, F), _mk(rng, F)
    w2, b2 = _mk(rng, F, D), _mk(rng, D)
    ref = gelu(layer_norm({"scale": sc, "bias": bi}, x) @ w1 + b1) @ w2 + b2
    out = pd.fused_ln_mlp(x, sc, bi, pd.pack_mlp(w1, w2), b1, b2,
                          residual=False, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_fused_gated_rms_mlp_matches_qwen2(rng):
    """qwen2 decode mlp: x + (silu(x̂@Wg) * (x̂@Wu)) @ Wd, rms-normed x̂."""
    D, F = 256, 1280
    x = _mk(rng, 1, D, s=1.0)
    sc = _mk(rng, D, s=1.0)
    wg, wu, wd = _mk(rng, D, F), _mk(rng, D, F), _mk(rng, F, D)
    xh = _rms({"scale": sc}, x[:, None, :], 1e-6)[:, 0]
    ref = x + (jax.nn.silu(xh @ wg) * (xh @ wu)) @ wd
    out = pd.fused_ln_mlp(
        x, sc, jnp.zeros(D), pd.pack_mlp(wu, wd, wg), jnp.zeros(F),
        jnp.zeros(D), gated=True, norm="rms", eps=1e-6, activation="silu",
        interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_fused_ln_matvec_qkv(rng):
    D = 256
    x = _mk(rng, 2, D, s=1.0)
    sc, bi = _mk(rng, D, s=1.0), _mk(rng, D)
    w, b = _mk(rng, D, 3 * D), _mk(rng, 3 * D)
    ref = layer_norm({"scale": sc, "bias": bi}, x) @ w + b
    out = pd.fused_ln_matvec(x, sc, bi, w, b, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_fused_ln_matvec_norm_none(rng):
    D = 128
    x = _mk(rng, 1, D, s=1.0)
    w, b = _mk(rng, D, 512), _mk(rng, 512)
    ref = x @ w + b
    out = pd.fused_ln_matvec(x, jnp.zeros(D), jnp.zeros(D), w, b,
                             norm="none", interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_pick_chunk():
    assert pd._pick_chunk(4096) == 1024
    assert pd._pick_chunk(2560) == 512
    assert pd._pick_chunk(4096, cap=512) == 512
    with pytest.raises(ValueError):
        pd._pick_chunk(1000)
