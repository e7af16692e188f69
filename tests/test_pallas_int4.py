"""Packed-int4 matmul kernel vs its dequantized reference (interpret mode).

The kernel is a measured NEGATIVE for serving (loses to the int8 XLA path —
see ops/pallas_int4.py's postmortem); these tests keep the packing format and
the unpack idiom correct for the future mega-kernel attempt it points at.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from expressive_speech_translation_tpu.ops.pallas_int4 import (
    matmul_int4,
    pack_int4,
    unpack_int4,
)

pytestmark = pytest.mark.quick


def test_pack_unpack_roundtrip():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 256), jnp.float32)
    packed, scale = pack_int4(w)
    assert packed.shape == (32, 256) and packed.dtype == jnp.int8
    deq = unpack_int4(packed, scale, dtype=jnp.float32)
    # 4-bit symmetric quantization: error bounded by half a step per channel
    step = np.asarray(scale)[0]
    err = np.max(np.abs(np.asarray(deq) - np.asarray(w)), axis=0)
    assert np.all(err <= step * 0.5 + 1e-6)


def test_pack_rejects_odd_k():
    with pytest.raises(ValueError):
        pack_int4(jnp.zeros((7, 128)))


@pytest.mark.parametrize("b,k,n,block_n", [(8, 256, 512, 256), (8, 128, 384, 128)])
def test_matmul_matches_dequant_reference(b, k, n, block_n):
    kw, kx = jax.random.split(jax.random.PRNGKey(1))
    w = jax.random.normal(kw, (k, n), jnp.float32)
    x = jax.random.normal(kx, (b, k), jnp.float32)
    packed, scale = pack_int4(w)
    got = matmul_int4(x, packed, scale, block_n=block_n, interpret=True)
    ref = x @ unpack_int4(packed, scale, dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-2, rtol=2e-2
    )


def test_matmul_shape_mismatch():
    packed, scale = pack_int4(jnp.zeros((64, 128)))
    with pytest.raises(ValueError):
        matmul_int4(jnp.zeros((1, 100)), packed, scale, interpret=True)
